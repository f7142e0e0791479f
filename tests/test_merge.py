"""SCD2 merge contracts (operators/merge)."""

from lsdm_motogp_data_integration_spark.operators.merge import (
    scd2_apply,
    scd2_init,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id bigint, body string")


def _hist(df):
    return sorted(
        (r["id"], r["ver_from"], r["ver_to"])
        for r in df.select("id", "ver_from", "ver_to").collect()
    )


def test_scd2_chain_open_close_reopen(spark):
    """v1={1,2,3}; v2 changes 2, deletes 3, adds 4; v3 re-adds 3.
    History: 1 open since 1; 2 closed [1,2) + open since 2; 3 closed
    [1,2) + open since 3; 4 open since 2."""
    h = scd2_init(
        _snap(spark, [(1, "a"), (2, "b"), (3, "c")]), "id", "body"
    )
    h = scd2_apply(
        h,
        _snap(spark, [(1, "a"), (2, "B"), (4, "d")]),
        "id",
        "body",
        version=2,
    )
    h = scd2_apply(
        h,
        _snap(spark, [(1, "a"), (2, "B"), (4, "d"), (3, "c")]),
        "id",
        "body",
        version=3,
    )
    assert _hist(h) == [
        (1, 1, None),
        (2, 1, 2),
        (2, 2, None),
        (3, 1, 2),
        (3, 3, None),
        (4, 2, None),
    ]


def test_scd2_null_body_transitions(spark):
    """NULL body is a real state: NULL→NULL is unchanged, NULL→'x'
    closes and reopens (the corpus_diff null-safety contract)."""
    h = scd2_init(_snap(spark, [(1, None), (2, None)]), "id", "body")
    h = scd2_apply(
        h,
        _snap(spark, [(1, None), (2, "x")]),
        "id",
        "body",
        version=2,
    )
    assert _hist(h) == [(1, 1, None), (2, 1, 2), (2, 2, None)]


def test_scd2_current_rows_match_last_snapshot(spark):
    """The open rows always equal the latest snapshot's key set."""
    import pyspark.sql.functions as F

    v2 = _snap(spark, [(10, "p"), (11, "q")])
    h = scd2_apply(
        scd2_init(_snap(spark, [(10, "p"), (12, "r")]), "id", "body"),
        v2,
        "id",
        "body",
        version=2,
    )
    open_ids = sorted(
        r["id"] for r in h.filter(F.col("ver_to").isNull()).collect()
    )
    assert open_ids == [10, 11]


def test_partial_aggs_merge_equals_direct(spark):
    """Merging per-batch states equals aggregating the whole table —
    the lossless-combine contract, including a key missing from one
    batch."""
    import pyspark.sql.functions as F

    from lsdm_motogp_data_integration_spark.operators.merge import (
        merge_partial_aggs,
        partial_aggs,
    )

    rows = [(i, "s%d" % (i % 2 if i < 8 else 2), i * 10) for i in range(10)]
    d = spark.createDataFrame(rows, "id bigint, src string, v bigint")
    states = [
        partial_aggs(d.filter(F.col("id") % 3 == i), ["src"], "v")
        for i in range(3)
    ]
    merged = merge_partial_aggs(states, ["src"])
    direct = partial_aggs(d, ["src"], "v")
    as_map = lambda df: {
        r["src"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in df.collect()
    }
    assert as_map(merged) == as_map(direct)


def test_finalize_aggs_variance_from_merged_state_equals_direct(spark):
    """Variance derived from the MERGED sum/sumsq moments must equal
    the single-pass computation on the full data — the property that
    makes stddev incrementally maintainable; n=1 groups report NULL."""
    import math

    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.operators.merge import (
        finalize_aggs,
        merge_partial_aggs,
        partial_aggs,
    )

    rows = [(i, "a" if i % 4 else "b", float((i * 7) % 23)) for i in range(200)]
    rows.append((999, "solo", 5.0))
    d = spark.createDataFrame(rows, "id bigint, src string, v double")
    states = [
        partial_aggs(d.filter(F.col("id") % 3 == i), ["src"], "v")
        for i in range(3)
    ]
    fin = {
        r["src"]: (r["mean_v"], r["var_v"], r["std_v"])
        for r in finalize_aggs(
            merge_partial_aggs(states, ["src"])
        ).collect()
    }
    import statistics

    for src in ("a", "b"):
        vals = [v for _, s, v in rows if s == src]
        assert abs(fin[src][0] - statistics.mean(vals)) < 1e-9
        assert abs(fin[src][1] - statistics.variance(vals)) < 1e-6
        assert abs(fin[src][2] - math.sqrt(statistics.variance(vals))) < 1e-6
    assert fin["solo"][1] is None and fin["solo"][2] is None
