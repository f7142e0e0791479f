"""Single-pass column profiler (operators/profile.py)."""

from __future__ import annotations

import pytest

from lsdm_motogp_data_integration_spark.operators.profile import (
    profile_columns,
)


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.5),
            (2, "beta", None),
            (3, None, 2.0),
            (3, "alpha", 4.25),
        ],
        ["id", "name", "score"],
    )


def test_profile_metrics_hand_checked(spark, small):
    p = {r["column"]: r for r in profile_columns(small).collect()}
    assert set(p) == {"id", "name", "score"}
    # id: no nulls, 3 distinct, numeric range
    assert p["id"]["n_rows"] == 4
    assert p["id"]["n_nulls"] == 0
    assert p["id"]["n_distinct"] == 3
    assert p["id"]["min_num"] == 1.0 and p["id"]["max_num"] == 3.0
    assert p["id"]["mean_num"] == pytest.approx(2.25)
    assert p["id"]["min_str"] is None
    # name: 1 null, distinct counts non-null values only
    assert p["name"]["n_nulls"] == 1
    assert p["name"]["n_distinct"] == 2
    assert p["name"]["min_str"] == "alpha" and p["name"]["max_str"] == "beta"
    assert p["name"]["min_num"] is None
    # score: null-aware mean over the 3 non-null values
    assert p["score"]["n_nulls"] == 1
    assert p["score"]["mean_num"] == pytest.approx((10.5 + 2.0 + 4.25) / 3)


def test_profile_single_pass_plan(spark, small):
    """The whole profile must come from ONE aggregation over the input:
    exactly one scan of the source in the plan (the Expand for exact
    multi-column distinct is fine; re-scanning per column is not)."""
    plan = (
        profile_columns(small)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LogicalRDD") == 1


def test_profile_approx_mode_and_subset(spark, small):
    p = profile_columns(
        small, cols=["id"], exact_distinct=False
    ).collect()
    assert len(p) == 1
    # HLL on 3 tiny values is exact in practice
    assert p[0]["n_distinct"] == 3
    with pytest.raises(ValueError):
        profile_columns(small, cols=["nope"])


def test_profile_bigint_extremes_no_overflow(spark):
    """ANSI mode turns a decimal overflow into a scan ERROR; the
    profiler must survive bigints near the 64-bit limit."""
    df = spark.createDataFrame(
        [(9_223_372_036_854_775_000,), (-9_223_372_036_854_775_000,)],
        "v bigint",
    )
    p = profile_columns(df).collect()[0]
    assert p["max_num"] == pytest.approx(9.223372036854775e18)
    assert p["min_num"] == pytest.approx(-9.223372036854775e18)


def test_profile_all_null_numeric(spark):
    df = spark.createDataFrame(
        [(None,), (None,)], "v double"
    )
    p = profile_columns(df).collect()[0]
    assert p["n_nulls"] == 2
    assert p["n_distinct"] == 0
    assert p["mean_num"] is None and p["min_num"] is None


def test_profile_matches_duckdb_on_documents(spark, sf_dir):
    import duckdb

    from lsdm_motogp_data_integration_spark.sources import read_table

    d = read_table(spark, sf_dir, "documents")
    got = {
        r["column"]: r
        for r in profile_columns(d, cols=["doc_id", "lang"]).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    n, nn, nd, mn, mx = con.execute(
        "SELECT COUNT(*), SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END),"
        " COUNT(DISTINCT doc_id),"
        " CAST(MIN(CAST(doc_id AS DECIMAL(38,6))) AS DOUBLE),"
        " CAST(MAX(CAST(doc_id AS DECIMAL(38,6))) AS DOUBLE)"
        " FROM documents"
    ).fetchone()
    assert got["doc_id"]["n_rows"] == n
    assert got["doc_id"]["n_nulls"] == (nn or 0)
    assert got["doc_id"]["n_distinct"] == nd
    assert got["doc_id"]["min_num"] == mn
    assert got["doc_id"]["max_num"] == mx
    lmin, lmax = con.execute(
        "SELECT MIN(lang), MAX(lang) FROM documents"
    ).fetchone()
    assert got["lang"]["min_str"] == lmin
    assert got["lang"]["max_str"] == lmax


def test_exact_quantiles_matches_single_node_sort(spark):
    """The two-phase distributed quantile equals the value at rank
    ceil(q*n) of a driver-side sort, including duplicate-heavy data
    (the skewed value collapses to one weighted row)."""
    import math

    from lsdm_motogp_data_integration_spark.operators.profile import (
        exact_quantiles,
    )

    vals = [float(i % 97) for i in range(5000)] + [42.0] * 3000
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(16)
    qs = [0.01, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["q"]: (r["qvalue"], r["n"])
        for r in exact_quantiles(df, "x", qs).collect()
    }
    s = sorted(vals)
    n = len(s)
    for q in qs:
        expect = s[math.ceil(q * n) - 1]
        assert got[q] == (expect, n), (q, got[q], expect)


def test_exact_quantiles_ignores_nulls_and_handles_empty(spark):
    from lsdm_motogp_data_integration_spark.operators.profile import (
        exact_quantiles,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,)], "x double"
    )
    got = {r["q"]: r["qvalue"] for r in exact_quantiles(df, "x", [0.5, 1.0]).collect()}
    assert got == {0.5: 1.0, 1.0: 3.0}
    empty = spark.createDataFrame([(None,)], "x double")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0


def test_winsorize_clips_exact_tails(spark):
    """Bounds are the exact rank-ceil(q*n) values; rows outside move
    to them and are flagged; NULLs untouched; in-range rows intact."""
    from lsdm_motogp_data_integration_spark.operators.profile import (
        exact_quantiles,
        winsorize,
    )

    vals = [float(i) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)], "x double"
    )
    out = winsorize(df, "x", lo_q=0.05, hi_q=0.95)
    rows = out.collect()
    # rank ceil(.05*100)=5 -> lo=5.0; ceil(.95*100)=95 -> hi=95.0
    q = {
        r["q"]: r["qvalue"]
        for r in exact_quantiles(df, "x", [0.05, 0.95]).collect()
    }
    assert q == {0.05: 5.0, 0.95: 95.0}
    for r in rows:
        if r["x"] is None:
            assert r["x_winsor"] is None and r["x_clipped"] is False
        elif r["x"] < 5.0:
            assert r["x_winsor"] == 5.0 and r["x_clipped"]
        elif r["x"] > 95.0:
            assert r["x_winsor"] == 95.0 and r["x_clipped"]
        else:
            assert r["x_winsor"] == r["x"] and not r["x_clipped"]
