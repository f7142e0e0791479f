"""Range join: boundary semantics and bucket spanning."""

from __future__ import annotations

import datetime

import pytest

from lsdm_motogp_data_integration_spark.operators.ranges import range_join


def _ts(hour: int, minute: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, hour, minute)


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (1, "u", _ts(10, 0)),   # exactly at a start boundary
        (2, "u", _ts(10, 30)),  # inside
        (3, "u", _ts(12, 0)),   # exactly at an end boundary -> excluded
        (4, "u", _ts(23, 59)),  # matches nothing
        (5, "v", _ts(10, 30)),  # right time, wrong key
    ]
    return spark.createDataFrame(rows, ["pid", "key", "ts"])


@pytest.fixture(scope="module")
def intervals(spark):
    # one 2-hour interval spanning multiple 1h buckets
    return spark.createDataFrame(
        [("u", 100, _ts(10), _ts(12))], ["key", "iid", "start", "stop"]
    )


def test_boundaries_inclusive_start_exclusive_end(points, intervals):
    got = sorted(
        r["pid"]
        for r in range_join(
            points, intervals, "ts", "start", "stop",
            on=["key"], bucket_seconds=3600,
        ).collect()
    )
    assert got == [1, 2]  # start inclusive, end exclusive, key-scoped


def test_tiny_buckets_same_result(points, intervals):
    # 5-minute buckets: interval explodes across 25 buckets — result
    # must be identical (bucketing is pure pruning)
    got = sorted(
        r["pid"]
        for r in range_join(
            points, intervals, "ts", "start", "stop",
            on=["key"], bucket_seconds=300,
        ).collect()
    )
    assert got == [1, 2]


def test_invalid_how(points, intervals):
    with pytest.raises(ValueError):
        range_join(points, intervals, "ts", "start", "stop", how="left")


def test_jdbc_sink_is_gated(spark):
    from lsdm_motogp_data_integration_spark.sources import write_jdbc

    df = spark.range(3)
    with pytest.raises(NotImplementedError, match="driver jar"):
        write_jdbc(df, "jdbc:postgresql://localhost/x", "t")


def test_asof_union_sort_equals_join_window(spark, sf_dir):
    """The union-sort as-of join must equal the join + per-left-row
    window-top-1 formulation row for row (same tie-breaks)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.operators.asof import asof_join
    from lsdm_motogp_data_integration_spark.sources import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    joined = ev.join(o, ev.user_id == o.o_custkey, "inner").filter(
        F.col("o_orderdate") <= F.col("ts")
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    reference = {
        (r["event_id"], r["o_orderkey"], r["o_orderdate"])
        for r in joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("event_id", "o_orderkey", "o_orderdate")
        .collect()
    }
    got = {
        (r["event_id"], r["o_orderkey"], r["o_orderdate"])
        for r in asof_join(
            ev,
            o.select(
                F.col("o_custkey").alias("user_id"),
                "o_orderkey",
                "o_orderdate",
            ),
            "user_id",
            "ts",
            "o_orderdate",
        )
        .select("event_id", "o_orderkey", "o_orderdate")
        .collect()
    }
    assert got == reference


def test_asof_left_keeps_unmatched(spark):
    import datetime

    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, datetime.datetime(2024, 1, 2)),
         (2, 20, datetime.datetime(2024, 1, 1))],
        ["k", "lid", "lt"],
    )
    right = spark.createDataFrame(
        [(1, 100, datetime.datetime(2024, 1, 1))], ["k", "rid", "rt"]
    )
    out = {
        r["lid"]: r["rid"]
        for r in asof_join(
            left, right, "k", "lt", "rt", how="left"
        ).collect()
    }
    assert out == {10: 100, 20: None}
    inner = asof_join(left, right, "k", "lt", "rt").collect()
    assert len(inner) == 1 and inner[0]["rid"] == 100
