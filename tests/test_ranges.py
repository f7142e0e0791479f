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
