"""Range (interval) join — point-in-interval matching.

Spark has no native range join; the naive form is an inequality theta
join (broadcast-nested-loop: |left| × |right| comparisons). This
operator bucketizes time: each point lands in exactly one fixed-width
bucket, each interval explodes to every bucket it spans, and the match
becomes an EQUI-join on (keys…, bucket) plus a residual filter — the
standard bucketized-range-join rewrite. Cost: |left| + Σ interval
spans/width joined hash-wise instead of a quadratic loop; pick
``bucket_seconds`` near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (and equal ``on`` keys). A point belongs to
    exactly one bucket, so no pair can match twice — no dedup needed."""
    if how != "inner":
        raise ValueError("range_join currently supports inner only")
    on = on or []
    w = F.lit(bucket_seconds)
    p = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / w)
    )
    i = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w),
                F.floor(F.unix_timestamp(F.col(end_col)) / w),
            )
        ),
    )
    return (
        p.join(i, on=[*on, "__bucket"], how="inner")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bucket")
    )
