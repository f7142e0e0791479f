"""As-of join (point-in-time lookup).

Spark has no built-in ASOF JOIN (DuckDB does — it serves as the
oracle). Two formulations:

- join + per-left-row window top-1 (the round-1 inline form of q36):
  correct, but materializes |left x matching-right-per-key| rows
  before ranking — a user with 10k historical orders fans every event
  out 10,000x before the window discards all but one.
- :func:`asof_join` (this module): the union-sort form — tag both
  streams, sort within each key by event time (right rows first on
  ties), and carry the latest right payload forward with
  ``last(ignorenulls)``. ONE shuffle on the key, zero fan-out, state
  is a single struct per row — the formulation that survives 100 TB
  fact-to-fact lookups.

Backward as-of only (latest right with right_time <= left_time) —
the reference semantics and the common training-feature case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    *,
    how: str = "inner",
) -> DataFrame:
    """For every ``left`` row, attach the single ``right`` row of the
    same ``on`` key with the greatest ``right_time`` <= ``left_time``
    (ties on ``right_time`` break toward the lexicographically greatest
    right-value tuple — deterministic). ``how='left'`` keeps unmatched
    left rows with nulls; ``how='inner'`` drops them.

    Column contract: ``left`` and ``right`` share ONLY ``on``; all
    right columns (except ``on``/``right_time``'s original name) come
    along in the output.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    overlap = (set(left.columns) & set(right.columns)) - {on}
    if overlap:
        raise ValueError(
            f"left/right column overlap {sorted(overlap)}; rename first"
        )

    lcols = [c for c in left.columns if c != on]
    rcols = [c for c in right.columns if c != on]

    l_side = left.select(
        F.col(on),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__r"),
        *[F.col(c) for c in lcols],
        F.lit(None)
        .cast(
            "struct<"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in rcols
            )
            + ">"
        )
        .alias("__rv"),
    )
    r_side = right.filter(F.col(right_time).isNotNull()).select(
        F.col(on),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.struct(*[F.col(c) for c in rcols]).alias("__rv"),
    )
    u = l_side.unionByName(r_side)

    # right rows sort BEFORE left rows at equal time (backward as-of is
    # inclusive); among equal-time right rows the struct sorts the
    # tie-break — last() takes the greatest
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__r").desc(), F.col("__rv").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn(
        "__match", F.last("__rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__r") == 0)
    if how == "inner":
        out = out.filter(F.col("__match").isNotNull())
    return out.select(
        on,
        *lcols,
        *[F.col("__match")[c].alias(c) for c in rcols],
    )
