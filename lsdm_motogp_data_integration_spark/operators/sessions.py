"""Sessionization and event-time windowing (batch forms).

The reference has no streaming (SURVEY.md §2.11); these are the batch
equivalents of the Structured Streaming operators in ``streaming/``,
kept semantically aligned so the same pipeline runs both ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gaps-and-islands session assignment: a new session starts when
    the gap to the previous event of the same user exceeds
    ``gap_minutes``. Adds ``session_seq`` (per-user 1..N) — one shuffle
    on the user key; the windows reuse the same partitioning."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # microsecond-exact gap: unix_timestamp() truncates to whole
    # seconds, so events 1800.9 s apart could merge at a 1800 s gap
    # depending on sub-second alignment — and batch would diverge from
    # the micros-precise streaming session_window
    gap_us = gap_minutes * 60 * 1_000_000
    with_prev = events.withColumn(
        "__prev_ts", F.lag(ts_col).over(w)
    ).withColumn(
        "__new_session",
        (
            F.col("__prev_ts").isNull()
            | (
                F.unix_micros(ts_col) - F.unix_micros("__prev_ts")
                > gap_us
            )
        ).cast("int"),
    )
    return (
        with_prev.withColumn(
            "session_seq",
            F.sum("__new_session")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .drop("__prev_ts", "__new_session")
    )


def tumbling_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_size: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window aggregate (batch form of the
    streaming windowed count/sum). Emits flat window_start/window_end
    columns for oracle comparison."""
    win = F.window(F.col(ts_col), window_size)
    return (
        events.groupBy(win.alias("__w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # (38,6): ANSI errors the whole aggregate when one |value|
            # >= 1e12 overflows 12 integer digits (non-ANSI silently
            # nulls it out of the sum) — same fix as profile_columns
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def hopping_window_agg(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_size: str = "2 hours",
    hop: str = "1 hour",
) -> DataFrame:
    """Hopping (sliding) event-time window aggregate: overlapping
    windows of ``window_size`` advancing every ``hop`` — each event
    lands in ``window/hop`` windows. Spark's ``F.window`` with a
    slideDuration handles the replication natively (JVM-side explode
    of window assignments, no Python); the aggregate shape is the
    same single hash agg as the tumbling form, with the shuffle
    inflated only by the window/hop overlap factor."""
    win = F.window(F.col(ts_col), window_size, hop)
    return (
        events.groupBy(win.alias("__w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("__w.start").alias("window_start"),
            F.col("__w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def gapfill_hourly(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Time-series gap fill (TimescaleDB's ``time_bucket_gapfill``
    shape): hourly buckets per key INCLUDING the empty hours between
    each key's first and last event, with ``n_events = 0`` for gaps
    and ``sum_value_ff`` = last-observation-carried-forward of the
    hourly sum (NULL until the key's first observed hour — which by
    construction is the range start, so only true interior gaps
    inherit).

    Scale shape: events collapse to per-(key, hour) rows FIRST (one
    hash aggregate — the only pass over raw data); the dense bucket
    axis is generated from a per-key (min, max) range relation (one
    row per key) via ``sequence`` + ``explode``, so the fan-out is
    O(keys × hours-of-history), never O(events); the fill join and
    the LOCF window both run on that bounded bucket space, each
    partitioned by key. A key with years of history and a hot key
    with billions of events cost the same dense axis."""
    b = (
        events.groupBy(
            F.col(key_col),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # same (38,6) overflow stance as tumbling_window_agg
            F.sum(F.col(value_col).cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
    rng = b.groupBy(key_col).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    axis = rng.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr("interval 1 hour"))
        ).alias("bucket"),
    )
    filled = axis.join(b, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        key_col,
        F.col("bucket").alias("window_start"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("sum_value_ff"),
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: how many users performed
    ``steps[0]``, then ``steps[1]`` STRICTLY AFTER their first
    ``steps[0]``, then ``steps[2]`` strictly after that, … The classic
    product-analytics sequence query (Amplitude/Mixpanel semantics:
    first-touch anchoring — each stage anchors at the EARLIEST
    qualifying timestamp, which maximizes later-stage conversion and
    makes the result order-insensitive and deterministic).

    Returns one row per step: ``(step_seq bigint, step string,
    n_users bigint)``.

    Scale shape: stage k is one equi-join of the (already filtered)
    step-k events against the O(users) survivor relation from stage
    k-1 plus a user-keyed min — every shuffle is on the user key, so
    AQE reuses the partitioning across stages; no window over raw
    events, no per-user sorting. len(steps) is small and fixed, so
    the staged loop is a fixed-depth plan, not an iteration."""
    if not steps:
        raise ValueError("funnel_counts needs at least one step")
    per_step = []
    cur = None
    for step in steps:
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if cur is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(cur, "__u")
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        per_step.append(cur)
    out = None
    for i, (step, survivors) in enumerate(zip(steps, per_step)):
        row = survivors.agg(
            F.lit(i + 1).cast("bigint").alias("step_seq"),
            F.lit(step).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are assigned to the cohort of
    the ISO week (Monday-truncated) of their FIRST event; for every
    (cohort_week, week_offset) the count of distinct cohort members
    active in that week. Offset 0 is the cohort week itself, so every
    cohort's offset-0 row equals its size.

    Returns ``(cohort_week timestamp, week_offset bigint,
    n_users bigint)``.

    Scale shape: first-event extraction is one user-keyed aggregate;
    activity collapses to distinct (user, week) BEFORE joining the
    cohort relation (so the join input is bounded by users × active
    weeks, not raw events); the final count groups on the bounded
    (cohort, offset) key. All three shuffles are on user or
    low-cardinality keys — no window over raw events."""
    wk = F.date_trunc("week", F.col(ts_col))
    first = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = events.select(
        F.col(user_col).alias("__u"), wk.alias("__wk")
    ).distinct()
    joined = active.join(first, "__u")
    return (
        joined.groupBy(
            "cohort_week",
            (
                F.datediff(F.col("__wk"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def grouped_zscore_window(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group z-score as pure window aggregates — the all-JVM fast
    path equivalent of the ``applyInPandas`` surface demo (q38): mean
    and population-std via ``avg``/``stddev_pop`` over the group
    window, no Python round trip. ~10× the grouped-map form at sf0.1
    because the O(rows) Arrow transfer disappears; use the grouped-map
    surface only when the per-group logic genuinely needs Python.
    Output: (id_col, group_col, zscore) — zero-variance groups emit
    null, matching the grouped-map semantics."""
    w = Window.partitionBy(group_col)
    mu = F.avg(value_col).over(w)
    sigma = F.stddev_pop(value_col).over(w)
    return df.select(
        id_col,
        group_col,
        F.when(
            sigma > 0, F.round((F.col(value_col) - mu) / sigma, 6)
        ).alias("zscore"),
    )
