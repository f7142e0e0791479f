"""Versioned-snapshot maintenance: SCD2 merge (upsert with history).

The MERGE INTO / slowly-changing-dimension-type-2 shape every lakehouse
pipeline needs (Kimball SCD2; Delta/Iceberg ``MERGE`` semantics,
re-expressed as plain joins so it runs on vanilla parquet): maintain a
full change history of a keyed dataset across snapshot versions, where
each history row carries ``[ver_from, ver_to)`` validity and the open
rows (``ver_to IS NULL``) are the current state.

No reference equivalent (the reference's Kettle DAG truncates and
reloads its output tables, ``motogp.ktr`` table-output steps);
training-data pipelines need the versioned form to reproduce "the
corpus as of release N".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Digest sentinel for NULL bodies. md5 output is 32 hex chars, so a
#: non-hex sentinel cannot collide with a real digest; this keeps the
#: history row constant-width without a separate presence column.
_NULL_DIGEST = "__NULL__"


def _digest(content_col: str) -> F.Column:
    return F.coalesce(
        F.md5(F.col(content_col)), F.lit(_NULL_DIGEST)
    )


def scd2_init(
    snapshot: DataFrame,
    id_col: str,
    content_col: str,
    *,
    version: int = 1,
) -> DataFrame:
    """Seed an SCD2 history from the first snapshot: every key becomes
    an open row ``(id_col, digest, ver_from=version, ver_to=NULL)``.
    Rows are constant-width (id + 32-byte digest) regardless of
    document size — the history never stores bodies, only enough to
    detect change; join back to the versioned snapshot store by
    (id, ver_from) when bodies are needed."""
    return snapshot.select(
        F.col(id_col),
        _digest(content_col).alias("digest"),
        F.lit(int(version)).cast("bigint").alias("ver_from"),
        F.lit(None).cast("bigint").alias("ver_to"),
    )


def scd2_apply(
    history: DataFrame,
    snapshot: DataFrame,
    id_col: str,
    content_col: str,
    *,
    version: int,
) -> DataFrame:
    """Merge the next snapshot into an SCD2 history (MERGE INTO with
    history retention): unchanged keys keep their open row; changed
    keys close the old row at ``version`` and open a new one; new keys
    open a row; keys absent from the snapshot close (delete
    detection). Already-closed rows pass through untouched.

    Scale shape: the snapshot collapses to (id, digest) before
    anything else, so the one full-outer join shuffles constant-width
    rows on the id key — same contract as
    :func:`~..profile.corpus_diff`; closed-history passthrough is a
    union, not a join, so history length never raises join cost. The
    changed/added branch re-emits from the join output directly (no
    second pass over the snapshot)."""
    ver = F.lit(int(version)).cast("bigint")
    closed = history.filter(F.col("ver_to").isNotNull())
    current = history.filter(F.col("ver_to").isNull()).select(
        F.col(id_col).alias("__id"),
        F.col("digest").alias("__od"),
        F.col("ver_from").alias("__vf"),
    )
    snap = snapshot.select(
        F.col(id_col).alias("__id"),
        _digest(content_col).alias("__nd"),
    )
    j = current.join(snap, "__id", "full_outer")
    in_old = F.col("__od").isNotNull()  # digest never NULL when present
    in_new = F.col("__nd").isNotNull()
    same = F.col("__od") == F.col("__nd")
    # open-row fate: keep open (unchanged) or close at `version`
    kept = j.filter(in_old & in_new & same).select(
        F.col("__id").alias(id_col),
        F.col("__od").alias("digest"),
        F.col("__vf").alias("ver_from"),
        F.lit(None).cast("bigint").alias("ver_to"),
    )
    newly_closed = j.filter(in_old & (~in_new | ~same)).select(
        F.col("__id").alias(id_col),
        F.col("__od").alias("digest"),
        F.col("__vf").alias("ver_from"),
        ver.alias("ver_to"),
    )
    opened = j.filter(in_new & (~in_old | ~same)).select(
        F.col("__id").alias(id_col),
        F.col("__nd").alias("digest"),
        ver.alias("ver_from"),
        F.lit(None).cast("bigint").alias("ver_to"),
    )
    return (
        closed.select(id_col, "digest", "ver_from", "ver_to")
        .unionByName(kept)
        .unionByName(newly_closed)
        .unionByName(opened)
    )


def partial_aggs(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Decomposable per-key aggregate STATE for incremental
    maintenance: ``(keys…, n, sum_v decimal(38,6), sumsq_v
    decimal(38,6), min_v, max_v)``. The state of a batch is mergeable
    with any other batch's state (:func:`merge_partial_aggs`), so a
    100 TB corpus's statistics are maintained by aggregating only each
    new delta — never re-scanning history. Sums (including the
    sum-of-squares moment, which makes mean AND variance derivable
    after any merge) are decimal so merge order can't change the
    result (the repo's float-determinism convention)."""
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v.cast("decimal(38,6)")).alias("sum_v"),
        F.sum((v * v).cast("decimal(38,6)")).alias("sumsq_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_partial_aggs(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge any number of :func:`partial_aggs` states into one —
    count/sum re-add, min/max re-extremize (the algebraic combine
    every distributive aggregate admits). One union + one hash
    aggregate over STATE rows (O(keys), not O(raw data)); this is
    exactly Spark's own partial-aggregation combine, lifted to a
    persistable relation so it can span batches, days, or clusters.
    Derived measures (mean = sum/n) must be computed AFTER the final
    merge — they don't compose.

    STATE-FORMAT COMPATIBILITY: ``sumsq_v`` was added to the state
    schema after the first release; states persisted by the older
    writer lack the column. Those still merge (union with
    ``allowMissingColumns`` fills NULL), and a key whose history
    includes ANY old-format state reports NULL ``sumsq_v`` — variance
    is honestly non-derivable there (a partial sum would be silently
    wrong) while n/sum/min/max stay exact."""
    if not states:
        raise ValueError("merge_partial_aggs needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s, allowMissingColumns=True)
    if "sumsq_v" not in u.columns:
        u = u.withColumn(
            "sumsq_v", F.lit(None).cast("decimal(38,6)")
        )
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        # NULL if any contributing state predates sumsq_v — never a
        # partial (wrong) second moment
        F.when(
            F.count(F.lit(1)) == F.count("sumsq_v"),
            F.sum("sumsq_v"),
        ).alias("sumsq_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_aggs(state: DataFrame) -> DataFrame:
    """Derived measures from a (merged) state: mean and SAMPLE
    variance/stddev from the two decimal moments — identical scalar
    double expressions in any engine (the q43 ``exact`` convention),
    computed ONCE after the final merge (derived measures don't
    compose). n = 1 groups report NULL variance (no degrees of
    freedom); variance is clamped at 0 against negative rounding
    residue."""
    n = F.col("n").cast("double")
    s1 = F.col("sum_v").cast("double")
    s2 = F.col("sumsq_v").cast("double")
    var = F.when(
        F.col("n") > 1,
        F.greatest(
            (s2 - s1 * s1 / n) / (n - F.lit(1.0)), F.lit(0.0)
        ),
    )
    return state.select(
        "*",
        (s1 / n).alias("mean_v"),
        var.alias("var_v"),
        F.sqrt(var).alias("std_v"),
    )
