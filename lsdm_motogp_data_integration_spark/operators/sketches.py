"""Fixed-size counting sketches.

Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") — the
100 TB answer to "how often does each term occur" when the distinct-
term space is too large to shuffle exactly: the sketch is a constant
``depth × width`` counter grid no matter how big the corpus is, built
with one fully map-side-combinable aggregation, and two sketches merge
by adding counters (so per-batch / per-datasource sketches compose).

Estimates carry the classic one-sided guarantee: ``est >= true`` always
(collisions only ADD), and ``est <= true + eps·N`` with probability
``1 - delta`` for ``width = ceil(e/eps)``, ``depth = ceil(ln(1/delta))``.

Hashes are the repo's portable md5 construction (see
``dedup.md5_60bit``): bit-identical in Spark and DuckDB, so the whole
sketch — buckets, counters, estimates — is replayed by the q49 oracle
and compared as exact VALUES, not just within error bounds.

No reference equivalent (the reference is an exact small-data ETL);
training-data-pipeline extension per the brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cms_bucket(term: Column | str, row: int, width: int, salt: str) -> Column:
    """Bucket of ``term`` in hash row ``row``: the repo-wide portable
    hash (``dedup.md5_60bit`` — the SAME construction every oracle
    replays) over ``'{salt}|{row}|' + term``, mod ``width``. The
    md5-60 value is non-negative, so plain ``%`` agrees between
    engines."""
    from lsdm_motogp_data_integration_spark.operators.dedup import (
        md5_60bit,
    )

    h = md5_60bit(F.concat(F.lit(f"{salt}|{row}|"), _c(term)))
    return (h % F.lit(int(width))).cast("int")


def _fanout(term: Column, depth: int, width: int, salt: str) -> Column:
    """The depth-way (row, bucket) explode shared by build and probe —
    ONE definition so the two sides can never disagree on the grid."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    cms_bucket(term, j, width, salt).alias("bucket"),
                )
                for j in range(int(depth))
            ]
        )
    )


def count_min_sketch(
    tokens: DataFrame,
    term_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch from a token relation (one row per occurrence,
    or per (term, weight) partial): returns ``(row, bucket, cnt)`` with
    at most ``depth × width`` rows.

    Scale shape: each input row fans out to exactly ``depth`` (row,
    bucket) pairs and the ONLY shuffle is a groupBy on that key — a
    key space of ``depth × width`` (constant), so the map-side partial
    aggregation collapses everything before the exchange; the reducer
    sees ≤ depth·width groups per mapper. The output is O(1)-sized
    and broadcastable by construction."""
    t = _c(term_col)
    w = _c(weight_col) if weight_col else F.lit(1)
    fan = _fanout(t, depth, width, salt)
    return (
        tokens.select(fan.alias("rb"), w.cast("bigint").alias("__w"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point estimates for every DISTINCT row of ``probes``: adds
    ``est`` (bigint, the min over the sketch's ``depth`` counters — 0
    when a bucket is empty, i.e. the term was never seen). Duplicate
    probe rows collapse to one output row (the estimate is a function
    of the row's values); probe column names are free — the sketch's
    internal ``row``/``bucket``/``cnt`` columns are renamed before the
    join so they can't collide with probe columns.

    ``width``/``depth``/``salt`` must match the build call. The sketch
    side is broadcast (≤ depth·width rows by construction), so probing
    is shuffle-free on the probe side no matter how many probes — the
    shape that lets a 100 TB scan annotate every token with its
    corpus frequency estimate."""
    t = _c(term_col)
    ex = probes.select(
        "*", _fanout(t, depth, width, salt).alias("__rb")
    ).select(
        "*",
        F.col("__rb.row").alias("__row"),
        F.col("__rb.bucket").alias("__bucket"),
    )
    sk = sketch.select(
        F.col("row").alias("__row"),
        F.col("bucket").alias("__bucket"),
        F.col("cnt").alias("__cnt"),
    )
    joined = ex.join(F.broadcast(sk), ["__row", "__bucket"], "left")
    keys = list(probes.columns)
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    tokens: DataFrame,
    term_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` terms by CMS-estimated frequency (ties broken by
    term, deterministic): builds the sketch, probes it with the
    distinct terms, and ranks by ``(est desc, term asc)``.

    The candidate set here is the corpus's own distinct terms (CMS
    alone cannot enumerate keys); at scale the same probe path runs
    against any bounded candidate feed — a sampled vocabulary, a
    per-partition Misra-Gries pre-filter, a prior round's hitters.
    Ranking is a distributed TakeOrdered (``orderBy().limit()``), not
    a single-reducer window. Returns ``(term, est, rk)``."""
    sk = count_min_sketch(
        tokens, term_col, width=width, depth=depth, salt=salt
    )
    probes = tokens.select(_c(term_col).alias("term")).distinct()
    est = cms_estimate(
        sk, probes, "term", width=width, depth=depth, salt=salt
    )
    ranked = est.orderBy(F.col("est").desc(), F.col("term").asc()).limit(
        int(top_k)
    )
    # rank re-derived from the already-limited rows: the window runs
    # over top_k rows, not the corpus
    from pyspark.sql import Window

    w = Window.orderBy(F.col("est").desc(), F.col("term").asc())
    return ranked.select(
        "term", "est", F.row_number().over(w).cast("bigint").alias("rk")
    )
