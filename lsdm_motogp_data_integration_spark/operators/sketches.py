"""Fixed-size counting sketches.

Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications") — the
100 TB answer to "how often does each term occur" when the distinct-
term space is too large to shuffle exactly: the sketch is a constant
``depth × width`` counter grid no matter how big the corpus is, built
with one fully map-side-combinable aggregation, and two sketches merge
by adding counters (so per-batch / per-datasource sketches compose).

HyperLogLog (Flajolet et al. 2007, "HyperLogLog: the analysis of a
near-optimal cardinality estimation algorithm") — the mergeable
distinct-count companion: ``m`` max-of-rank registers per group, built
with one max aggregation (fully map-side combinable), merged by
register-wise MAX (so per-batch / per-source sketches compose and can
be PERSISTED — the property Spark's ``approx_count_distinct`` result
lacks: it returns a number, not a reusable state). Every piece —
register index, rank, the scaled harmonic sum — is integer arithmetic
over the repo's portable md5-60 hash, so the whole sketch is replayed
bit-exactly by the DuckDB oracle (q43 ``scope=hll_sketch``).

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


# ---------------------------------------------------------------------------
# HyperLogLog — mergeable distinct-count registers
# ---------------------------------------------------------------------------
#
# Register math (all exact integers until the final division):
#   h    = md5_60bit(salt|term)             — 60-bit portable hash
#   idx  = h % m                            — register index (m = 2^p)
#   v    = h div m                          — the remaining B = 60-p bits
#   rho  = 1 + (trailing zeros of v)        — capped at B+1 when v = 0
# computed WITHOUT materializing v: v % 2^k == 0  iff
# (h - idx) % (m·2^k) == 0, so the trailing-zero count is a sum of
# B modulo indicators over h itself — BIGINT-safe in both engines and
# bit-identical to the DuckDB replay.
#
# The estimate's harmonic sum is kept exact by scaling: a register at
# rho contributes 2^(B+1-rho), an untouched register 2^(B+1); the total
# S fits a signed BIGINT for any m (max is m·2^(B+1) = 2^61). The only
# floating-point steps are the final alpha·m²·2^(B+1)/S division and
# the small-range linear-counting branch m·ln(m/V) — identical IEEE
# expressions in both engines, then the repo's portable positive
# 6dp rounding (floor(x·1e6 + 0.5)/1e6).

#: alpha_m bias-correction constants from the HLL paper §4
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_params(m: int) -> tuple[int, int, float]:
    """(p, B, alpha) for register count ``m`` — power of two, ≥ 16."""
    p = int(m).bit_length() - 1
    if m < 16 or (1 << p) != m:
        raise ValueError(f"hll m must be a power of two >= 16, got {m}")
    alpha = _HLL_ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))
    return p, 60 - p, alpha


def hll_rho(h: Column, m: int) -> Column:
    """Rank of hash ``h``: 1 + trailing zeros of ``h div m`` (B+1 when
    the value bits are all zero) — the indicator-sum construction above,
    pure integer Column arithmetic."""
    _, B, _ = _hll_params(m)
    base = h - (h % F.lit(int(m)))
    out: Column = F.lit(1)
    for k in range(1, B + 1):
        out = out + F.when(
            base % F.lit(int(m) << k) == 0, F.lit(1)
        ).otherwise(F.lit(0))
    return out.cast("int")


def hll_rho_sql(h_sql: str, m: int) -> str:
    """The DuckDB text of :func:`hll_rho` over hash expression
    ``h_sql`` — generated from the same loop so the two sides can
    never disagree."""
    _, B, _ = _hll_params(m)
    terms = " + ".join(
        f"(CASE WHEN (({h_sql}) - (({h_sql}) % {m})) % {m << k} = 0 "
        "THEN 1 ELSE 0 END)"
        for k in range(1, B + 1)
    )
    return f"CAST(1 + {terms} AS INT)"


def _hll_pow(reg: Column, m: int) -> Column:
    """Exact BIGINT ``2^(B+1-reg)`` for ``reg`` in 1..B+1 (a CASE
    chain of power-of-two literals — no float pow in the sum path)."""
    _, B, _ = _hll_params(m)
    out = F.when(reg == 1, F.lit(1 << B))
    for r in range(2, B + 2):
        out = out.when(reg == r, F.lit(1 << (B + 1 - r)))
    return out.cast("bigint")


def hll_pow_sql(reg_sql: str, m: int) -> str:
    """DuckDB text of :func:`_hll_pow`."""
    _, B, _ = _hll_params(m)
    whens = " ".join(
        f"WHEN {r} THEN {1 << (B + 1 - r)}" for r in range(1, B + 2)
    )
    return f"CAST(CASE ({reg_sql}) {whens} END AS BIGINT)"


def hll_sketch(
    df: DataFrame,
    term_col: str,
    *,
    m: int = 64,
    salt: str = "hll",
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Build per-group HLL registers: ``(group_cols..., idx, reg)``
    with at most ``m`` rows per group. NULL terms are ignored
    (``COUNT(DISTINCT ...)`` semantics).

    Scale shape: the ONLY shuffle is a groupBy on (group, idx) — a key
    space of ``m`` per group, so map-side MAX partials collapse
    everything before the exchange; output is O(m) per group and
    broadcastable. Unlike ``approx_count_distinct`` the result is a
    PERSISTABLE relation: write it, merge it with tomorrow's sketch
    (:func:`hll_merge`), estimate any union of sources without
    rescanning history."""
    from lsdm_motogp_data_integration_spark.operators.dedup import (
        md5_60bit,
    )

    t = _c(term_col)
    h = md5_60bit(F.concat(F.lit(f"{salt}|"), t.cast("string")))
    gcols = [F.col(g) for g in group_cols]
    return (
        df.where(t.isNotNull())
        .select(
            *gcols,
            (h % F.lit(int(m))).cast("int").alias("idx"),
            hll_rho(h, m).alias("rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(
    *sketches: DataFrame,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Register-wise MAX across sketches built with the same
    ``(m, salt)`` — the HLL merge property: the result is EXACTLY the
    sketch of the unioned inputs (pinned by test), so per-batch /
    per-source partials compose without rescanning anything."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "idx").agg(
        F.max("reg").alias("reg")
    )


def hll_estimate(
    sketch: DataFrame,
    *,
    m: int = 64,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Cardinality estimate per group from a register relation:
    ``(group_cols..., hll_v, hll_s, hll_reg_sum, hll_est)`` where
    ``hll_v`` = untouched registers, ``hll_s`` = the exact scaled
    harmonic sum, ``hll_reg_sum`` = Σ (idx+1)·reg (an order-free exact
    register checksum for cross-engine verification), and ``hll_est``
    the paper's estimator (raw, or linear counting when V > 0 and
    E ≤ 2.5m), positive-6dp-rounded. Expected relative error
    ~1.04/sqrt(m) (13% at m=64)."""
    p, B, alpha = _hll_params(m)
    scaled_num = float(alpha * m * m * (1 << (B + 1)))
    present = F.count(F.lit(1))
    agg = sketch.groupBy(*group_cols).agg(
        (F.lit(int(m)) - present).cast("bigint").alias("hll_v"),
        # coalesce: the GLOBAL aggregation of an EMPTY sketch yields
        # one row with SUM = NULL — the empty estimate must be 0 (all
        # registers untouched), not NULL
        (
            F.coalesce(F.sum(_hll_pow(F.col("reg"), m)), F.lit(0))
            + (F.lit(int(m)) - present) * F.lit(1 << (B + 1))
        ).cast("bigint").alias("hll_s"),
        F.coalesce(
            F.sum((F.col("idx") + F.lit(1)) * F.col("reg")), F.lit(0)
        )
        .cast("bigint")
        .alias("hll_reg_sum"),
    )
    e_raw = F.lit(scaled_num) / F.col("hll_s").cast("double")
    lc = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("hll_v").cast("double")
    )
    est = F.when(
        (F.col("hll_v") > 0) & (e_raw <= F.lit(2.5 * m)), lc
    ).otherwise(e_raw)
    # portable positive 6dp rounding (see scoring.bigram_nll)
    est6 = F.floor(est * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return agg.select(
        *group_cols, "hll_v", "hll_s", "hll_reg_sum", est6.alias("hll_est")
    )


def hll_est_sql(m: int) -> tuple[str, str]:
    """DuckDB text pieces of :func:`hll_estimate` for a register
    relation exposing ``hll_v`` (BIGINT) and ``hll_s`` (BIGINT):
    returns ``(raw_expr, est_expr)`` — the same literal constants and
    IEEE expression shape as the Spark side."""
    p, B, alpha = _hll_params(m)
    scaled_num = float(alpha * m * m * (1 << (B + 1)))
    raw = f"({scaled_num!r} / CAST(hll_s AS DOUBLE))"
    lc = f"({float(m)!r} * ln({float(m)!r} / CAST(hll_v AS DOUBLE)))"
    est = (
        f"(CASE WHEN hll_v > 0 AND {raw} <= {2.5 * m!r} "
        f"THEN {lc} ELSE {raw} END)"
    )
    return raw, f"(FLOOR({est} * 1e6 + 0.5) / 1e6)"


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


# ---------------------------------------------------------------------------
# Fixed-grid histogram — mergeable quantile sketch
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Fixed-grid histogram over ``[lo, hi)``: ``(group_cols..., bin,
    cnt)`` with at most ``n_bins`` rows per group — the MERGEABLE
    quantile state (merge = counter addition, same contract as the
    CMS), where :func:`profile.exact_quantiles` is the exact batch
    path. Values outside the range clamp into the end bins (their
    quantile estimates degrade to the range edge — pick lo/hi from
    domain knowledge or a prior exact profile). NULLs and NaNs are
    both ignored (COUNT-style semantics: without the NaN filter,
    Spark's ``floor(NaN)`` casts to bigint 0 and would silently land
    NaN rows in bin 0 — and DuckDB's CAST(NaN AS BIGINT) errors, so
    dropping NaN is also what keeps the SQL replay portable).

    Bin arithmetic is portable IEEE: ``floor((v - lo) / width)``
    clamped to [0, n_bins-1] — the same ops in any engine, so the
    whole sketch replays in SQL. One constant-key-space aggregate
    (map-side combinable), exactly the CMS build shape."""
    if not (hi > lo) or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    v = _c(value_col).cast("double")
    width = (float(hi) - float(lo)) / int(n_bins)
    raw = F.floor((v - F.lit(float(lo))) / F.lit(width))
    bin_ = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.lit(int(n_bins) - 1).cast("bigint"), raw.cast("bigint")),
    )
    return (
        df.where(v.isNotNull() & ~F.isnan(v))
        .groupBy(*group_cols, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(
    *sketches: DataFrame,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Counter addition across per-batch/per-source histograms built
    with the same grid."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantile(
    sketch: DataFrame,
    qs: list[float],
    *,
    lo: float,
    hi: float,
    n_bins: int = 128,
    group_cols: tuple[str, ...] | list[str] = (),
) -> DataFrame:
    """Quantile estimates from a histogram sketch: for each ``q`` the
    UPPER EDGE of the first bin whose cumulative count reaches rank
    ``ceil(q·n)`` — a deterministic estimate within one bin width of
    the exact :func:`profile.exact_quantiles` value (pinned by test).
    Returns ``(group_cols..., q, qvalue, n)``.

    The cumulative window runs over ≤ ``n_bins`` rows per group
    (bounded state, never corpus-sized); ranks are exact decimal
    arithmetic; edges are single IEEE expressions — SQL-replayable.
    ALL requested quantiles come out of ONE pass over the cumulative
    relation (per-q conditional aggregates + an explode — the
    :func:`profile.exact_quantiles` shape), so a sketch built from raw
    data is not re-aggregated once per q."""
    from pyspark.sql import Window

    width = (float(hi) - float(lo)) / int(n_bins)
    w = (
        Window.partitionBy(*[F.col(g) for g in group_cols])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*[F.col(g) for g in group_cols])
    cum = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(wn).alias("__n"),
    )
    aggs = [F.min("__n").alias("__ntot")]
    for i, q in enumerate(qs):
        rank = F.ceil(
            F.lit(float(q)).cast("decimal(18,9)") * F.col("__n")
        ).cast("bigint")
        aggs.append(
            F.min(
                F.when(F.col("__cum") >= rank, F.col("bin"))
            ).alias(f"__b{i}")
        )
    one = cum.groupBy(*group_cols).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(q)).alias("q"),
                (
                    F.lit(float(lo))
                    + (F.col(f"__b{i}") + F.lit(1)).cast("double")
                    * F.lit(width)
                ).alias("qvalue"),
            )
            for i, q in enumerate(qs)
        ]
    )
    return one.select(
        *group_cols, F.explode(pairs).alias("p"), F.col("__ntot")
    ).select(
        *group_cols,
        F.col("p.q").alias("q"),
        F.col("p.qvalue").alias("qvalue"),
        F.col("__ntot").cast("bigint").alias("n"),
    )


def hll_overlap_estimate(
    a: DataFrame,
    b: DataFrame,
    *,
    m: int = 64,
) -> DataFrame:
    """Distinct-overlap estimate between two corpora from their HLL
    sketches alone (inclusion–exclusion: ``|A ∩ B| ≈ est(A) + est(B)
    − est(A ∪ B)``, with the union sketch = register-wise MAX): the
    "how much does source X overlap source Y" dashboard number
    WITHOUT ever joining the corpora — three O(m) relations in, one
    row out (``est_a``, ``est_b``, ``est_union``, ``est_overlap``).

    Error compounds (three ±1.04/√m estimates), so this is a
    magnitude signal, not a dedup decision — route real overlap
    through the dedup family. Negative differences clamp to 0."""
    ea = hll_estimate(a, m=m).select(
        F.col("hll_est").alias("est_a")
    )
    eb = hll_estimate(b, m=m).select(
        F.col("hll_est").alias("est_b")
    )
    eu = hll_estimate(hll_merge(a, b), m=m).select(
        F.col("hll_est").alias("est_union")
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"),
                F.lit(0.0),
            ).alias("est_overlap"),
        )
    )
