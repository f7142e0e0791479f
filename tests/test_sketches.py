"""Count-min sketch + HyperLogLog invariants (operators/sketches)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    count_min_sketch,
    hll_est_sql,
    hll_estimate,
    hll_merge,
    hll_pow_sql,
    hll_rho_sql,
    hll_sketch,
)
from lsdm_motogp_data_integration_spark.sources import read_table


def _tokens(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").select("text")
    return d.select(
        F.explode(
            F.split(
                F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "
            )
        ).alias("term")
    )


def test_cms_one_sided_and_bounded(spark, sf_dir):
    """est >= true count for EVERY term (collisions only add), and the
    sketch relation never exceeds depth*width rows."""
    toks = _tokens(spark, sf_dir)
    sk = count_min_sketch(toks, "term", width=16, depth=3)
    assert sk.count() <= 3 * 16
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    est = cms_estimate(sk, exact, "term", width=16, depth=3)
    bad = est.filter(F.col("est") < F.col("tf")).count()
    assert bad == 0
    # with 31 terms in 16 buckets some term MUST overcount — the test
    # data actually exercises the sketch, not a collision-free regime
    assert est.filter(F.col("est") > F.col("tf")).count() > 0


def test_cms_exact_in_wide_regime(spark, sf_dir):
    """With width >> vocabulary, every estimate is exact."""
    toks = _tokens(spark, sf_dir)
    sk = count_min_sketch(toks, "term", width=4096, depth=4)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    est = cms_estimate(sk, exact, "term", width=4096, depth=4)
    assert est.filter(F.col("est") != F.col("tf")).count() == 0


def test_cms_merge_is_counter_addition(spark, sf_dir):
    """sketch(A ∪ B) == elementwise sum of sketch(A) + sketch(B) — the
    property that lets per-batch sketches compose at scale."""
    toks = _tokens(spark, sf_dir).withColumn(
        "half", F.monotonically_increasing_id() % 2
    )
    a = count_min_sketch(toks.filter("half = 0"), "term", width=16, depth=3)
    b = count_min_sketch(toks.filter("half = 1"), "term", width=16, depth=3)
    merged = (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = count_min_sketch(toks, "term", width=16, depth=3)
    sym = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert sym == 0


def test_cms_unseen_term_estimates_small(spark, sf_dir):
    """A term never inserted gets whatever its buckets hold — with a
    wide sketch that is 0."""
    toks = _tokens(spark, sf_dir)
    sk = count_min_sketch(toks, "term", width=4096, depth=4)
    probe = spark.createDataFrame([("zzz-never-seen",)], "term string")
    est = cms_estimate(sk, probe, "term", width=4096, depth=4)
    assert est.first()["est"] == 0


def test_cms_heavy_hitters_rank_matches_exact_in_wide_regime(spark, sf_dir):
    """In the collision-free regime the CMS top-k IS the exact top-k
    (same ranks, deterministic tie-break)."""
    toks = _tokens(spark, sf_dir)
    hh = cms_heavy_hitters(toks, "term", width=4096, depth=4, top_k=10)
    exact = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(10)
        .collect()
    )
    got = hh.orderBy("rk").collect()
    assert [(r["term"], r["est"]) for r in got] == [
        (r["term"], r["tf"]) for r in exact
    ]


def test_hll_accuracy_within_paper_bound(spark):
    """m=64 registers → ~1.04/sqrt(64) = 13% expected relative error;
    assert 3 sigma (~40%) on three groups of ~1.7k distinct ids, and
    that the sketch never exceeds m rows per group."""
    rows = [(i % 3, i * 7 + 1) for i in range(5000)]
    df = spark.createDataFrame(rows, "g int, uid bigint")
    sk = hll_sketch(df, "uid", m=64, group_cols=("g",))
    assert (
        sk.groupBy("g").count().filter(F.col("count") > 64).count() == 0
    )
    est = {
        r["g"]: r["hll_est"]
        for r in hll_estimate(sk, m=64, group_cols=("g",)).collect()
    }
    exact = {g: len({u for gg, u in rows if gg == g}) for g in (0, 1, 2)}
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.40, (g, est[g])


def test_hll_merge_equals_sketch_of_union(spark):
    """Register-wise MAX of per-half sketches == sketch of the whole —
    the merge property that lets per-batch partials compose exactly."""
    rows = [(i,) for i in range(2000)]
    df = spark.createDataFrame(rows, "uid bigint")
    a = hll_sketch(df.filter("uid % 2 = 0"), "uid", m=64)
    b = hll_sketch(df.filter("uid % 2 = 1"), "uid", m=64)
    merged = hll_merge(a, b)
    whole = hll_sketch(df, "uid", m=64)
    sym = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert sym == 0


def test_hll_ignores_nulls_and_counts_distinct_not_rows(spark):
    """Duplicate terms don't move any register (MAX is idempotent) and
    NULL terms are dropped — COUNT(DISTINCT ...) semantics."""
    base = spark.createDataFrame([(i,) for i in range(500)], "uid bigint")
    dup = base.unionByName(base).unionByName(
        spark.createDataFrame([(None,)], "uid bigint")
    )
    a = hll_sketch(base, "uid", m=64)
    b = hll_sketch(dup, "uid", m=64)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_hll_small_range_linear_counting_is_tight(spark):
    """With n << m the estimator takes the linear-counting branch,
    which is near-exact for tiny sets."""
    df = spark.createDataFrame([(i,) for i in range(10)], "uid bigint")
    est = hll_estimate(hll_sketch(df, "uid", m=64), m=64).first()
    assert est["hll_v"] > 0
    assert abs(est["hll_est"] - 10) <= 1.0


def test_hll_duckdb_bit_parity(spark):
    """The DuckDB replay (the q43 oracle construction, via the shared
    hll_*_sql snippets) reproduces registers, the exact scaled harmonic
    sum, the register checksum, AND the rounded estimate as exact
    values."""
    rows = [(i % 3, i * 7 + 1) for i in range(3000)]
    df = spark.createDataFrame(rows, "g int, uid bigint")
    sk = hll_sketch(df, "uid", m=64, group_cols=("g",))
    sp = {
        r["g"]: (r["hll_v"], r["hll_s"], r["hll_reg_sum"], r["hll_est"])
        for r in hll_estimate(sk, m=64, group_cols=("g",)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(g INT, uid BIGINT)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    h = (
        "CAST(('0x' || substr(md5('hll|' || CAST(uid AS VARCHAR)), 1, 15))"
        " AS BIGINT)"
    )
    _, estx = hll_est_sql(64)
    got = con.execute(f"""
        WITH hashes AS (SELECT g, {h} AS h FROM t WHERE uid IS NOT NULL),
        regs AS (SELECT g, CAST(h % 64 AS INT) AS idx,
                 {hll_rho_sql('h', 64)} AS rho FROM hashes),
        sk AS (SELECT g, idx, MAX(rho) AS reg FROM regs GROUP BY 1, 2),
        agg AS (SELECT g, CAST(64 - COUNT(*) AS BIGINT) AS hll_v,
                CAST(SUM({hll_pow_sql('reg', 64)})
                     + (64 - COUNT(*)) * {1 << 55} AS BIGINT) AS hll_s,
                CAST(SUM((idx + 1) * reg) AS BIGINT) AS hll_reg_sum
                FROM sk GROUP BY 1)
        SELECT g, hll_v, hll_s, hll_reg_sum, {estx} AS hll_est
        FROM agg ORDER BY g
    """).fetchall()
    assert {r[0]: tuple(r[1:]) for r in got} == sp


def test_hll_rejects_non_power_of_two_m(spark):
    df = spark.createDataFrame([(1,)], "uid bigint")
    with pytest.raises(ValueError):
        hll_sketch(df, "uid", m=48)


def test_cms_weighted_counts(spark):
    """weight_col accumulates weights, not occurrences."""
    df = spark.createDataFrame(
        [("a", 5), ("a", 2), ("b", 1)], "term string, w int"
    )
    sk = count_min_sketch(df, "term", width=64, depth=3, weight_col="w")
    est = cms_estimate(
        sk, df.select("term").distinct(), "term", width=64, depth=3
    )
    vals = {r["term"]: r["est"] for r in est.collect()}
    assert vals == {"a": 7, "b": 1}


def test_histogram_quantile_within_one_bin_of_exact(spark):
    """Estimates must land within one bin width above the exact
    discrete quantile (upper-edge convention)."""
    import math

    from lsdm_motogp_data_integration_spark.operators.sketches import (
        histogram_quantile,
        histogram_sketch,
    )

    vals = [float((i * 37) % 500) for i in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    sk = histogram_sketch(df, "x", lo=0.0, hi=500.0, n_bins=100)
    assert sk.count() <= 100
    got = {
        r["q"]: r["qvalue"]
        for r in histogram_quantile(
            sk, [0.1, 0.5, 0.9], lo=0.0, hi=500.0, n_bins=100
        ).collect()
    }
    s = sorted(vals)
    width = 500.0 / 100
    for q, est in got.items():
        exact = s[math.ceil(q * len(s)) - 1]
        assert exact <= est <= exact + width + 1e-9, (q, est, exact)


def test_histogram_merge_is_counter_addition_and_clamps(spark):
    from lsdm_motogp_data_integration_spark.operators.sketches import (
        histogram_merge,
        histogram_sketch,
    )

    a = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    b = spark.createDataFrame(
        [(float(i),) for i in range(50, 150)] + [(-5.0,), (1e9,)],
        "x double",
    )
    kw = dict(lo=0.0, hi=100.0, n_bins=10)
    merged = histogram_merge(
        histogram_sketch(a, "x", **kw), histogram_sketch(b, "x", **kw)
    )
    whole = histogram_sketch(a.unionByName(b), "x", **kw)
    sym = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert sym == 0
    # out-of-range rows clamp into the end bins, never vanish
    total = sum(r["cnt"] for r in whole.collect())
    assert total == 202


def test_hll_estimate_of_empty_sketch_is_zero(spark):
    """The streaming path can probe state before any batch lands: the
    empty register relation must estimate 0, not NULL."""
    empty = spark.createDataFrame([], "idx int, reg int")
    r = hll_estimate(empty, m=64).first()
    assert r["hll_v"] == 64 and r["hll_est"] == 0.0
    assert r["hll_s"] == 64 * (1 << 55) and r["hll_reg_sum"] == 0


def test_hll_overlap_estimate_tracks_true_intersection(spark):
    """Two 2k-id sets overlapping by 1k: the sketch-only overlap
    estimate lands within the compounded error band of the truth, and
    disjoint sets estimate near zero."""
    a = spark.createDataFrame([(i,) for i in range(2000)], "uid bigint")
    b = spark.createDataFrame(
        [(i,) for i in range(1000, 3000)], "uid bigint"
    )
    from lsdm_motogp_data_integration_spark.operators.sketches import (
        hll_overlap_estimate,
    )

    r = hll_overlap_estimate(
        hll_sketch(a, "uid", m=64), hll_sketch(b, "uid", m=64), m=64
    ).first()
    # truth 1000; three +-13% estimates compound — accept a wide band
    assert 200 <= r["est_overlap"] <= 2200, r["est_overlap"]
    c = spark.createDataFrame([(i,) for i in range(10_000, 12_000)], "uid bigint")
    r2 = hll_overlap_estimate(
        hll_sketch(a, "uid", m=64), hll_sketch(c, "uid", m=64), m=64
    ).first()
    assert r2["est_overlap"] <= 700, r2["est_overlap"]
