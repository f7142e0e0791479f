"""Count-min sketch invariants (operators/sketches)."""

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.sketches import (
    cms_estimate,
    cms_heavy_hitters,
    count_min_sketch,
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
