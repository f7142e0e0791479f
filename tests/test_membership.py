"""Bloom-filter membership screening (operators/membership.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.membership import (
    BloomSpec,
    build_bloom,
    might_contain,
    ngram_decontaminate,
)


def _items(spark, lo, hi, tag="item"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"{tag}-"), F.col("id")).alias("v")
    )


def test_bloom_no_false_negatives(spark):
    ref = _items(spark, 0, 3000)
    bloom = build_bloom(ref, "v", fpp=0.01)
    assert ref.filter(~might_contain(bloom, "v")).count() == 0


def test_bloom_fp_rate_near_target(spark):
    ref = _items(spark, 0, 3000)
    bloom = build_bloom(ref, "v", fpp=0.01)
    n_probe = 30000
    fp = (
        _items(spark, 100000, 100000 + n_probe)
        .filter(might_contain(bloom, "v"))
        .count()
    )
    # standard sizing lands near the target; 3x headroom kills flakes
    assert fp / n_probe < 0.03


def test_bloom_size_is_metadata_scale(spark):
    ref = _items(spark, 0, 3000)
    bloom = build_bloom(ref, "v", fpp=0.01)
    # ~9.6 bits/item at 1% fpp -> well under 8 KiB for 3000 items
    assert bloom.size_bytes < 8192
    assert bloom.k >= 1


def test_bloom_deterministic_across_layouts(spark):
    ref = _items(spark, 0, 2000)
    a = build_bloom(ref, "v", fpp=0.01)
    b = build_bloom(ref.repartition(13), "v", fpp=0.01)
    assert a == b


def test_bloom_probe_is_codegen_no_join(spark):
    """The membership probe must stay a scan-side filter: no join, no
    shuffle in the screened plan."""
    ref = _items(spark, 0, 1000)
    bloom = build_bloom(ref, "v", fpp=0.01)
    plan = (
        _items(spark, 0, 5000)
        .filter(might_contain(bloom, "v"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_explicit_sizing_skips_count_job(spark):
    ref = _items(spark, 0, 500)
    bloom = build_bloom(ref, "v", expected_items=500, fpp=0.01)
    assert isinstance(bloom, BloomSpec)
    assert ref.filter(~might_contain(bloom, "v")).count() == 0


def test_decontaminate_bloom_equals_exact(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    train = d.filter(F.col("doc_id") % 2 == 0)
    ev = d.filter(F.col("doc_id") % 2 == 1)
    exact = ngram_decontaminate(train, ev, n=5, method="exact")
    bloom = ngram_decontaminate(train, ev, n=5, method="bloom")
    a = sorted(map(tuple, exact.collect()))
    b = sorted(map(tuple, bloom.collect()))
    assert a == b
    assert len(a) > 0  # the synthetic corpus shares vocabulary


def test_decontaminate_rejects_unknown_method(spark, sf_dir):
    import pytest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    with pytest.raises(ValueError):
        ngram_decontaminate(d, d, method="nope")
