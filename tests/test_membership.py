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


# ---------------------------------------------------------------------------
# ingestion source helpers (sources.read_jsonl / text / whole-files)
# ---------------------------------------------------------------------------


def test_jsonl_roundtrip_and_gzip(spark, tmp_path_factory):
    from pyspark.sql import types as T

    from lsdm_motogp_data_integration_spark.sources import (
        read_jsonl,
        write_jsonl,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "hello"), (2, 'quote " and\tunicode é')], schema
    )
    plain = str(tmp_path_factory.mktemp("jsonl"))
    gz = str(tmp_path_factory.mktemp("jsonl_gz"))
    write_jsonl(df, plain)
    write_jsonl(df, gz, compression="gzip")
    back = sorted(map(tuple, read_jsonl(spark, plain, schema).collect()))
    back_gz = sorted(map(tuple, read_jsonl(spark, gz, schema).collect()))
    want = sorted(map(tuple, df.collect()))
    assert back == want and back_gz == want


def test_jsonl_malformed_line_nulls_not_fails(spark, tmp_path_factory):
    from pyspark.sql import types as T

    from lsdm_motogp_data_integration_spark.sources import read_jsonl

    d = tmp_path_factory.mktemp("jsonl_bad")
    (d / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\nNOT JSON AT ALL\n'
        '{"doc_id": 3, "extra": true}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    rows = read_jsonl(spark, str(d), schema).collect()
    assert len(rows) == 3  # PERMISSIVE keeps the corrupt row as nulls
    by_id = {r["doc_id"]: r["text"] for r in rows}
    assert by_id[1] == "ok"
    assert by_id[3] is None  # absent field -> null


def test_text_and_whole_file_sources(spark, tmp_path_factory):
    from lsdm_motogp_data_integration_spark.sources import (
        read_text_lines,
        read_whole_files,
    )

    d = tmp_path_factory.mktemp("rawtext")
    (d / "a.txt").write_text("line one\nline two\n")
    (d / "b.txt").write_bytes(b"\x00\x01binary blob")
    lines = read_text_lines(spark, str(d / "a.txt")).collect()
    assert sorted(r["value"] for r in lines) == ["line one", "line two"]
    files = read_whole_files(spark, str(d)).select("path", "content").collect()
    assert len(files) == 2
    blobs = {f["path"].rsplit("/", 1)[-1]: bytes(f["content"]) for f in files}
    assert blobs["b.txt"] == b"\x00\x01binary blob"


def test_screen_bloom_join_path_equals_literal_path(spark):
    """Past the size threshold screen_bloom ships the filter via a
    1-row broadcast join instead of a plan literal; the surviving set
    must be identical."""
    from lsdm_motogp_data_integration_spark.operators.membership import (
        screen_bloom,
    )

    ref = _items(spark, 0, 2000)
    probes = _items(spark, 0, 8000)
    bloom = build_bloom(ref, "v", fpp=0.01)
    lit_rows = sorted(
        r["v"] for r in screen_bloom(probes, bloom, "v").collect()
    )
    join_rows = sorted(
        r["v"]
        for r in screen_bloom(
            probes, bloom, "v", literal_max_bytes=0
        ).collect()
    )
    assert lit_rows == join_rows
    assert len(lit_rows) >= 2000  # all true members survive


def test_semantic_decontaminate_flags_copies_not_strangers(spark):
    """An exact-copy holdout vector flags its training source (cosine
    1.0); an orthogonal vector flags nothing; hit counts accumulate."""
    from lsdm_motogp_data_integration_spark.operators.membership import (
        semantic_decontaminate,
    )

    train = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [0.0, 0.0, 1.0]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    hold = spark.createDataFrame(
        [
            (10, [2.0, 0.0, 0.0]),   # scaled copy of 1 -> cosine 1.0
            (11, [1.0, 0.0, 0.0]),   # exact copy of 1 -> second hit
            (12, [0.7, 0.7, 0.0]),   # 45° from 1 and 2 -> no hit at 0.99
        ],
        "vec_id bigint, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["n_sem_hits"]
        for r in semantic_decontaminate(
            train, hold, "embedding", "vec_id", threshold=0.99
        ).collect()
    }
    assert got == {1: 2}
