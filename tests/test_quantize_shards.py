"""int8 embedding quantization + deterministic training shards."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.ann import (
    quantize_embeddings,
)
from lsdm_motogp_data_integration_spark.operators.keys import (
    training_shards,
)
from lsdm_motogp_data_integration_spark.sources import read_table


def test_quantize_codes_and_error_bound(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    out = quantize_embeddings(e, "embedding", "vec_id")
    rows = out.collect()
    assert len(rows) == e.count()
    for r in rows:
        codes = [int(c) for c in r["qvec"].split(",")]
        assert len(codes) == 64
        assert all(-127 <= c <= 127 for c in codes)
        # at least one component sits at full scale (the abs-max one)
        assert max(abs(c) for c in codes) == 127
        # the rounding grid bounds reconstruction error by scale/2
        assert r["max_err"] <= r["scale"] / 2 + 1e-9


def test_quantize_zero_vector_is_all_zero(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4)], "id long, v array<double>"
    )
    r = quantize_embeddings(df, "v", "id").collect()[0]
    assert r["qvec"] == "0,0,0,0"
    assert r["max_err"] == 0.0


def test_training_shards_dense_and_deterministic(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    out = training_shards(d, "doc_id", n_shards=4)
    rows = out.collect()
    assert len(rows) == d.count()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are dense 0..n-1 within every shard
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # deterministic under a different partition layout
    again = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in training_shards(
            d.repartition(13), "doc_id", n_shards=4
        ).collect()
    }
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}


def test_training_shards_null_id_stays_in_contract(spark):
    from pyspark.sql import types as T

    from lsdm_motogp_data_integration_spark.operators.keys import (
        training_shards,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c"), (2, "d")], schema
    )
    out = training_shards(df, "doc_id", n_shards=4).collect()
    assert all(r["shard"] is not None for r in out)
    assert all(0 <= r["shard"] < 4 for r in out)


def test_write_training_shards_layout_and_order(spark, sf_dir, tmp_path):
    """The export writer produces one shard=<k>/ dir per shard whose
    file order IS the deterministic pos order, and the union of shards
    is exactly the input."""
    import glob
    import os

    import pytest

    from lsdm_motogp_data_integration_spark.operators.keys import (
        training_shards,
        write_training_shards,
    )
    from lsdm_motogp_data_integration_spark.sources import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "source")
    out = str(tmp_path / "shards")
    write_training_shards(d, out, "doc_id", n_shards=4)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert [os.path.basename(p) for p in dirs] == [
        f"shard={k}" for k in range(4)
    ]
    want = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in training_shards(d, "doc_id", n_shards=4).collect()
    }
    got = set()
    for k, p in enumerate(dirs):
        # file order must equal pos order (no sort on read)
        rows = spark.read.parquet(p).collect()
        assert [r["pos"] for r in rows] == sorted(r["pos"] for r in rows)
        got |= {(r["doc_id"], k, r["pos"]) for r in rows}
    assert got == want

    with pytest.raises(ValueError, match="unsupported"):
        write_training_shards(d, out, "doc_id", fmt="csvx")


def test_training_shards_curriculum_order(spark):
    """order_col makes each shard stream its rows in curriculum order
    (difficulty asc, md5 tie-break) while the shard ASSIGNMENT is
    unchanged (still the uniform hash)."""
    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.operators.keys import (
        training_shards,
    )

    df = spark.createDataFrame(
        [(i, float((i * 13) % 7)) for i in range(300)],
        "doc_id bigint, difficulty double",
    )
    plain = training_shards(df, "doc_id", n_shards=4)
    curr = training_shards(
        df, "doc_id", n_shards=4, order_col="difficulty"
    )
    a = {r["doc_id"]: r["shard"] for r in plain.collect()}
    rows = curr.collect()
    b = {r["doc_id"]: r["shard"] for r in rows}
    assert a == b  # assignment untouched
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["pos"])
        diffs = [r["difficulty"] for r in rs]
        assert diffs == sorted(diffs), shard  # easy -> hard per shard


def test_shard_manifest_matches_written_shards(spark, sf_dir, tmp_path):
    """shard_manifest (r4): counts/token sums/fingerprints computed
    from the source relation must equal a recomputation over the
    WRITTEN shard files (order-independent XOR fingerprint), and the
    fingerprint must be invariant under repartitioning."""
    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.operators.keys import (
        shard_manifest,
        write_training_shards,
    )
    from lsdm_motogp_data_integration_spark.sources import read_table

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n_chars")
    )
    man = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["ids_fingerprint"])
        for r in shard_manifest(
            d, "doc_id", n_shards=4, token_col="n_chars"
        ).collect()
    }
    assert len(man) == 4
    assert sum(v[0] for v in man.values()) == d.count()

    # invariant under physical layout
    man2 = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["ids_fingerprint"])
        for r in shard_manifest(
            d.repartition(13), "doc_id", n_shards=4, token_col="n_chars"
        ).collect()
    }
    assert man == man2

    # recompute over the actual written shards
    out = str(tmp_path / "shards")
    write_training_shards(d, out, "doc_id", n_shards=4)
    back = spark.read.parquet(out)
    re_man = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["ids_fingerprint"])
        for r in back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_tokens"),
            F.bit_xor(F.xxhash64(F.col("doc_id"))).alias(
                "ids_fingerprint"
            ),
        )
        .collect()
    }
    assert re_man == man

    # a substituted id flips the fingerprint
    tweaked = d.withColumn(
        "doc_id",
        F.when(F.col("doc_id") == 0, F.lit(999999)).otherwise(
            F.col("doc_id")
        ),
    )
    man3 = {
        r["shard"]: r["ids_fingerprint"]
        for r in shard_manifest(tweaked, "doc_id", n_shards=4).collect()
    }
    assert man3 != {k: v[2] for k, v in man.items()}
