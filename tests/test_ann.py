"""ANN: exact brute-force baseline and LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.ann import (
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from lsdm_motogp_data_integration_spark.sources import read_table


def _query_set(e):
    return e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_exact_topk_shape(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    out = cosine_topk(
        e, _query_set(e), "embedding", "vec_id", "query_id", "query_vec", k=5
    ).collect()
    assert len(out) == 25
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        sims = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rows)


def test_exact_topk_self_included_when_allowed(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    out = cosine_topk(
        e,
        _query_set(e),
        "embedding",
        "vec_id",
        "query_id",
        "query_vec",
        k=1,
        exclude_self=False,
    ).collect()
    # the nearest neighbor of a vector including itself is itself
    assert all(r["neighbor_id"] == r["query_id"] for r in out)


def test_ivf_recall_floor(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    q = _query_set(e)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(
            e, q, "embedding", "vec_id", "query_id", "query_vec", k=5
        ).collect()
    }
    approx_rows = ivf_topk(
        e, q, "embedding", "vec_id", "query_id", "query_vec",
        k=5, n_cells=8, nprobe=3,
    ).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    # random 64-dim data has weak cluster structure (Lloyd training
    # sharpens cells only marginally here); the trained, deterministic
    # codebook holds >=0.5 on this corpus — pin a 0.4 floor
    assert recall >= 0.4, f"recall {recall}"
    assert len(approx) <= len(exact)
    # determinism: same centroids, same result
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            e, q, "embedding", "vec_id", "query_id", "query_vec",
            k=5, n_cells=8, nprobe=3,
        ).collect()
    }
    assert approx == again


def test_lsh_recall_floor(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    q = _query_set(e)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(
            e, q, "embedding", "vec_id", "query_id", "query_vec", k=5
        ).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            e, q, "embedding", "vec_id", "query_id", "query_vec", k=5
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    # multi-probe 8-bit buckets on 64-dim random data: a lenient floor —
    # this asserts the machinery retrieves genuinely-near candidates,
    # not LSH theory
    assert recall >= 0.2, f"recall {recall}"
    assert len(approx) <= len(exact)
