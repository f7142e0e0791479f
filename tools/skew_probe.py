"""Skewed-key probe (judge r4 ask #5): SCALE.md proves the heavy joins
scale linearly on UNIFORM replicas; this probe deliberately plants hot
keys and measures whether the mitigation actually engages:

1. **MinHash band-bucket skew** — a 1,000-doc near-identical cluster
   inside the 20× corpus: every doc of the cluster lands in the SAME
   band bucket in (nearly) all 16 bands, so the bucket self-join gets
   one giant key per band. AQE's skew-join split (enabled in
   ``session.get_spark``) must spread it; time_skewed vs time_uniform
   is the verdict (the skewed run also VERIFIES ~C(1000,2) extra true
   pairs, so some growth is real output, reported alongside).
2. **URL blocklist hot zone** — 50% of all rows on ONE host under the
   blocked zone. The screen's distinct-host collapse shuffles on host;
   the hot host's duplicates must die in map-side partial aggregation
   (Spark's hash aggregate combines before the exchange), keeping the
   reduce side balanced.
3. **salted_join vs plain shuffle join on a hot key** — a fact table
   whose key=0 holds 50% of rows, joined to a 1,000-row dim with
   broadcast disabled (forcing the shuffle join AQE would normally
   rescue): ``operators/skew.salted_join`` spreads the hot key over
   ``factor`` sub-keys. Row-count equality pins correctness.

Usage: python tools/skew_probe.py [replicas]  (default 20)
Emits one JSON line consumed into SCALE.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lsdm_motogp_data_integration_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from lsdm_motogp_data_integration_spark.operators.skew import salted_join
from lsdm_motogp_data_integration_spark.operators.urls import (
    filter_blocked_urls,
)
from lsdm_motogp_data_integration_spark.session import get_spark
from tools.scale_probe import scaled_docs, timed

SF_DIR = "/root/testdata/sf0.1"


def hot_cluster_docs(spark, uniform, n_hot: int):
    """Replace the first ``n_hot`` uniform docs with near-copies of one
    template: ~200 shared words + a tiny per-doc suffix, so MinHash
    signatures agree on (nearly) every band — ONE hot bucket per band."""
    template = " ".join(
        f"w{i % 97}token{(i * 7) % 53}" for i in range(200)
    )
    hot = spark.range(n_hot).select(
        (F.col("id") + 900_000_000).alias("doc_id"),
        F.concat(
            F.lit(template + " tail"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    return uniform.unionByName(hot)


def url_rows(docs, hot: bool):
    """Uniform: 997 hosts × 2 zones. Hot: 50% of rows on ONE blocked
    host (duplicate-host skew in the distinct collapse)."""
    uniform_host = F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % 997).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0, F.lit(".blocked.example")
        ).otherwise(F.lit(".clean.example")),
        F.lit("/p/"),
        F.col("doc_id").cast("string"),
    )
    if not hot:
        return docs.select("doc_id", uniform_host.alias("url"))
    hot_host = F.concat(
        F.lit("https://hot.blocked.example/p/"),
        F.col("doc_id").cast("string"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, hot_host)
        .otherwise(uniform_host)
        .alias("url"),
    )


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_hot = 1000
    spark = get_spark("skew_probe")
    spark.range(100).count()
    r: dict = {"replicas": replicas, "n_hot": n_hot}

    docs = scaled_docs(spark, replicas).localCheckpoint(eager=True)
    n_docs = docs.count()
    print(f"{replicas}x: {n_docs} docs", flush=True)
    r["n_docs"] = n_docs

    # --- 1. MinHash band-bucket skew ---
    r["minhash_uniform_s"], r["minhash_uniform_pairs"] = timed(
        "minhash_uniform",
        minhash_lsh_pairs(docs, "text", "doc_id", persist_sets=True),
    )
    skew_docs = hot_cluster_docs(spark, docs, n_hot).localCheckpoint(
        eager=True
    )
    r["minhash_hotbucket_s"], r["minhash_hotbucket_pairs"] = timed(
        "minhash_hotbucket",
        minhash_lsh_pairs(skew_docs, "text", "doc_id", persist_sets=True),
    )

    # --- 2. URL blocklist hot zone ---
    blp = spark.createDataFrame([("blocked.example",)], "pattern string")
    r["urlfilter_uniform_s"], _ = timed(
        "urlfilter_uniform",
        filter_blocked_urls(url_rows(docs, hot=False), "url", blp),
    )
    r["urlfilter_hotzone_s"], _ = timed(
        "urlfilter_hotzone",
        filter_blocked_urls(url_rows(docs, hot=True), "url", blp),
    )

    # --- 3. hot-key shuffle join: plain (AQE skew split) vs salted ---
    fact = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit(0))
        .otherwise(F.col("doc_id") % 1000)
        .cast("bigint")
        .alias("k"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("payload")
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        r["hotjoin_plain_aqe_s"], r["hotjoin_rows"] = timed(
            "hotjoin_plain_aqe", fact.join(dim, "k")
        )
        r["hotjoin_salted_s"], n_salted = timed(
            "hotjoin_salted", salted_join(fact, dim, ["k"], factor=32)
        )
        assert n_salted == r["hotjoin_rows"], (
            n_salted,
            r["hotjoin_rows"],
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)

    import os

    r["load_avg"] = list(os.getloadavg())
    print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
