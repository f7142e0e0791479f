"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
driver collect cost). One warm-up of the session (tiny action) excludes
JVM startup from per-query numbers; total includes query time only.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from lsdm_motogp_data_integration_spark.session import get_spark

HEADLINE = [
    "q01_pricing_summary",
    "q05_join_suite",
    "q09_position_counts_multiway",
    "q11_standings",
    "q13_surrogate_key",
    "q17_fuzzy_best_match",
    "q19_neardup_pairs_suite",
    "q21_simhash_neardup",
    "q26_ann_suite",
    "q27_embedding_neardup",
    "q28_event_time_suite",
    "q30_topk_per_group",
    "q36_asof_join",
    "q38_grouped_zscore",
    "q63_boilerplate_lines",
    "q64_bm25",
    "q67_span_dedup",
]
# q57/q66 (bloom decontamination, DSIR) are driver-checked for
# correctness and scale-probed in SCALE.md (0.14 / 0.31 time-over-data at
# 20x) but stay out of the headline set: each runs TWO suite scopes and
# q66's oracle-portable md5-60 feature hash is deliberately not the
# production hash, so benching them would measure the verification
# configuration, not the engine.


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")
    # warm up JVM / session / parquet-reader codegen (excluded from
    # timings — one-time engine costs, not query costs); region is the
    # smallest table, so no measured query's data is pre-cached
    spark.range(1000).count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    # spawn the Arrow Python worker pool once (shared by all
    # pandas-UDF queries; reused workers are the steady-state)
    from pyspark.sql import functions as F

    from lsdm_motogp_data_integration_spark.functions.similarity import (
        jaro_winkler_udf,
    )

    spark.range(512).repartition(64).select(
        jaro_winkler_udf(F.lit("a"), F.lit("b"))
    ).count()

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        runs = []
        # four runs per query: run 1 pays plan analysis + codegen
        # compile, later runs are the steady state a repeated workload
        # sees; report the best, keep cold numbers for transparency.
        # min-of-4 rides out this host's noisy co-tenants (SCALE.md:
        # load spikes to 30+ land multi-second stalls on random
        # queries; with 3 runs a stall pair still poisoned the min
        # roughly once per session)
        for _ in range(4):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        cold[name] = runs[0]
        timings[name] = min(runs)
        # release anything this query persisted (persist_sets/
        # persist_tokens/...) so later queries aren't measured under
        # the accumulated cache pressure of earlier ones — same hygiene
        # as tools/scale_probe.py. Within the 3 runs the cache is live,
        # so the hot number still reflects the persisted steady state.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_runtime_hot",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
