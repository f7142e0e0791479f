"""SparkSession factory.

The reference executes as one JVM with one thread per Kettle step and
bounded 10k-row queues between steps (``motogp.ktr:413,417``).  We replace
that with Spark's data-parallel execution: the session below is tuned for
``local[N]`` testing but every knob is chosen so the same code scales to a
multi-executor cluster (AQE, skew-join handling, broadcast thresholds,
Arrow-based Python interop).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lsdm_motogp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Local defaults: ``local[$SPARK_GRAFT_CPUS]`` (fallback ``local[*]``),
    shuffle partitions ~= cores (not the 200 default, which
    over-parallelizes small data and under-parallelizes 100 TB — at
    cluster scale callers pass an explicit value sized to input volume).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # SPARK_GRAFT_CPUS='*' is a valid master URL but not a
        # partition count — fall back to the machine's cores
        shuffle_partitions = (
            int(cpus)
            if cpus and cpus.isdigit()
            else (os.cpu_count() or 8)
        )

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # local mode = driver-only: this is THE memory knob (the 1g
        # default causes GC thrash on wide array/pandas operators)
        .config("spark.driver.memory", driver_mem)
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Deterministic oracle comparison: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for all pandas interop (pandas_udf, applyInPandas, toPandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.ui.explainMode", "formatted")
        .config("spark.ui.enabled", "false")
        # managed (e.g. bucketed) tables land outside the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/spark-warehouse")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
