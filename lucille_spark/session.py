"""SparkSession factory with the engine's standard tuning.

Sandbox runs on local[N]; on a real cluster the same settings apply via
spark-submit conf. AQE is always on (runtime skew-join splitting + shuffle
coalescing), Arrow is on (every Python-side op in this repo is a vectorized
pandas UDF — no per-row Python, per BASELINE input_hint).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "lucille-spark", cpus: int | None = None,
              shuffle_partitions: int | None = None, **extra) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # batch-throughput GC beats G1 for shuffle-heavy single-JVM runs
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # higher-ratio shuffle compression = fewer bytes through the
        # memory-bandwidth-capped path (BENCH.md) — ~12% on the build
        .config("spark.io.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    return b.getOrCreate()
