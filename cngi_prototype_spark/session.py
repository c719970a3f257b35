"""Spark session bootstrap.

Reference parity: ``cngi/direct/framework.py:24-75`` (InitializeFramework)
starts a dask LocalCluster with worker/memory caps; here the same knobs
map onto a SparkSession builder. On a real cluster the master/executor
settings come from spark-submit; this helper only supplies sane defaults
for local work and the configs every deployment wants (AQE, Arrow, UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def initialize_framework(
    cores: int | None = None,
    memory: str | None = None,
    app_name: str = "cngi_prototype_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession configured for this engine.

    Parameters mirror ``InitializeFramework(workers, memory, ...)``
    (cngi/direct/framework.py:24): ``cores`` -> local[N] threads,
    ``memory`` -> driver memory (local mode = driver-only JVM).

    Scale notes (100 TB target):
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting
      replaces the reference's hand-tuned chunk counts (BASELINE.md shows
      6.7x vs 0.36x swings from chunk sizing alone).
    - shuffle.partitions defaults to ~cores locally; on a cluster leave it
      high and let AQE coalesce.
    - Arrow enabled for every pandas-UDF boundary.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    # local mode = driver-only JVM: Spark's 1g default OOMs dense cube
    # workloads, while oversized heaps measurably slow shuffle-heavy
    # queries via GC (ngram/dedup ~2x at 64g) — 8g is the sweet spot on
    # this 128 GiB box (override via SPARK_GRAFT_MEM)
    memory = memory or os.environ.get("SPARK_GRAFT_MEM", "8g")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    builder = builder.config("spark.driver.memory", memory)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def get_framework_client() -> SparkSession | None:
    """Return the active processing-framework client —
    ``GetFrameworkClient`` parity
    (``/root/reference/cngi/direct/framework.py:79-93`` returns the
    live dask ``Client``); here the framework is Spark, so the client
    is the active :class:`SparkSession` (``None`` when no session has
    been initialized, matching the reference's unset-scheduler case).
    """
    return SparkSession.getActiveSession()
