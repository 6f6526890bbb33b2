"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "lyssandra_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build a local SparkSession tuned for the engine.

    - AQE on (runtime coalesce, skew-join splitting)
    - Arrow on (all Python crossings are Arrow-batched)
    - UTC session timezone (timestamps are logical clocks, never local time)
    - shuffle partitions sized to cores (not the 200 default)
    """
    # CRITICAL in local mode: Python workers inherit the DRIVER env (the
    # spark.executorEnv.* settings below only apply on a real cluster).
    # Without this, every worker's OpenBLAS spawns <ncores> threads ->
    # n_workers * ncores runnable threads and catastrophic oversubscription.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cores}]"
    shuffle = shuffle_partitions or max(int(cores) * 2, 8)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # single-threaded BLAS in Python workers: no oversubscription, and
        # deterministic kernel numerics across parallelism levels
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
