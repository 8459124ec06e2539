"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings
(AQE, Arrow, UTC, shuffle-partition sizing) are what we would ship to a real
multi-executor cluster via spark-submit --conf.
"""

from __future__ import annotations

import os
from contextlib import contextmanager as _contextmanager

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "feature_extractor_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are scale-oriented: AQE on (runtime coalesce + skew-join
    splitting), Arrow transfer on for the pandas-UDF stages, UTC session
    timezone so cyclical datetime features are reproducible anywhere.
    """
    # Make the package importable inside Python workers regardless of the
    # driver's cwd — the local-mode analog of shipping the package with
    # ``spark-submit --py-files`` (workers inherit PYTHONPATH from the
    # driver process in local mode).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )

    # One BLAS thread per Python worker: with N workers per machine, letting
    # each numpy call spawn N BLAS threads oversubscribes N^2-fold and makes
    # the Arrow UDF stage SLOWER at higher parallelism (measured: local[32]
    # lost to local[8] before this). Parallelism belongs to Spark tasks.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # 4x cores: enough granularity for AQE to balance skewed stages
        # (it coalesces the excess); 1x cores left stragglers pinning wall
        # time to the slowest partition.
        shuffle_partitions = max(cores * 4, 32)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # shuffle spill dir: a single spinning /tmp disk caps every shuffle
        # stage at its write bandwidth regardless of cores (measured: the
        # as-of+window stage was wall-flat from 8 to 32 cores). tmpfs
        # removes the artifact in this single-box sandbox; real executors
        # have local NVMe. Override with SPARK_LOCAL_DIRS.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"),
        )
        # ParallelGC: this engine's hot stages allocate big short-lived
        # arrays (window frames, Arrow batches); G1 degraded REPEATED runs
        # up to 6x (old-gen growth -> concurrent cycles); throughput GC
        # keeps them flat (measured 21.9s -> 3.6s on the as-of stage).
        .config(
            "spark.driver.extraJavaOptions",
            "-Duser.timezone=UTC -XX:+UseParallelGC",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-Duser.timezone=UTC -XX:+UseParallelGC",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@_contextmanager
def restore_conf(spark: SparkSession, key: str, value: str):
    """Set a session conf key for the duration of a block, then restore the
    previous value (or unset). Use around writes that need e.g. dynamic
    partition-overwrite so the mode does not leak into the shared session,
    where a later static ``mode("overwrite").partitionBy(...)`` write would
    silently preserve stale partitions."""
    try:
        prev = spark.conf.get(key, None)
    except Exception:
        prev = None
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
