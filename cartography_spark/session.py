"""SparkSession factory with scale-aware defaults.

Local sandbox runs use ``local[N]``; the same configuration block is what we
would submit with ``spark-submit --py-files cartography_spark.zip`` on a real
multi-executor cluster — only ``master`` and the memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "cartography_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Scale posture:
      * AQE on — runtime coalescing, broadcast conversion, and skew-join
        splitting (hot tenants are the reference's known skew axis: one AWS
        account can own most of the graph).
      * shuffle partitions sized to parallelism, not the 200 default.
      * Arrow on — every Python-side operator in this engine is a vectorized
        pandas UDF (no per-row Python anywhere in the hot path).
      * UTC session timezone so DuckDB oracle comparisons are stable.
    """
    # Parallelism belongs to Spark tasks, not to BLAS: a multi-threaded
    # OpenBLAS/MKL inside every Python worker oversubscribes the cores
    # (measured: the 60-query cosine kernel ANTI-scales 4->16 threads
    # without this).  Must be set before the JVM/worker processes spawn.
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        try:
            n = int(master.split("[")[1].rstrip("]*")) if "[" in master else 32
        except ValueError:
            n = 32
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
