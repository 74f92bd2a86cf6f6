"""Partitioning helpers shared by compute-heavy operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_partitions(df: DataFrame) -> DataFrame:
    """Round-robin repartition to at least ``defaultParallelism``.

    A small parquet file is one scan split no matter what
    ``maxPartitionBytes`` says, so every narrow stage before the first
    exchange (explodes, hashing, per-row kernels, broadcast-join probes)
    runs on ONE core.  Compute-heavy pipelines pay a tiny shuffle of the
    raw rows up front to engage the whole executor set; at scale, inputs
    already have >= parallelism splits and this is a no-op (never
    repartitions DOWN).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
