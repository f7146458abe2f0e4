"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Round-robin repartition an under-partitioned DataFrame up to the
    cluster's default parallelism.

    CPU-heavy expression stages (shingling, hashing, vector math) are
    bottlenecked by input partitioning, and a small local file arrives
    as ONE partition. On a real cluster the input is already split, so
    this is a no-op there (guarded: only fires when the current
    partition count is below ``min_fraction`` of default parallelism) —
    it never adds a shuffle to an already-parallel 100 TB scan.
    """
    try:
        # classic mode: probe actual partitioning via the RDD handle
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        parts = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect exposes neither sparkContext nor df.rdd; there
        # the input comes from a real cluster source that is already
        # split, so the local-file single-partition case this guards
        # against doesn't arise — pass through unchanged.
        return df
    if parts < max(1, int(target * min_fraction)):
        return df.repartition(target)
    return df
