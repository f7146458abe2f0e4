"""Table maintenance: small-file compaction.

The lakehouse housekeeping op a 100 TB pipeline needs between runs:
streaming sinks and fine-grained partitioned writes accumulate small
files; reads then pay per-file open costs and tiny row groups. This
rewrites a parquet location into ~``target_file_bytes`` files,
preserving Hive-style partition columns.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _tree_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` with files sized toward ``target_file_bytes``.

    ``cluster_by`` additionally range-partitions and sorts rows by the
    given columns, giving each output file a disjoint value range —
    parquet min/max (zone-map) stats then prune whole files/row-groups
    for selective scans on those columns (the plain-parquet equivalent
    of a table format's OPTIMIZE ... ZORDER for the 1-column case).

    Returns the chosen output file count. Writes to ``<path>__compact``
    then swaps, so a failed rewrite never corrupts the source.
    """
    total = _tree_bytes(spark, path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact"
    if cluster_by:
        df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    else:
        df = df.repartition(n_files)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    fs = Path(path).getFileSystem(conf)
    fs.delete(Path(path), True)
    fs.rename(Path(tmp), Path(path))
    return n_files
