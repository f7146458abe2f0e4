"""Table maintenance: small-file compaction.

The lakehouse housekeeping op a 100 TB pipeline needs between runs:
streaming sinks and fine-grained partitioned writes accumulate small
files; reads then pay per-file open costs and tiny row groups. This
rewrites a parquet location into ~``target_file_bytes`` files,
preserving Hive-style partition columns.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _tree_bytes(spark: SparkSession, path: str) -> int:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return fs.getContentSummary(p).getLength()


def compact_hive_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict[str, int]:
    """Selectively compact a Hive-partitioned location, one partition
    directory at a time.

    Only partitions with ≥ ``min_files`` data files are rewritten — an
    incremental maintenance pass touches just the directories a
    streaming sink or fine-grained writer actually fragmented, instead
    of rewriting the whole table (on a 100 TB table, almost all
    partitions are already compacted and cold). The partition column
    itself lives in the directory name, so per-directory rewrites
    preserve it untouched. Returns {partition_dir: output_file_count}
    for the rewritten partitions.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    Path = jvm.org.apache.hadoop.fs.Path
    root = Path(path)
    fs = root.getFileSystem(conf)
    done: dict[str, int] = {}
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if "=" not in name:  # not a hive partition dir (_centroids etc.)
            continue
        n_files = sum(
            1
            for f in fs.listStatus(st.getPath())
            if f.isFile() and f.getPath().getName().startswith("part-")
        )
        if n_files < min_files:
            continue
        sub = st.getPath().toString()
        done[name] = compact_parquet(
            spark,
            sub,
            target_file_bytes=target_file_bytes,
            cluster_by=cluster_by,
            zorder_by=zorder_by,
        )
    return done


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 6
) -> Column:
    """Z-order (Morton) key over ``cols`` as a pure Column expression.

    Each column is mapped to a ``2^bits_per_col``-bucket rank via
    approx-quantile boundaries (an O(1)-driver sketch pass — adapts to
    skew, unlike uniform width_bucket), then the bucket ids' bits are
    interleaved so that sorting by the key clusters rows close in EVERY
    dimension at once. Single-column sort gives perfect zone maps on
    one column and none on the others; the z-key trades a little of
    each for locality on all of them.

    The boundary lookup is ``size(filter(boundaries, b -> b <= x))``
    over a literal array (≤ 2^bits elements) — JVM-side, codegen-able,
    no UDF; NULLs sort to bucket 0.
    """
    n_buckets = 1 << bits_per_col
    bucket_cols = []
    for c in cols:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = df.approxQuantile(c, probs, 0.01)
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        dc = F.col(c).cast("double")
        bucket = F.when(
            dc.isNull(), F.lit(0)
        ).otherwise(F.size(F.filter(barr, lambda b: b <= dc)))
        bucket_cols.append(bucket)
    k = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits_per_col):
        for j, b in enumerate(bucket_cols):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, i * k + j)
    return z


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` with files sized toward ``target_file_bytes``.

    ``cluster_by`` additionally range-partitions and sorts rows by the
    given columns, giving each output file a disjoint value range —
    parquet min/max (zone-map) stats then prune whole files/row-groups
    for selective scans on those columns (the plain-parquet equivalent
    of a table format's OPTIMIZE ... ZORDER for the 1-column case).

    ``zorder_by`` (mutually exclusive with cluster_by) clusters on the
    interleaved multi-column z-key instead, so selective scans on ANY
    of the named columns prune files — the plain-parquet OPTIMIZE
    ZORDER.

    Returns the chosen output file count. Writes to ``<path>__compact``
    then swaps, so a failed rewrite never corrupts the source.
    """
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    total = _tree_bytes(spark, path)
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compact"
    if cluster_by:
        df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
            *cluster_by
        )
    elif zorder_by:
        z = zorder_key(df, zorder_by)
        df = (
            df.withColumn("__z", z)
            .repartitionByRange(n_files, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
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
