"""CDC folding: MERGE-style upsert and SCD2 history — emulated with
anti-join + union + windows (no Delta/Iceberg jars in this
environment; with a table format present the same call sites map to
MERGE INTO).

Scale notes: both operators are a single shuffle on the merge key.
``merge_upsert`` is the idempotent batch-upsert primitive; ``scd2``
folds a change batch into a type-2 dimension (validity intervals,
current-row flag).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """MERGE semantics: rows in ``updates`` replace same-key rows in
    ``target``; new keys are inserted; unmatched target rows pass
    through.

    If ``updates`` can carry several rows per key, pass ``order_by`` to
    pick the winner deterministically (last under the order wins).
    """
    upd = updates
    if order_by is not None:
        w = Window.partitionBy(*keys).orderBy(*[
            c.desc() if isinstance(c, Column) else F.col(c).desc() for c in order_by
        ])
        upd = (
            upd.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    untouched = target.join(upd.select(*keys), on=list(keys), how="left_anti")
    return untouched.unionByName(upd.select(*target.columns))


def scd2(
    current: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    compare_cols: Sequence[str],
    end_col: str = "valid_to",
    start_col: str = "valid_from",
    current_col: str = "is_current",
) -> DataFrame:
    """Fold a change batch into a slowly-changing-dimension type 2
    history table.

    ``current`` rows carry (start_col, end_col, current_col); a change
    with different ``compare_cols`` closes the open row (end = change
    ts) and opens a new current row. Unchanged keys pass through.
    One shuffle on ``keys``.
    """
    ch = changes.select(
        *keys, F.col(ts_col).alias("__chg_ts"), *[F.col(c).alias(f"__new_{c}") for c in compare_cols]
    )
    joined = current.join(ch, on=list(keys), how="left")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    affected = F.col("__chg_ts").isNotNull() & F.col(current_col) & differs

    # close the open row at the change timestamp
    closed = (
        joined.filter(affected)
        .withColumn(end_col, F.col("__chg_ts"))
        .withColumn(current_col, F.lit(False))
        .select(*current.columns)
    )
    # open the replacement row
    opened = (
        joined.filter(affected)
        .withColumn(start_col, F.col("__chg_ts"))
        .withColumn(end_col, F.lit(None).cast(current.schema[end_col].dataType))
        .withColumn(current_col, F.lit(True))
        .select(
            *[
                F.col(f"__new_{c}").alias(c) if c in compare_cols else F.col(c)
                for c in current.columns
            ]
        )
    )
    untouched = joined.filter(~F.coalesce(affected, F.lit(False))).select(*current.columns)
    return untouched.unionByName(closed).unionByName(opened)


def latest_snapshot(spark, path: str) -> tuple[DataFrame | None, int]:
    """Newest versioned snapshot under ``path`` (dirs named v=N).
    Returns (DataFrame | None, version); version is -1 when empty."""
    import os
    import re

    if not os.path.isdir(path):
        return None, -1
    versions = sorted(
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.fullmatch(r"v=(\d+)", d))
    )
    if not versions:
        return None, -1
    v = versions[-1]
    return spark.read.parquet(os.path.join(path, f"v={v}")), v


def stream_cdc_fold(
    stream_df: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> int:
    """Fold a CDC stream into versioned snapshots: each micro-batch
    writes snapshot v=N+1 = keep-latest-per-key over (previous snapshot
    ∪ batch), latest decided by ``order_by`` DESC (include a unique
    tiebreaker).

    The fold step is associative and commutative over row sets, so the
    result is independent of how the stream is split into batches — the
    property that makes CDC folding correct under retries and file-
    source reordering. Versioned directories are the dependency-free
    stand-in for a table format: immutable snapshots, readers pick the
    max version, old versions remain queryable (poor man's time
    travel); with Delta/Iceberg present this call site becomes MERGE
    INTO on a real table. Returns the number of micro-batches folded.
    """
    import os

    from xetl_spark.operators.relational import dedup_keep_first

    batches: list[int] = []

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batches.append(batch_id)
        prev, v = latest_snapshot(spark, path)
        allrows = (
            prev.unionByName(batch_df.select(*prev.columns))
            if prev is not None
            else batch_df
        )
        folded = dedup_keep_first(
            allrows, list(keys), [F.col(c).desc() for c in order_by]
        )
        folded.write.mode("overwrite").parquet(os.path.join(path, f"v={v + 1}"))

    q = stream_df.writeStream.outputMode("append").foreachBatch(fold).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return len(batches)


def vacuum_snapshots(path: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` versioned snapshots under
    ``path`` (the VACUUM of the poor man's table format —
    stream_cdc_fold's v=N directories). Returns the removed versions."""
    import os
    import re
    import shutil

    if not os.path.isdir(path):
        return []
    versions = sorted(
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.fullmatch(r"v=(\d+)", d))
    )
    drop = versions[:-keep_last] if keep_last > 0 else versions
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v={v}"))
    return drop


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data extraction between two table versions: one row per
    changed key with op ∈ {insert, delete, update} — the inverse of
    MERGE, and what downstream consumers (IVM rollups, search indexes,
    caches) need to stay fresh without rescanning either version.

    One key-co-partitioned full-outer join; change detection compares
    the non-key column structs (or ``compare_cols``) null-safely.
    Emits the NEW image for inserts/updates and the OLD image for
    deletes, plus the op tag. At 100 TB both sides are key-partitioned
    parquet, so the join is the only shuffle and pruning/pushdown act
    on both scans.
    """
    cols = compare_cols or [c for c in new.columns if c not in keys]
    o = old.select(*keys, F.struct(*[old[c] for c in cols]).alias("__o"))
    n = new.select(*keys, F.struct(*[new[c] for c in cols]).alias("__n"))
    joined = o.join(n, on=keys, how="full_outer")
    op = (
        F.when(F.col("__o").isNull(), F.lit("insert"))
        .when(F.col("__n").isNull(), F.lit("delete"))
        .when(~F.col("__o").eqNullSafe(F.col("__n")), F.lit("update"))
    )
    image = F.coalesce(F.col("__n"), F.col("__o"))
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select("op", *keys, *[image[c].alias(c) for c in cols])
    )


def apply_deletion_vectors(
    base: DataFrame, dv: DataFrame, broadcast_dv: bool = True
) -> DataFrame:
    """Delta-style POSITIONAL deletion vectors: soft-delete rows of an
    immutable parquet table without rewriting data files.

    ``base`` must carry the reader-provided identity columns
    ``__file`` / ``__pos`` (from the parquet reader's ``_metadata``
    hidden struct — see ``read_with_position``); ``dv`` is the
    deletion-vector table (file string, pos long), one row per deleted
    position. Alive rows = one LEFT ANTI join on (file, position).

    Scale shape: DVs are tiny relative to the base table (they encode
    deletions since the last rewrite), so the anti-join broadcasts the
    DV side by default — zero shuffle on the base scan; set
    ``broadcast_dv=False`` for pathological DV sizes and the anti-join
    shuffles both sides on the uniform (file, pos) key instead."""
    d = dv.select(F.col("file").alias("__f_d"), F.col("pos").alias("__p_d"))
    if broadcast_dv:
        d = F.broadcast(d)
    return (
        base.join(
            d,
            on=[
                base["__file"] == d["__f_d"],
                base["__pos"] == d["__p_d"],
            ],
            how="left_anti",
        )
        .drop("__file", "__pos")
    )


def read_with_position(spark, path: str) -> DataFrame:
    """Parquet scan that exposes each row's physical identity —
    (``__file``, ``__pos``) from Spark's ``_metadata.file_path`` /
    ``_metadata.row_index`` hidden columns — the coordinates
    deletion vectors address rows by."""
    df = spark.read.parquet(path)
    return df.select(
        "*",
        F.col("_metadata.file_path").alias("__file"),
        F.col("_metadata.row_index").alias("__pos"),
    )
