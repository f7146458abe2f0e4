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
