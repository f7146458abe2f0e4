"""As-of and range joins — time-series joins Spark has no primitive for.

The as-of join uses the union + last(ignorenulls) window composition:
one shuffle on the join keys, one per-partition sort — the same cost
shape as a sort-merge join, fully distributed, no pandas/driver path.
(pandas merge_asof via applyInPandas would force grouped materialization
of each key's full history in Python memory; at 100 TB the window form
wins on both memory and serde.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    direction: str = "backward",
    allow_exact: bool = True,
    tolerance: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row at
    or before (``backward``) / at or after (``forward``) its timestamp,
    matching on equi-keys ``on``.

    Implementation: tag and union both sides, window over
    (keys, ts, side-tag) with ``last(payload, ignorenulls=True)`` across
    the unbounded preceding frame, then keep left rows. ``forward``
    reuses the same machinery on negated timestamps.

    ``tolerance`` (seconds, pandas merge_asof parity): matches further
    than the tolerance from the left timestamp are nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)

    ts_expr_l = F.col(left_ts)
    ts_expr_r = F.col(right_ts)
    if direction == "forward":
        # negate: "nearest at-or-after" == backward on reversed time axis
        ts_expr_l = -ts_expr_l.cast("double")
        ts_expr_r = -ts_expr_r.cast("double")

    lcols = left.columns
    l = left.select(
        *lcols,
        ts_expr_l.alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}") for p in right_payload],
        F.lit(None).cast("double").alias("__p_mts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        ts_expr_r.alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(p).alias(f"__p_{p}") for p in right_payload],
        ts_expr_r.cast("double").alias("__p_mts"),
    ).select(*lcols, "__ts", "__side", *[f"__p_{p}" for p in right_payload], "__p_mts")

    # Right rows sort before left rows at equal ts iff exact matches count.
    side_order = F.col("__side").asc() if allow_exact else F.col("__side").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l.unionByName(r)
    filled = unioned.select(
        *lcols,
        "__ts",
        "__side",
        *[
            F.last(F.col(f"__p_{p}"), ignorenulls=True).over(w).alias(f"{p}{suffix}")
            for p in right_payload
        ],
        F.last(F.col("__p_mts"), ignorenulls=True).over(w).alias("__mts"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        within = (
            F.abs(F.col("__ts").cast("double") - F.col("__mts")) <= F.lit(tolerance)
        )
        for p in right_payload:
            out = out.withColumn(
                f"{p}{suffix}",
                F.when(within, F.col(f"{p}{suffix}")).otherwise(
                    F.lit(None).cast(right.schema[p].dataType)
                ),
            )
    return out.drop("__side", "__ts", "__mts")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | None,
    condition: Column,
) -> DataFrame:
    """Interval/range join: equi-keys (optional) plus a band condition.

    With equi-keys Catalyst plans a sort-merge/shuffled-hash join on the
    keys and post-filters the band — the scalable path. Without keys it
    degrades to broadcast-nested-loop; callers must ensure one side is
    broadcastable in that case.
    """
    if on:
        joined = left.join(right, on=list(on), how="inner").where(condition)
    else:
        joined = left.join(right, on=condition, how="inner")
    return joined
