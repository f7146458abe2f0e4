"""Incremental view maintenance for distributive grouped aggregates.

Maintains ``SELECT keys, count(*), sum(col)... GROUP BY keys`` as a
materialized state table that is updated from change batches WITHOUT
rescanning the base data — the O(|batch|) path that keeps a 100 TB
rollup fresh when the base grows by gigabytes a day (a nightly
recompute rescans everything; this touches only the delta).

Semantics: each batch row is an insert (weight +1) or a retraction
(weight -1, e.g. from a CDC delete). Counts and sums are maintained
exactly under both because they are ABELIAN-GROUP aggregates (have
inverses): state ⊕ Σ(weight·x). Groups whose maintained count reaches
0 are dropped. avg derives from sum/count at read time. min/max are
deliberately NOT offered here: they are only semigroup aggregates (no
inverse), so a retraction of the current extremum forces a per-group
rescan — the classic IVM boundary, documented rather than hidden.

Plan shape per update: aggregate the batch by key (map-side partial →
one keyed shuffle of ~|batch| rows), then a key-co-partitioned
full-outer merge with the state table. State size = live group count,
independent of history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_snapshot(df: DataFrame, keys: list[str], sum_cols: list[str]) -> DataFrame:
    """Initial state: (keys..., __n, sum_<c>...) from a full scan."""
    aggs = [F.count("*").alias("__n")] + [
        F.sum(c).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def ivm_apply(
    state: DataFrame,
    batch: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    weight_col: str | None = None,
) -> DataFrame:
    """Fold a change batch into the aggregate state.

    ``weight_col`` (int, +1 insert / -1 retract) defaults to
    all-inserts when None. Returns the new state, with zero-count
    groups removed. Retracting rows that were never inserted is the
    caller's contract violation (counts would go negative — surfaced,
    not silently clamped, so reconciliation jobs can detect drift).
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    delta = batch.groupBy(*keys).agg(
        F.sum(w).alias("__dn"),
        *[F.sum(F.col(c) * w).alias(f"__d_{c}") for c in sum_cols],
    )
    merged = state.join(delta, on=keys, how="full_outer")
    out_cols = [*keys, (F.coalesce(F.col("__n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))).alias("__n")]
    for c in sum_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
        )
    return merged.select(*out_cols).filter(F.col("__n") != 0)


def ivm_read(state: DataFrame, sum_cols: list[str]) -> DataFrame:
    """Read view over the state: renders count, sums, and derived avgs."""
    out = state.withColumnRenamed("__n", "n")
    for c in sum_cols:
        out = out.withColumn(f"avg_{c}", F.col(f"sum_{c}") / F.col("n"))
    return out
