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
0 are dropped. avg derives from sum/count at read time.

min/max are only SEMIGROUP aggregates (no inverse), so a retraction of
the current extremum cannot be undone from a scalar — the classic IVM
boundary. ``minmax_snapshot`` / ``minmax_apply`` / ``minmax_read``
handle it the way production systems do: per group keep the k smallest
(resp. largest) live values as bounded sorted-array state. The min
stays exactly ``kept[0]`` for as long as the array is nonempty
(untracked live values are always ≥ the tracked maximum by
construction); only when k retractions drain the whole array while
live rows remain does the group go DIRTY, and the repair is a
semi-join-pruned rescan of just those groups (``base=`` fallback),
never the full table.

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



# ---------------------------------------------------------------- min/max
#
# Bounded top-k state with a validity THRESHOLD per direction. For the
# min side of column c the state is:
#   mn_<c>    — sorted array, ≤ k live values (smallest tracked)
#   mnthr_<c> — θ: every untracked live value is PROVABLY ≥ θ
#               (NULL = complete: no live value is untracked)
# min is exactly mn[0] whenever mn is nonempty and mn[0] ≤ θ — inserts
# refilling a drained array cannot masquerade as the minimum because
# they land above θ. θ only ever decreases: it is set to the smallest
# value evicted when the array overflows past k. The max side mirrors
# with mx_<c> / mxthr_<c> (untracked ≤ θ', max = mx[-1] iff mx[-1] ≥ θ').
# A group whose extremum can't be proven is DIRTY; minmax_repair
# rescans exactly those groups (semi-join pruned), never the table.


def _typed_empty(dtype: str):
    return F.expr(f"CAST(array() AS array<{dtype}>)")


def _remove_one(acc, v):
    """Remove ONE occurrence of v from sorted array acc (no-op if absent)."""
    pos = F.array_position(acc, v)
    return F.when(
        pos > 0,
        F.concat(
            F.slice(acc, F.lit(1), (pos - 1).cast("int")),
            F.slice(
                acc,
                (pos + 1).cast("int"),
                F.greatest(F.size(acc) - pos, F.lit(0)).cast("int"),
            ),
        ),
    ).otherwise(acc)


def _dirty_min(c: str):
    return (
        (F.col("__n") > 0)
        & F.col(f"mnthr_{c}").isNotNull()
        & (
            (F.size(f"mn_{c}") == 0)
            | (F.get(f"mn_{c}", F.lit(0)) > F.col(f"mnthr_{c}"))
        )
    )


def _dirty_max(c: str):
    return (
        (F.col("__n") > 0)
        & F.col(f"mxthr_{c}").isNotNull()
        & (
            (F.size(f"mx_{c}") == 0)
            | (F.get(f"mx_{c}", F.size(f"mx_{c}") - 1) < F.col(f"mxthr_{c}"))
        )
    )


def minmax_snapshot(
    df: DataFrame, keys: list[str], cols: list[str], k: int = 16
) -> DataFrame:
    """Initial min/max state from a full scan: per group and column the
    k smallest (``mn_<c>``) and k largest (``mx_<c>``) live values as
    sorted arrays, plus the validity thresholds (NULL when the group's
    non-null values all fit in k — the arrays are then complete).

    Top-k extraction is one window shuffle per column per direction —
    a snapshot-only cost; steady state is ``minmax_apply``'s
    O(|batch|) path. Nulls are excluded (min/max ignore them)."""
    from xetl_spark.operators.relational import topk_per_group

    aggs = [F.count("*").alias("__n")]
    aggs += [F.count(c).alias(f"__nn_{c}") for c in cols]
    state = df.groupBy(*keys).agg(*aggs)
    for c in cols:
        vals = df.select(*keys, c).filter(F.col(c).isNotNull())
        lo = (
            topk_per_group(vals, keys, [F.col(c).asc()], k, "__rn")
            .groupBy(*keys)
            .agg(F.array_sort(F.collect_list(c)).alias(f"mn_{c}"))
        )
        hi = (
            topk_per_group(vals, keys, [F.col(c).desc()], k, "__rn")
            .groupBy(*keys)
            .agg(F.array_sort(F.collect_list(c)).alias(f"mx_{c}"))
        )
        dtype = dict(df.dtypes)[c]
        overflowed = F.col(f"__nn_{c}") > k
        state = (
            state.join(lo, list(keys), "left")
            .join(hi, list(keys), "left")
            .withColumn(f"mn_{c}", F.coalesce(f"mn_{c}", _typed_empty(dtype)))
            .withColumn(f"mx_{c}", F.coalesce(f"mx_{c}", _typed_empty(dtype)))
            # conservative-but-safe θ: untracked values are ≥ the k-th
            # smallest (= max of mn) / ≤ the k-th largest (= min of mx)
            .withColumn(
                f"mnthr_{c}",
                F.when(overflowed, F.get(f"mn_{c}", F.size(f"mn_{c}") - 1)),
            )
            .withColumn(f"mxthr_{c}", F.when(overflowed, F.get(f"mx_{c}", F.lit(0))))
            .drop(f"__nn_{c}")
        )
    return state


def minmax_apply(
    state: DataFrame,
    batch: DataFrame,
    keys: list[str],
    cols: list[str],
    weight_col: str | None = None,
    k: int = 16,
    base: DataFrame | None = None,
    recompute_threshold: int | None = None,
) -> DataFrame:
    """Fold a change batch into min/max state (insert weight +1,
    retract -1, as in ivm_apply).

    Inserts merge into the kept arrays; overflow past k evicts from
    the far end and lowers (resp. raises) the threshold to the evicted
    value, keeping the untracked-bound invariant. Each retraction
    removes one occurrence from the arrays if tracked; an untracked
    retraction is a provable no-op on the extremes (its value lies
    beyond the threshold). A group whose extremum can no longer be
    proven (array drained, or refilled only by inserts beyond the
    threshold) is DIRTY. Pass ``base`` (the post-batch full base
    table) to repair in the same call via a semi-join-pruned rescan of
    just the dirty groups — O(dirty-group rows), never a full rescan.

    LARGE deltas take the recompute path, not the fold (r13 — the sf1
    scaling leg caught the old always-fold at a 125k-row group delta:
    the per-retraction array peel is O(|batch-group|²) interpreted
    HOF work, ~10 min on one task). A group whose batch exceeds
    ``recompute_threshold`` rows (default ``max(64, 8*k)``) skips
    array folding entirely — its count delta still applies, its
    arrays empty, and it is marked DIRTY so the same-call ``base``
    repair (or a later ``minmax_repair``) rebuilds it exactly; until
    then it reads as NULL extremes, the documented dirty contract.
    This is the textbook IVM trade: incremental folding only pays
    when |delta| is small relative to the group, and a delta this
    large costs the same as the pruned rescan anyway.

    Per-batch cost: one keyed shuffle of ~|batch| rows + the state
    merge join; all array surgery is per-row Catalyst higher-order
    expressions over arrays bounded by k + recompute_threshold."""
    if recompute_threshold is None:
        recompute_threshold = max(64, 8 * k)
    w = F.col(weight_col) if weight_col else F.lit(1)
    dtypes = dict(batch.dtypes)
    # pass 1: per-group counts + scalar extremes (cheap aggs, no
    # arrays) — decides which groups fold vs recompute, and supplies a
    # typed non-null threshold seed for brand-new big groups
    cnt_aggs = [F.sum(w).alias("__dn"), F.count(F.lit(1)).alias("__bn")]
    for c in cols:
        cnt_aggs.append(F.min(c).alias(f"__bmn_{c}"))
        cnt_aggs.append(F.max(c).alias(f"__bmx_{c}"))
    dn = batch.groupBy(*keys).agg(*cnt_aggs)
    big_keys = dn.filter(F.col("__bn") > recompute_threshold).select(*keys)
    small = batch.join(F.broadcast(big_keys), list(keys), "left_anti")
    aggs = []
    for c in cols:
        aggs.append(
            F.array_sort(F.collect_list(F.when(w > 0, F.col(c)))).alias(f"__i_{c}")
        )
        aggs.append(F.collect_list(F.when(w < 0, F.col(c))).alias(f"__r_{c}"))
    delta = dn.join(small.groupBy(*keys).agg(*aggs), list(keys), "left")
    merged = state.join(delta, list(keys), "full_outer")
    n_new = (
        F.coalesce(F.col("__n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
    ).alias("__n")
    out_cols = [*keys, n_new]
    big = F.coalesce(
        F.col("__bn") > recompute_threshold, F.lit(False)
    )
    for c in cols:
        empty = _typed_empty(dtypes[c])
        ins = F.coalesce(F.col(f"__i_{c}"), empty)
        ret = F.coalesce(F.col(f"__r_{c}"), empty)
        # aggregate(ret, cand, remove_one): peel one occurrence per retraction
        mn_cand = F.array_sort(F.concat(F.coalesce(F.col(f"mn_{c}"), empty), ins))
        mx_cand = F.array_sort(F.concat(F.coalesce(F.col(f"mx_{c}"), empty), ins))
        mn_after = F.aggregate(ret, mn_cand, _remove_one)
        mx_after = F.aggregate(ret, mx_cand, _remove_one)
        # overflow is PER SIDE: the two kept arrays are different
        # multisets (k smallest vs k largest), so a retraction can be a
        # no-op on one side only and their sizes diverge — a shared
        # flag silently evicted values past an un-raised threshold
        # (review-confirmed wrong-extreme repro)
        mn_overflow = F.size(mn_after) > k
        mx_overflow = F.size(mx_after) > k
        # smallest value evicted off the min array / largest off the max
        mn_evict = F.get(mn_after, F.lit(k))
        mx_evict = F.get(mx_after, F.size(mx_after) - k - 1)
        # recompute-path groups: arrays drop, and the threshold must
        # bound EVERY newly-untracked value — the old threshold (old
        # untracked), the formerly-tracked extreme (mn[0] / mx[-1]),
        # AND the batch extreme. coalesce here (first non-null) kept
        # the OLD threshold when the big batch inserted values beyond
        # it, so a later small insert inside the stale bound read the
        # group CLEAN with a wrong extreme — and repair only rescans
        # dirty groups, making the corruption permanent.
        # least/greatest skip nulls, so an all-null group still keeps
        # a null threshold and correctly reads NULL-extreme, not dirty.
        big_mnthr = F.least(
            F.col(f"mnthr_{c}"), F.get(f"mn_{c}", F.lit(0)),
            F.col(f"__bmn_{c}"),
        )
        big_mxthr = F.greatest(
            F.col(f"mxthr_{c}"),
            F.get(f"mx_{c}", F.size(f"mx_{c}") - 1),
            F.col(f"__bmx_{c}"),
        )
        out_cols.append(
            F.when(big, empty)
            .otherwise(F.slice(mn_after, 1, k))
            .alias(f"mn_{c}")
        )
        out_cols.append(
            F.when(big, empty)
            .otherwise(
                F.slice(
                    mx_after,
                    F.greatest(F.size(mx_after) - k + 1, F.lit(1)).cast("int"),
                    F.lit(k),
                )
            )
            .alias(f"mx_{c}")
        )
        out_cols.append(
            F.when(big, big_mnthr)
            .when(mn_overflow, F.least(F.coalesce(F.col(f"mnthr_{c}"), mn_evict), mn_evict))
            .otherwise(F.col(f"mnthr_{c}"))
            .alias(f"mnthr_{c}")
        )
        out_cols.append(
            F.when(big, big_mxthr)
            .when(mx_overflow, F.greatest(F.coalesce(F.col(f"mxthr_{c}"), mx_evict), mx_evict))
            .otherwise(F.col(f"mxthr_{c}"))
            .alias(f"mxthr_{c}")
        )
    new_state = merged.select(*out_cols).filter(F.col("__n") != 0)
    if base is not None:
        new_state = minmax_repair(new_state, base, keys, cols, k)
    return new_state


def minmax_repair(
    state: DataFrame,
    base: DataFrame,
    keys: list[str],
    cols: list[str],
    k: int = 16,
) -> DataFrame:
    """Rebuild the kept arrays + thresholds of DIRTY groups from
    ``base`` — the recompute-on-eviction fallback. The rescan is
    pruned to dirty groups via a broadcast semi-join (dirty sets are
    tiny: a group only drains after k+ retractions of its tracked
    extremes)."""
    any_dirty = None
    for c in cols:
        d = _dirty_min(c) | _dirty_max(c)
        any_dirty = d if any_dirty is None else (any_dirty | d)
    dirty_keys = state.filter(any_dirty).select(*keys)
    suffixes = ("mn", "mx", "mnthr", "mxthr")
    fresh = minmax_snapshot(
        base.join(F.broadcast(dirty_keys), list(keys), "semi"), keys, cols, k
    ).select(
        *keys,
        F.lit(True).alias("__f_hit"),
        *[
            F.col(f"{s}_{c}").alias(f"__f_{s}_{c}")
            for c in cols
            for s in suffixes
        ],
    )
    out = state.join(F.broadcast(fresh), list(keys), "left")
    # one select so every replacement sees the PRE-repair dirty
    # predicate (sequential withColumns would overwrite mn first and
    # flip the predicate before the sibling columns are patched)
    repl = {}
    for c in cols:
        d = (_dirty_min(c) | _dirty_max(c)) & F.col("__f_hit").isNotNull()
        for s in suffixes:
            name = f"{s}_{c}"
            repl[name] = F.when(d, F.col(f"__f_{name}")).otherwise(F.col(name))
    return out.select(
        *[repl[n].alias(n) if n in repl else n for n in state.columns]
    )


def minmax_read(state: DataFrame, cols: list[str]) -> DataFrame:
    """Read view: (keys..., n, min_<c>, max_<c>, dirty_<c>). An extreme
    is NULL while its side is dirty (repair pending) or the group's
    values are all null."""
    out = state
    for c in cols:
        dmn, dmx = _dirty_min(c), _dirty_max(c)
        out = (
            out.withColumn(f"min_{c}", F.when(~dmn, F.get(f"mn_{c}", F.lit(0))))
            .withColumn(
                f"max_{c}",
                F.when(~dmx, F.get(f"mx_{c}", F.size(f"mx_{c}") - 1)),
            )
            .withColumn(f"dirty_{c}", dmn | dmx)
            .drop(f"mn_{c}", f"mx_{c}", f"mnthr_{c}", f"mxthr_{c}")
        )
    return out.withColumnRenamed("__n", "n")
