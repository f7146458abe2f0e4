"""Core relational composites that Spark lacks as single primitives.

Reference parity: the xETL reference delegates record-level work to
arbitrary subprocesses (SURVEY.md §2-B); these are the canonical
re-expressions as DataFrame transforms.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Deterministic `dropDuplicates(subset)`: keep the first row per key
    under an explicit total order.

    Spark's built-in ``dropDuplicates([cols])`` keeps an *arbitrary* row —
    unacceptable for reproducible pipelines. One shuffle on ``keys``; at
    scale this is a single hash partitioning, same cost class as the
    built-in but deterministic. ``order_by`` must be a total order within
    each key group (include a unique tiebreaker).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number window.

    Catalyst/Tungsten evaluates this as a single shuffle + per-partition
    sort; AQE handles group skew. ``order_by`` should include a unique
    tiebreaker for determinism.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def deterministic_sample(
    df: DataFrame, key_cols: Sequence[str], rate_pct: int, salt: str = ""
) -> DataFrame:
    """Content-addressed sample: keep rows whose md5(key) falls in the
    lowest ``rate_pct`` percent of hash space.

    Unlike ``df.sample`` (seeded per-partition RNG, not stable across
    partitionings/engines) this is reproducible anywhere — including in a
    SQL oracle — and it pushes down as a plain filter expression.

    Rate granularity is 1/256 (first md5 byte compared lexicographically
    against ``rate_pct``/100 of hash space): a hex-prefix comparison is
    expressible identically in any SQL dialect.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    threshold = format(round(256 * rate_pct / 100), "02x")
    return df.filter(
        F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 2) < F.lit(threshold)
    )


def weighted_sample(
    df: DataFrame, weight_col: str, key_cols: Sequence[str], scale: int, salt: str = ""
) -> DataFrame:
    """Deterministic weighted Bernoulli sample: keep each row with
    probability min(1, weight/scale), decided by md5(key) — importance
    sampling (e.g. quality- or length-weighted corpus selection) that
    is reproducible across runs, partitionings, and engines.

    The inclusion test is pure 64-bit integer arithmetic
    (hash32 · scale < weight · 2³²), so a SQL oracle reproduces it
    bit-for-bit — no float thresholds that could flip rows at ties.
    Pushes down as a plain filter over a scan: no shuffle, no RNG
    state, trivially correct under retries/speculative execution
    (the same row always draws the same coin).
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 8), 16, 10).cast(
        "bigint"
    )
    return df.filter(
        h * F.lit(int(scale))
        < F.col(weight_col).cast("bigint") * F.lit(1 << 32)
    )


def train_test_split(
    df: DataFrame,
    key_cols: Sequence[str],
    test_pct: int = 10,
    split_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Deterministic, content-addressed train/test assignment.

    Same md5-prefix scheme as deterministic_sample: the assignment is a
    pure function of the row key, so it is stable across engines, runs,
    partitionings, and incremental appends — the property a training
    pipeline needs to guarantee no test-set leakage over time.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    threshold = format(round(256 * test_pct / 100), "02x")
    return df.withColumn(
        split_col,
        F.when(
            F.substring(F.md5(F.concat(key, F.lit(salt))), 1, 2) < F.lit(threshold),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def stratified_split(
    df: DataFrame,
    strata_cols: Sequence[str],
    key_cols: Sequence[str],
    test_pct: int = 20,
    split_col: str = "split",
) -> DataFrame:
    """Stratified train/test split with EXACT per-stratum proportions.

    train_test_split's pure per-row hashing drifts from the target
    fraction on small strata (binomial noise); here each stratum is
    ranked by content hash and the first ceil(test_pct%) of rows go to
    test — deterministic (hash order, key tiebreak), exact per
    stratum, and one window over the stratum partitioning (a stratum's
    rows shuffle to their stratum — the same partitioning any
    per-stratum aggregation needs).
    """
    from pyspark.sql import Window

    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    # hash materialized as a column: a sort EXPRESSION in the window
    # ordering is re-evaluated by the sort comparator per comparison
    # (measured 4x slower at 200k rows); a column is hashed once per row
    hcol = f"__{split_col}_h"
    w = Window.partitionBy(*strata_cols).orderBy(hcol, *key_cols)
    cnt = F.count("*").over(Window.partitionBy(*strata_cols))
    rn = F.row_number().over(w)
    return (
        df.withColumn(hcol, F.md5(key))
        .withColumn(
            split_col,
            F.when(rn <= F.ceil(cnt * test_pct / 100.0), F.lit("test")).otherwise(
                F.lit("train")
            ),
        )
        .drop(hcol)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: spread each hot left key over
    ``salt_buckets`` shuffle partitions by salting the key, replicating
    the (smaller) right side across all buckets.

    The salt is derived deterministically (xxhash64 of the whole left
    row) so results are reproducible. Use when one side has pathological
    key skew that AQE's skew-join split can't fix (e.g. a single key
    holding >25% of rows); otherwise prefer plain join + AQE.
    Supported joins: inner/left (right side is replicated, so right/full
    semantics would double-count unmatched right rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l_salted = left.withColumn("__salt", salt)
    r_salted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_salted, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization: new session when the gap to the previous
    event (per user) exceeds ``gap_seconds``.

    Classic lag + cumulative-sum window pair — two window functions over
    the *same* (partition, order), so Catalyst plans exactly one shuffle
    and one sort. The streaming twin is ``session_window`` (see
    xetl_spark.streaming).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap = F.col(ts_col).cast("double") - prev_ts.cast("double")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
