"""Time-series regularization: resampling onto a fixed grid with
forward fill.

The reference's capability class includes arbitrary per-record
subprocess transforms (SURVEY.md §2-B); gap-filling a time series is
the canonical one that looks imperative but is pure relational algebra
on Spark: bucket → per-key spine (sequence+explode) → left join →
last(ignorenulls) window. No UDFs, no driver loops; every step is
whole-stage-codegen relational ops.

Scale shape: the spine is |keys| × |grid| rows — generated
distributed (explode of a per-key sequence), never on the driver.
Three keyed exchanges total (bucket agg on (key, bucket); spine agg
and the fill join/window on key), each over data already reduced to
one row per (key, bucket) — the raw-event scan aggregates before any
wide grid exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_UNIT_INTERVAL = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 1 week",
    "month": "interval 1 month",
}


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    unit: str = "hour",
    agg: Column | None = None,
) -> DataFrame:
    """Resample ``value_col`` onto a regular per-``unit`` grid per key,
    forward-filling buckets with no observations.

    Returns (key, bucket, v, v_filled): ``v`` is the bucket's aggregate
    (NULL where the key had no events in that bucket), ``v_filled`` the
    last non-null aggregate at or before the bucket. The grid spans each
    key's own [min, max] observed range — keys don't pay for the global
    time span.
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    step = _UNIT_INTERVAL[unit]
    agg = agg if agg is not None else F.round(F.sum(value_col), 2)

    b = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
        )
        .agg(agg.alias("v"))
    )
    spine = (
        b.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(F.sequence("lo", "hi", F.expr(step))).alias("bucket"),
        )
    )
    w = Window.partitionBy("key").orderBy("bucket")
    return spine.join(b, ["key", "bucket"], "left").select(
        "key",
        "bucket",
        "v",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
    )


def interpolate_linear(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    unit: str = "hour",
    agg: Column | None = None,
) -> DataFrame:
    """Resample onto a per-``unit`` grid per key, linearly interpolating
    buckets with no observations from the surrounding observed buckets.

    Returns (key, bucket, v, v_interp): ``v`` as in :func:`resample_ffill`;
    ``v_interp`` is time-weighted between the last observed bucket at or
    before and the first at or after (falling back to the nearest single
    side at the edges). Same plan skeleton as resample_ffill — spine +
    left join — plus two window passes over the same (key, bucket)
    partitioning (one ascending, one descending), so Catalyst plans one
    extra in-partition sort, not a new shuffle. Both frames are
    *cumulative* ([unboundedPreceding, current] over asc and desc
    order): Spark evaluates running frames in O(n) per partition,
    whereas the naive ``rowsBetween(0, unboundedFollowing)`` frame for
    "next observation" re-aggregates the partition suffix for every row
    (O(n^2) per key — a measured 13x slowdown at 720 buckets/key, and a
    scale-killer for multi-year hourly keys). All arithmetic is
    double-precision on epoch seconds with a fixed evaluation order so
    results are bit-reproducible across engines.
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    step = _UNIT_INTERVAL[unit]
    agg = agg if agg is not None else F.round(F.sum(value_col), 2)

    b = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
    ).agg(agg.alias("v"))
    spine = (
        b.groupBy("key")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "key",
            F.explode(F.sequence("lo", "hi", F.expr(step))).alias("bucket"),
        )
    )
    grid = spine.join(b, ["key", "bucket"], "left")
    order = Window.partitionBy("key").orderBy("bucket")
    w_prev = order.rowsBetween(Window.unboundedPreceding, 0)
    # "First observation at or after this row" = "last observation at or
    # before this row when scanning backwards": a reverse-ordered
    # cumulative frame. Running frames are O(n) per partition; the
    # forward-looking rowsBetween(0, unboundedFollowing) spelling is
    # O(n^2) (UnboundedFollowingWindowFunctionFrame re-aggregates the
    # suffix per row) and is banned package-wide by
    # tests/test_skew_stress.py.
    w_next = Window.partitionBy("key").orderBy(
        F.col("bucket").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    obs = F.when(
        F.col("v").isNotNull(),
        F.struct(F.col("bucket").cast("double").alias("t"), F.col("v").alias("val")),
    )
    with_ends = grid.select(
        "key",
        "bucket",
        "v",
        F.col("bucket").cast("double").alias("t"),
        F.last(obs, ignorenulls=True).over(w_prev).alias("p"),
        F.last(obs, ignorenulls=True).over(w_next).alias("n"),
    )
    interp = F.col("p.val") + (F.col("n.val") - F.col("p.val")) * (
        (F.col("t") - F.col("p.t")) / (F.col("n.t") - F.col("p.t"))
    )
    return with_ends.select(
        "key",
        "bucket",
        "v",
        F.when(F.col("p").isNull(), F.col("n.val"))
        .when(F.col("n").isNull(), F.col("p.val"))
        .when(F.col("n.t") > F.col("p.t"), interp)
        .otherwise(F.col("p.val"))
        .alias("v_interp"),
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    unit: str = "hour",
    window: int = 12,
) -> DataFrame:
    """Exponentially-weighted moving average over the last ``window``
    observed buckets per key (half-life = one bucket, so the j-th
    newest bucket weighs 2^-j).

    EWMA looks inherently sequential (y_t = αx_t + (1-α)y_{t-1}) but a
    finite-window form is pure relational algebra: one bucket
    aggregation, then a single (key, bucket) window collecting the
    frame into an array and folding it with higher-order functions —
    no UDFs, no per-key iteration, one shuffle total. Weights 2^-j are
    exact binary powers and the fold order is fixed (strict left
    fold), so results are bit-reproducible across engines.

    Returns (key, bucket, v, ewma_v).
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")

    b = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
    ).agg(F.round(F.sum(value_col), 2).alias("v"))
    w = Window.partitionBy("key").orderBy("bucket").rowsBetween(-(window - 1), 0)
    vals = F.collect_list("v").over(w)
    with_frame = b.select("key", "bucket", "v", vals.alias("__vals"))
    n = F.size(F.col("__vals"))
    weighted = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.element_at(F.col("__vals"), i)
        * F.pow(F.lit(0.5), (n - i).cast("double")),
    )
    weights = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.pow(F.lit(0.5), (n - i).cast("double")),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return with_frame.select(
        "key", "bucket", "v", (fold(weighted) / fold(weights)).alias("ewma_v")
    )


def zscore_anomalies(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    unit: str = "hour",
    window: int = 12,
    threshold: float = 3.0,
    min_history: int = 4,
) -> DataFrame:
    """Trailing-window z-score anomaly detection per key: each bucket's
    aggregate is scored against the PRECEDING ``window-1`` buckets'
    mean/stddev (self-excluded, so a spike can't mask itself).

    Variance comes from windowed sum/sum² with one fixed expression —
    cross-engine reproducible — with denominators clamped for the
    short frames that ``min_history`` hides anyway. One window sort,
    three frame aggregates sharing it. Returns
    (key, bucket, v, z, is_anomaly).
    """
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unit must be one of {sorted(_UNIT_INTERVAL)}")
    b = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
    ).agg(F.round(F.sum(value_col), 2).alias("v"))
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-(window - 1), -1)
    )
    f = b.select(
        "key",
        "bucket",
        "v",
        F.count("*").over(w).alias("n"),
        F.round(F.sum("v").over(w), 2).alias("s"),
        F.round(F.sum(F.col("v") * F.col("v")).over(w), 4).alias("s2"),
    )
    n_c = F.greatest(F.col("n"), F.lit(1))
    mu = F.col("s") / n_c
    var = (F.col("s2") - F.col("s") * F.col("s") / n_c) / F.greatest(
        F.col("n") - 1, F.lit(1)
    )
    z = (F.col("v") - mu) / F.sqrt(var)
    history = F.col("n") >= min_history
    # a constant history has zero variance; any deviation from it is
    # infinitely many sigmas — flagged (z stays NULL, not ±inf)
    zero_var_dev = history & (var <= 0.0) & (F.col("v") != mu)
    scored = f.select(
        "key",
        "bucket",
        "v",
        F.when(history & (var > 0.0), z).alias("z"),
        zero_var_dev.alias("__zv"),
    )
    return scored.select(
        "key",
        "bucket",
        "v",
        "z",
        (
            F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False))
            | F.col("__zv")
        ).alias("is_anomaly"),
    )
