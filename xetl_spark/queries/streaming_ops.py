"""Streaming + event-time windowing inventory.

True-streaming entries execute a real Structured Streaming query over
the finite events fixture (memory sink, processAllAvailable) so the
driver exercises the streaming engine itself; their results equal the
batch plans by construction (asserted in tests/test_streaming.py), and
where the semantics are SQL-expressible they also carry DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.operators import sessionize
from xetl_spark.queries import load, query
from xetl_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    running_totals_stateful,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    watermarked_dedup,
)


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT epoch_us(time_bucket(INTERVAL 1 HOUR, ts))                        AS win_start_us,
           epoch_us(time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR)     AS win_end_us,
           event_type,
           count(*)            AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h windows per event_type — executed as a REAL streaming
    query (readStream → watermark → window agg → memory sink)."""
    stream = read_events_stream(spark, sf_dir)
    # state = (1h window × event_type) — a few hundred keys: 8 state
    # partitions instead of the session's input-sized 32 cuts per-batch
    # state-store maintenance 4x (measured 1.46s -> 0.92s per pass at
    # sf0.1); see run_stream_to_memory's docstring for the sizing rule
    return run_stream_to_memory(
        tumbling_window_agg(stream), mode="complete", state_partitions=8
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1, 2, 3]) AS k),
         wins AS (
           SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE AS win_start,
                  value
           FROM events CROSS JOIN offs)
    SELECT epoch_us(win_start)                        AS win_start_us,
           epoch_us(win_start + INTERVAL 2 HOUR)      AS win_end_us,
           count(*)                                   AS n,
           round(sum(value), 2)                       AS total
    FROM wins GROUP BY win_start
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/30m windows (each event in 4 windows) — batch plan of
    the streaming operator (stream twin asserted equal in tests)."""
    (events,) = load(spark, sf_dir, "events")
    return sliding_window_agg(events)


@query(
    "q_stream_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    tagged AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM ordered)
    SELECT user_id,
           epoch_us(min(ts))                          AS sess_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE)     AS sess_end_us,
           count(*)                                   AS n_events,
           round(sum(value), 2)                       AS total
    FROM tagged GROUP BY user_id, session_id
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window (30-min gap) per user — batch execution of the
    streaming operator; oracle reconstructs sessions via lag/cumsum."""
    (events,) = load(spark, sf_dir, "events")
    return session_window_agg(events)


@query(
    "q_sessionize_batch",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id,
           CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM ordered
    """,
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level batch sessionization (lag + cumulative sum; one shuffle)."""
    (events,) = load(spark, sf_dir, "events")
    return sessionize(events, "user_id", "ts", 1800).select(
        "user_id", "event_id", "session_id"
    )


@query(
    "q_stream_stateful_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total
    FROM events GROUP BY user_id
    """,
)
def q_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming (applyInPandasWithState): per-user
    running totals across micro-batches; the FINAL state per key must
    equal the batch aggregate (update-mode memory sink keeps the last
    row per key — we re-aggregate with max(n) to select it)."""
    stream = read_events_stream(spark, sf_dir)
    # state keys = distinct user_id (low thousands at this SF)
    out = run_stream_to_memory(
        running_totals_stateful(stream), mode="update", state_partitions=8
    )
    # update mode appends one row per key per touched batch; the final
    # row (max n_events) is the converged state
    return (
        out.groupBy("user_id")
        .agg(
            F.max(F.struct("n_events", "total")).alias("s"),
        )
        .select("user_id", F.col("s.n_events").alias("n_events"), F.col("s.total").alias("total"))
    )


@query(
    "q_stream_dedup_watermark",
    oracle="""
    SELECT event_type, count(*) AS n FROM (
      SELECT event_type, row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
      FROM events) WHERE rn = 1
    GROUP BY event_type
    """,
)
def q_stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on event_id within the watermark, run as
    a real streaming query; aggregated so the result is deterministic
    even if duplicates existed (event_ids are unique in the fixture)."""
    stream = read_events_stream(spark, sf_dir)
    deduped = watermarked_dedup(stream)
    counted = deduped.groupBy("event_type").agg(F.count("*").alias("n"))
    # dedup state holds every event_id inside the watermark (~100k tiny
    # rows at sf0.1) — still far below the per-partition maintenance
    # crossover, so the same 8-wide state sizing applies
    return run_stream_to_memory(counted, mode="complete", state_partitions=8)


@query(
    "q_stream_dedup_store",
    oracle="""
    SELECT DISTINCT sha256(text) AS digest FROM documents
    """,
)
def q_stream_dedup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store-backed streaming dedup (streaming/stateful.py
    streaming_dedup_to_store): the documents table replayed as a REAL
    file-source stream through a foreachBatch sink that screens each
    micro-batch against a persisted sha2 digest store, appends
    survivors to a parquet output partitioned by __batch_id (dynamic
    overwrite = replay-idempotent), and appends the batch's new
    digests to the store. The result is the distinct digest set of
    the admitted rows — batch-order independent (which survivor ID
    wins depends on file pickup order; which CONTENT survives does
    not), and equal to the corpus's distinct digest set exactly when
    the screen admits each content once. Cross-RUN durability (second
    run admits nothing) is pinned in tests/test_stateful_streaming.py."""
    import shutil
    import tempfile

    (docs,) = load(spark, sf_dir, "documents")
    schema = docs.select("doc_id", "text").schema
    work = tempfile.mkdtemp(prefix="xetl_stream_dedup_")
    try:
        from xetl_spark.streaming.stateful import streaming_dedup_to_store

        # The streaming file source requires a DIRECTORY; the testdata
        # layout is one file per table, so glob-filter within sf_dir
        # (same pattern as streaming/windows.py read_events_stream).
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
            .select("doc_id", "text")
        )
        streaming_dedup_to_store(
            stream, "text", "doc_id", f"{work}/store", f"{work}/out",
            mode="exact",
        )
        return (
            spark.read.parquet(f"{work}/out")
            .select(F.sha2("text", 256).alias("digest"))
            .distinct()
            .localCheckpoint(eager=True)  # outlives the rmtree below
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
           round(p.value, 2) AS amount
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (click→purchase attribution
    within a 30-minute band) — executed as a REAL streaming query; the
    watermark + time-band bound join state on both sides, which is what
    makes an unbounded 100 TB/day join feasible. Batch equivalence
    asserted by the DuckDB oracle (inner join emits exactly the band
    matches on a finite replay)."""
    s = read_events_stream(spark, sf_dir)
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks.withColumnRenamed("user_id", "c_user"),
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "inner",
    )
    out = run_stream_to_memory(joined, mode="append")
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.unix_micros(F.col("c_ts"))).alias("click_us"),
        (F.unix_micros(F.col("p_ts"))).alias("purchase_us"),
        F.round("value", 2).alias("amount"),
    )


@query(
    "q_stream_cdc_fold",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, round(value, 2) AS value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def q_stream_cdc_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC stream folded into versioned parquet snapshots via
    foreachBatch: latest event per user survives. The fold
    (union ∪ keep-max-per-key) is associative, so the final snapshot is
    batch-split-independent — hash-matched against the batch ARGMAX
    oracle."""
    import tempfile

    from xetl_spark.operators import latest_snapshot, stream_cdc_fold

    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    table = tempfile.mkdtemp(prefix="xetl_cdcfold_") + "/t"
    stream_cdc_fold(stream, table, keys=["user_id"], order_by=["ts", "event_id"])
    final, _v = latest_snapshot(spark, table)
    return final.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round("value", 2).alias("value"),
    )


@query(
    "q_ts_resample_ffill",
    oracle="""
    WITH b AS (
      SELECT user_id AS key, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT key, unnest(generate_series(min(bucket), max(bucket),
                                         INTERVAL 1 HOUR)) AS bucket
      FROM b GROUP BY key
    )
    SELECT s.key, epoch_us(s.bucket) AS bucket_us, b.v,
           last_value(b.v IGNORE NULLS) OVER
             (PARTITION BY s.key ORDER BY s.bucket) AS v_filled
    FROM spine s LEFT JOIN b ON s.key = b.key AND s.bucket = b.bucket
    """,
)
def q_ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization: hourly per-user value sums resampled
    onto each user's own [min, max] hourly grid, gaps forward-filled —
    bucket → sequence/explode spine → left join → last(ignorenulls)
    window, all relational (operators/timeseries.py)."""
    from xetl_spark.operators import resample_ffill

    (events,) = load(spark, sf_dir, "events")
    out = resample_ffill(events, "ts", "user_id", "value", unit="hour")
    return out.select(
        "key", F.unix_micros("bucket").alias("bucket_us"), "v", "v_filled"
    )


@query(
    "q_funnel_ordered",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM events GROUP BY user_id
    )
    SELECT
      count(*) AS n_users,
      CAST(count_if(t_view IS NOT NULL) AS BIGINT) AS step_view,
      CAST(count_if(t_view IS NOT NULL AND t_click > t_view)
           AS BIGINT) AS step_click,
      CAST(count_if(t_view IS NOT NULL AND t_click > t_view
               AND t_buy > t_click) AS BIGINT) AS step_purchase
    FROM firsts
    """,
)
def q_funnel_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the events stream (view → click
    → purchase): one conditional-min aggregation per user, then step
    predicates — the canonical product-analytics query, one shuffle on
    user_id, no self-joins or window scans per step."""
    (events,) = load(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    reached_view = F.col("t_view").isNotNull()
    reached_click = reached_view & (F.col("t_click") > F.col("t_view"))
    reached_buy = reached_click & (F.col("t_buy") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.count_if(reached_view).alias("step_view"),
        F.count_if(reached_click).alias("step_click"),
        F.count_if(reached_buy).alias("step_purchase"),
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT f.cohort AS cohort_week,
           CAST(floor(date_diff('day', f.cohort,
                                date_trunc('week', e.ts)) / 7)
                AS BIGINT) AS week_offset,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-activity
    week, counted distinct per week offset — two user_id-keyed
    shuffles (first-event aggregation, join back) plus the distinct
    rollup. The classic growth-analytics rollup; joins stay
    co-partitioned on user_id at any corpus size.

    Skew note: Catalyst's distinct-aggregate rewrite already runs this
    two-phase — dedup shuffled on (cohort, offset, user_id) (uniform
    even when one mega-cohort holds most users), then per-cell merges
    of map-side partial COUNTS — so a hot cohort never funnels raw
    user rows through one reducer. Plan-asserted in
    tests/test_operators.py (two_phase_distinct_plan) with a skewed
    differential test against a manually salted rollup."""
    (events,) = load(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    joined = events.join(firsts, "user_id")
    offset = F.floor(
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
    ).cast("long")
    return (
        joined.groupBy(F.col("cohort").alias("cohort_week"), offset.alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "q_ts_rolling_extrema",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           min(value) OVER w AS min_1h,
           max(value) OVER w AS max_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_ts_rolling_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour window per user over REAL event time (RANGE
    frame on the timestamp axis, not row counts): rolling count/min/
    max — exact aggregates, so cross-engine hash-safe without float
    rounding discipline. One shuffle on user_id; the time-range frame
    runs in the sorted partition."""
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        F.min("value").over(w).alias("min_1h"),
        F.max("value").over(w).alias("max_1h"),
    )


@query("q_sketch_cms_heavy_hitters")
def q_sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the distinct event
    users (operators/sketch.py): the sketch is a ≤ depth×width counter
    table built in one bounded shuffle and broadcast back for point
    queries — per-key state never grows with cardinality, the scale
    contract exact counting can't give on an unbounded stream.
    Deterministic hashing ⇒ rerun-identical; overestimate-only and
    merge-distributivity are property-tested in
    tests/test_operators.py."""
    from xetl_spark.operators.sketch import cms_estimate, count_min_sketch

    (events,) = load(spark, sf_dir, "events")
    sketch = count_min_sketch(events, "user_id", depth=4, width=2048)
    users = events.select("user_id").distinct()
    return cms_estimate(sketch, users, "user_id", depth=4, width=2048).select(
        "user_id", "est"
    )


@query(
    "q_ts_interpolate_linear",
    oracle="""
    WITH b AS (
      SELECT user_id AS key, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT key, unnest(generate_series(min(bucket), max(bucket),
                                         INTERVAL 1 HOUR)) AS bucket
      FROM b GROUP BY key
    ), g AS (
      SELECT s.key, s.bucket, b.v, epoch(s.bucket) AS t,
             last_value(CASE WHEN b.v IS NOT NULL THEN
                 struct_pack(t := epoch(s.bucket), val := b.v) END
               IGNORE NULLS) OVER
               (PARTITION BY s.key ORDER BY s.bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             first_value(CASE WHEN b.v IS NOT NULL THEN
                 struct_pack(t := epoch(s.bucket), val := b.v) END
               IGNORE NULLS) OVER
               (PARTITION BY s.key ORDER BY s.bucket
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM spine s LEFT JOIN b ON s.key = b.key AND s.bucket = b.bucket
    )
    SELECT key, epoch_us(bucket) AS bucket_us, v,
           CASE WHEN p IS NULL THEN n.val
                WHEN n IS NULL THEN p.val
                WHEN n.t > p.t THEN
                  p.val + (n.val - p.val) * ((t - p.t) / (n.t - p.t))
                ELSE p.val END AS v_interp
    FROM g
    """,
)
def q_ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling by linear interpolation: hourly per-user sums on each
    user's own hourly grid, missing buckets time-weighted between the
    surrounding observed buckets (operators/timeseries.py
    interpolate_linear — spine join + two windows over one sort, no
    UDFs). Double arithmetic on epoch seconds with a fixed evaluation
    order, so the DuckDB oracle reproduces the values bit-for-bit."""
    from xetl_spark.operators.timeseries import interpolate_linear

    (events,) = load(spark, sf_dir, "events")
    out = interpolate_linear(events, "ts", "user_id", "value", unit="hour")
    return out.select(
        "key", F.unix_micros("bucket").alias("bucket_us"), "v", "v_interp"
    )


@query("q_sketch_bloom_membership")
def q_sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership (operators/sketch.py bloom_*): sketch the
    set of customers that placed orders as a ≤ num_bits bit-set table
    (distinct-union build — the shuffle IS the merge), broadcast it,
    and probe every customer key. No false negatives by construction;
    FP rate and merge-distributivity are property-tested in
    tests/test_operators.py. The big-data use is semi-join pruning: a
    100 TB fact scan can drop rows whose key is definitely absent
    before any shuffle, at the cost of a few KB broadcast."""
    from xetl_spark.operators.sketch import bloom_build, bloom_probe

    orders, customer = load(spark, sf_dir, "orders", "customer")
    sk = bloom_build(orders, "o_custkey", num_hashes=7, num_bits=1 << 16)
    return bloom_probe(
        sk, customer.select("c_custkey"), "c_custkey", num_hashes=7, num_bits=1 << 16
    )


@query(
    "q_ts_ewma",
    oracle="""
    WITH b AS (
      SELECT user_id AS key, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), f AS (
      SELECT key, bucket, v,
             list(v) OVER (PARTITION BY key ORDER BY bucket
                           ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS l
      FROM b
    )
    SELECT key, epoch_us(bucket) AS bucket_us, v,
           list_reduce(list_transform(range(1, len(l)+1),
               i -> l[i] * power(0.5, CAST(len(l) - i AS DOUBLE))),
               (a, x) -> a + x)
           / list_reduce(list_transform(range(1, len(l)+1),
               i -> power(0.5, CAST(len(l) - i AS DOUBLE))),
               (a, x) -> a + x) AS ewma_v
    FROM f
    """,
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (half-life = one hourly
    bucket, 12-bucket window) per user
    (operators/timeseries.py ewma). The 'sequential' recurrence becomes
    one window collect + higher-order fold — single shuffle, no UDFs;
    weights are exact binary powers and the fold order is strict-left
    on both engines, so the DuckDB oracle matches bit-for-bit."""
    from xetl_spark.operators.timeseries import ewma

    (events,) = load(spark, sf_dir, "events")
    out = ewma(events, "ts", "user_id", "value", unit="hour", window=12)
    return out.select(
        "key", F.unix_micros("bucket").alias("bucket_us"), "v", "ewma_v"
    )


@query("q_stream_sliding_distinct_hll")
def q_stream_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct users per hour, the mergeable-sketch way:
    one HLL sketch per hourly bucket (hll_sketch_agg), then
    hll_union_agg over a RANGE frame of the preceding 24 hours. Exact
    sliding distinct is the textbook non-scalable op (re-counting every
    window from raw rows); sketch-union makes the window pass O(hours ×
    sketch size) after a single scan-side aggregation — the same
    mergeability that lets 1000 executors sketch shards independently.
    Estimates are deterministic (no RNG) and within ~1% at lgK=14;
    accuracy vs exact is pinned in tests/test_operators.py."""
    (events,) = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    hourly = events.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.count("*").alias("n_events"),
    )
    w = (
        Window.orderBy(F.unix_timestamp("bucket"))
        .rangeBetween(-23 * 3600, 0)
    )
    return hourly.select(
        F.unix_micros("bucket").alias("bucket_us"),
        "n_events",
        F.hll_sketch_estimate(F.expr("hll_union_agg(sk)").over(w)).alias(
            "approx_users_24h"
        ),
    )


@query(
    "q_attribution_last_touch",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           c.click_id, c.click_ts_us
    FROM purchases p LEFT JOIN LATERAL (
      SELECT event_id AS click_id, epoch_us(ts) AS click_ts_us
      FROM clicks c
      WHERE c.user_id = p.user_id AND c.ts <= p.ts
        AND epoch(p.ts) - epoch(c.ts) <= 604800.0
      ORDER BY c.ts DESC LIMIT 1
    ) c ON TRUE
    """,
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing last-touch attribution: each purchase is credited to
    the user's most recent click within a 7-day lookback — the as-of
    join (operators/asof.py) wearing its other hat. One shuffle on
    user_id + one per-partition sort, the sort-merge cost shape; no
    per-user history ever materializes in Python."""
    from xetl_spark.operators import asof_join

    (events,) = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_ts_us"),
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="cts",
        right_payload=["click_id", "click_ts_us"],
        direction="backward",
        tolerance=604800.0,
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.unix_micros("ts").alias("purchase_ts_us"),
        F.col("click_id_asof").alias("click_id"),
        F.col("click_ts_us_asof").alias("click_ts_us"),
    )


@query(
    "q_stream_stream_left_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us,
           round(p.value, 2) AS amount
    FROM events p LEFT JOIN events c
      ON p.user_id = c.user_id AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
    WHERE p.event_type = 'purchase'
      AND p.ts <= TIMESTAMP '2024-01-15 00:00:00'
    """,
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER join — the harder streaming
    join surface: unmatched purchases must be HELD in state until the
    watermark proves no click can still arrive, then emitted with null
    click columns. The probed side is cut off well before the stream's
    end (purchases ≤ Jan 15, streams run ~a week longer) so every held
    row's watermark deadline passes inside the replay and batch
    equivalence is exact — the oracle is the plain left join. Same
    state-bounding properties as the inner variant: watermark + time
    band cap both sides' state for an unbounded run."""
    s = read_events_stream(spark, sf_dir)
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    # cutoff is applied AFTER the watermark node: the watermark must
    # track the full purchase stream's event times, or the last
    # retained row's own timestamp pins its side's watermark below its
    # eviction deadline and the final unmatched row never flushes
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", F.col("ts").alias("p_ts"), "value")
        .withWatermark("p_ts", "1 hour")
        .filter(F.col("p_ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left_outer",
    )
    out = run_stream_to_memory(joined, mode="append", drain_state=True)
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("c_ts").alias("click_us"),
        F.round("value", 2).alias("amount"),
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (Markov counts): per-user
    lag over one (user, time) sort, then a bounded-cardinality pair
    count — the building block for journey/path analysis. One shuffle
    for the window, map-side partials for the count."""
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "q_ts_anomaly_zscore",
    oracle="""
    WITH b AS (
      SELECT user_id AS key, time_bucket(INTERVAL 1 HOUR, ts) AS bucket,
             round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ), f AS (
      SELECT key, bucket, v,
             count(*) OVER w AS n,
             round(sum(v) OVER w, 2) AS s,
             round(sum(v * v) OVER w, 4) AS s2
      FROM b
      WINDOW w AS (PARTITION BY key ORDER BY bucket
                   ROWS BETWEEN 11 PRECEDING AND 1 PRECEDING)
    )
    SELECT key, bucket_us, v, z,
           coalesce(abs(z) > 3.0, FALSE) OR zv AS is_anomaly
    FROM (SELECT key, epoch_us(bucket) AS bucket_us, v,
                 CASE WHEN n >= 4 AND vr > 0.0
                      THEN (v - mu) / sqrt(vr) END AS z,
                 n >= 4 AND vr <= 0.0 AND v <> mu AS zv
          FROM (SELECT *, s / greatest(n, 1) AS mu,
                       (s2 - s * s / greatest(n, 1)) / greatest(n - 1, 1) AS vr
                FROM f))
    """,
)
def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection per key: each hourly
    bucket scored against the PRECEDING 11 buckets' mean/stddev
    (excluding itself — no self-masking). Variance is computed from
    windowed sum/sum² with one fixed expression instead of the
    engines' built-in stddev (whose summation algorithms differ in low
    bits), so z-scores are bit-identical cross-engine. One window
    sort, three frame aggregates sharing it; sqrt is IEEE
    correctly-rounded on both engines."""
    from xetl_spark.operators.timeseries import zscore_anomalies

    (events,) = load(spark, sf_dir, "events")
    out = zscore_anomalies(
        events, "ts", "user_id", "value", unit="hour", window=12,
        threshold=3.0, min_history=4,
    )
    return out.select(
        "key",
        F.unix_micros("bucket").alias("bucket_us"),
        "v",
        "z",
        "is_anomaly",
    )


@query("q_stream_neardup_ingest", oracle=None)
def q_stream_neardup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest (streaming/stateful.py streaming_minhash_dedup):
    the documents table replayed as a stream, near-dup votes emitted
    from per-LSH-bucket state via applyInPandasWithState (signatures
    only in state — the MinHash-estimator streaming twin of the batch
    operator; cross-micro-batch behavior pinned in
    tests/test_stateful_streaming.py). Aggregated to one verdict per
    flagged doc (min partner) for a deterministic result."""
    from xetl_spark.streaming.stateful import streaming_minhash_dedup

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, n_chars int")
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id", "text")
    )
    votes = streaming_minhash_dedup(stream, threshold=0.5)
    out = run_stream_to_memory(votes, mode="append")
    return (
        out.groupBy("doc")
        .agg(F.min("partner").alias("dup_of"))
        .orderBy("doc")
        .withColumnRenamed("doc", "doc_id")
    )
