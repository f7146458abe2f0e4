"""Streaming semantics: batch-vs-stream equivalence (the operators are
written once against generic DataFrames), watermark late-data handling,
stateful dedup."""

import time

from pyspark.sql import functions as F

from xetl_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    watermarked_dedup,
)


def _batch_events(spark, sf_dir):
    from xetl_spark.queries import load

    (events,) = load(spark, sf_dir, "events")
    return events


def _rows(df, keys):
    return sorted(tuple(r[k] for k in keys) for r in df.collect())


def test_tumbling_batch_equals_stream(spark, sf_dir):
    batch = tumbling_window_agg(_batch_events(spark, sf_dir))
    stream = run_stream_to_memory(
        tumbling_window_agg(read_events_stream(spark, sf_dir)), mode="complete"
    )
    cols = ["win_start_us", "win_end_us", "event_type", "n", "total"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_session_batch_equals_stream(spark, sf_dir):
    batch = session_window_agg(_batch_events(spark, sf_dir))
    stream = run_stream_to_memory(
        session_window_agg(read_events_stream(spark, sf_dir)), mode="complete"
    )
    cols = ["user_id", "sess_start_us", "sess_end_us", "n_events", "total"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_sliding_batch_equals_stream(spark, sf_dir):
    batch = sliding_window_agg(_batch_events(spark, sf_dir))
    stream = run_stream_to_memory(
        sliding_window_agg(read_events_stream(spark, sf_dir)), mode="complete"
    )
    cols = ["win_start_us", "win_end_us", "n", "total"]
    assert _rows(batch, cols) == _rows(stream, cols)


def test_streaming_dedup_drops_duplicates(spark, tmp_path):
    """Duplicate event_ids across micro-batches are dropped within the
    watermark (dropDuplicatesWithinWatermark)."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
    ]
    dup_rows = rows + [rows[0]]  # replay event_id=1
    src = tmp_path / "stream_src"
    spark.createDataFrame(
        [(i, ts, u, t, v, p) for (i, ts, u, t, v, p) in dup_rows],
        "event_id long, ts_s string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, props string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = watermarked_dedup(stream)
    out = run_stream_to_memory(
        deduped.groupBy("event_id").agg(F.count("*").alias("n")), mode="complete"
    )
    got = {r.event_id: r.n for r in out.collect()}
    assert got == {1: 1, 2: 1}


def test_watermark_late_data_dropped(spark, tmp_path):
    """Events older than watermark delay behind the max seen ts must be
    excluded from closed windows (append mode)."""
    src = tmp_path / "late_src"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).coalesce(1).write.mode("append").parquet(str(src))

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    write_batch("b1", [(1, ts(0), 1, "click", 1.0, "{}"), (2, ts(200), 1, "click", 1.0, "{}")])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
    )
    name = "late_test_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # late replay: event at t0+1min, far behind watermark (t0+190)
        write_batch("b2", [(3, ts(1), 1, "click", 1.0, "{}")])
        q.processAllAvailable()
        time.sleep(0.2)
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table(name).collect()
    first_window_counts = [
        r.n for r in out if r.window.start.minute == 0 and r.window.start.hour == 0
    ]
    # the late event must NOT be double-counted into the closed window
    assert first_window_counts == [1]


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-band condition
    equals the equivalent batch join."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    rows = [
        (1, t0, 7, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 7, "purchase", 9.0, "{}"),
        (3, t0 + dt.timedelta(hours=5), 7, "purchase", 5.0, "{}"),  # too late for click 1
        (4, t0 + dt.timedelta(minutes=1), 8, "purchase", 2.0, "{}"),  # no click for user 8
    ]
    src = tmp_path / "ss_src"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(str(src))

    def streams():
        s = spark.readStream.schema(schema).parquet(str(src))
        clicks = (
            s.filter(F.col("event_type") == "click")
            .select("user_id", F.col("ts").alias("c_ts"))
            .withWatermark("c_ts", "10 minutes")
        )
        purchases = (
            s.filter(F.col("event_type") == "purchase")
            .select("event_id", "user_id", F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "10 minutes")
        )
        return purchases.join(
            clicks,
            (purchases.user_id == clicks.user_id)
            & (purchases.p_ts >= clicks.c_ts)
            & (purchases.p_ts <= clicks.c_ts + F.expr("INTERVAL 1 HOUR")),
            "inner",
        ).select("event_id", purchases.user_id.alias("user_id"))

    got = run_stream_to_memory(streams(), mode="append")
    assert sorted((r.event_id, r.user_id) for r in got.collect()) == [(2, 7)]


def test_stream_static_join(spark, sf_dir):
    """Streaming fact joined to a static (broadcast) dimension — the
    enrichment pattern; result equals the batch join."""
    from xetl_spark.queries import load

    dim = spark.createDataFrame(
        [(i, f"cohort_{i % 3}") for i in range(200)], "user_id long, cohort string"
    )
    stream = read_events_stream(spark, sf_dir)
    enriched = (
        stream.join(F.broadcast(dim), "user_id")
        .groupBy("cohort")
        .agg(F.count("*").alias("n"))
    )
    got = {r.cohort: r.n for r in run_stream_to_memory(enriched, mode="complete").collect()}
    (events,) = load(spark, sf_dir, "events")
    want = {
        r.cohort: r.n
        for r in events.join(dim, "user_id").groupBy("cohort").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_watermark_exact_late_row_accounting(spark, tmp_path):
    """Pin EXACTLY which out-of-order rows a watermark drops.

    Batch 1 (max ts = minute 30 → watermark after batch = minute 20):
      minutes 0, 2, 7, 30 — all on time.
    Batch 2, against watermark 20:
      minute  3 → below watermark, its window [0,5) already closed: DROPPED
      minute 16 → below watermark (window [15,20) never opens):      DROPPED
      minute 25 → out-of-order but ABOVE watermark:                  COUNTED
      minute 50 → advances the watermark to 40.
    Batch 3: minute 60 (trigger fuel; advances watermark to 50).

    Final append-mode output must therefore be exactly
    [0,5)=2, [5,10)=1, [25,30)=1, [30,35)=1 — no [15,20) window, no
    recount of minute 3, and [50,55)/[60,65) still open (absent).
    """
    import datetime as dt

    src = tmp_path / "late_exact_src"
    src.mkdir()
    t0 = dt.datetime(2024, 3, 1)

    def write_batch(rows):
        spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=m), 1, "e", 1.0, "{}") for i, m in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("append").parquet(str(src))

    write_batch([(1, 0), (2, 2), (3, 7), (4, 30)])

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_exact_sink")
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch([(5, 3), (6, 16), (7, 25), (8, 50)])
        q.processAllAvailable()
        write_batch([(9, 60)])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.window.start - t0).total_seconds() // 60: r.n
        for r in spark.table("late_exact_sink").collect()
    }
    assert got == {0.0: 2, 5.0: 1, 25.0: 1, 30.0: 1}


def test_replay_datasource_drains_file_deterministically(spark, sf_dir, tmp_path):
    """xetl_replay streams a parquet file through real micro-batches:
    AvailableNow drains exactly the file's rows, no batch exceeds
    rows_per_batch, and the streamed content equals the batch read."""
    from xetl_spark.sources.replay import register_replay_datasource

    register_replay_datasource(spark)
    path = f"{sf_dir}/events.parquet"
    batches = []

    def grab(df, batch_id):
        batches.append((batch_id, df.count(), {r.event_id for r in df.select("event_id").collect()}))

    q = (
        spark.readStream.format("xetl_replay")
        .option("path", path)
        .option("rows_per_batch", 700)
        .load()
        .writeStream.foreachBatch(grab)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(180)

    expected = spark.read.parquet(path)
    n_expected = expected.count()
    streamed_ids = set().union(*(ids for _b, _n, ids in batches))
    assert sum(n for _b, n, _ids in batches) == n_expected
    assert streamed_ids == {r.event_id for r in expected.select("event_id").collect()}


def test_replay_stream_maintains_ivm_rollup(spark, sf_dir, tmp_path):
    """Backfill-as-a-stream + IVM: replaying events through foreachBatch
    with ivm_apply maintains the count/sum-by-type rollup incrementally
    (O(batch) per micro-batch, no base rescan) and converges to exactly
    the batch aggregate."""
    from pyspark.sql import functions as F

    from xetl_spark.operators.ivm import agg_snapshot, ivm_apply, ivm_read
    from xetl_spark.sources.replay import register_replay_datasource

    register_replay_datasource(spark)
    path = f"{sf_dir}/events.parquet"
    empty = spark.createDataFrame([], "event_type string, value double")
    holder = {"state": agg_snapshot(empty, ["event_type"], ["value"])}

    def fold(batch_df, batch_id):
        state = ivm_apply(
            holder["state"], batch_df.select("event_type", "value"),
            ["event_type"], ["value"],
        )
        # pin each micro-batch's result so the lineage doesn't grow
        # unboundedly across batches (same discipline as iterative algs)
        holder["state"] = state.localCheckpoint()

    q = (
        spark.readStream.format("xetl_replay")
        .option("path", path)
        .option("rows_per_batch", 900)
        .load()
        .writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_ivm"))
        .start()
    )
    q.awaitTermination(180)

    got = {
        r.event_type: (r.n, round(r.sum_value, 4))
        for r in ivm_read(holder["state"], ["value"]).collect()
    }
    want = {
        r.event_type: (r.n, round(r.s, 4))
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-3


def test_replay_datasource_requires_path(spark):
    from pyspark.sql.utils import AnalysisException

    from xetl_spark.sources.replay import register_replay_datasource

    register_replay_datasource(spark)
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        spark.readStream.format("xetl_replay").load().writeStream.format(
            "noop"
        ).trigger(availableNow=True).start()
    assert "path" in str(ei.value)


def test_replay_offsets_deterministic_across_runs(spark, sf_dir, tmp_path):
    """Two independent replays of the same file with the same
    rows_per_batch produce identical batch boundaries and contents —
    the offset determinism that exactly-once recovery rests on."""
    from xetl_spark.sources.replay import register_replay_datasource

    register_replay_datasource(spark)
    path = f"{sf_dir}/events.parquet"

    def drain(ck):
        seen = []

        def grab(df, bid):
            ids = sorted(r.event_id for r in df.select("event_id").collect())
            seen.append((bid, len(ids), ids[0] if ids else None, ids[-1] if ids else None))

        q = (
            spark.readStream.format("xetl_replay")
            .option("path", path)
            .option("rows_per_batch", 800)
            .load()
            .writeStream.foreachBatch(grab)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / ck))
            .start()
        )
        q.awaitTermination(120)
        return seen

    assert drain("ck_a") == drain("ck_b")


def test_replay_row_group_pruning_multi_group(spark, tmp_path):
    """A file written with many small row groups replays to exactly the
    batch content with slice boundaries that straddle group boundaries
    — pins the footer-metadata row-group pruning path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xetl_spark.sources.replay import register_replay_datasource
    from xetl_spark.streaming import run_stream_to_memory

    path = str(tmp_path / "multi.parquet")
    tbl = pa.table({"i": list(range(1000)), "s": [f"r{i}" for i in range(1000)]})
    pq.write_table(tbl, path, row_group_size=37)  # 28 groups
    assert pq.ParquetFile(path).metadata.num_row_groups > 20

    register_replay_datasource(spark)
    stream = (
        spark.readStream.format("xetl_replay")
        .option("path", path)
        .option("rows_per_batch", 113)  # co-prime with 37: straddles groups
        .load()
    )
    got = run_stream_to_memory(stream, mode="append")
    assert sorted(map(tuple, got.collect())) == [(i, f"r{i}") for i in range(1000)]


def test_replay_checkpoint_resume_exactly_once(spark, tmp_path):
    """A checkpointed stream killed mid-replay resumes from its
    committed offset and the sink ends up with exactly the file's rows
    — no duplicates, no gaps (exactly-once via offset determinism +
    idempotent micro-batch commits)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xetl_spark.sources.replay import register_replay_datasource

    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({"i": list(range(5000))}), src, row_group_size=500)
    register_replay_datasource(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def start():
        return (
            spark.readStream.format("xetl_replay")
            .option("path", src)
            .option("rows_per_batch", 250)
            .option("rows_per_trigger", 500)  # 10 micro-batches
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    # let a few micro-batches commit, then kill mid-stream
    deadline = time.time() + 60
    while time.time() < deadline:
        p = q.lastProgress
        if p and p["batchId"] >= 3:
            break
        time.sleep(0.2)
    q.stop()
    partial = spark.read.parquet(sink).count()
    assert 0 < partial < 5000, partial  # genuinely interrupted mid-replay

    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    got = sorted(r.i for r in spark.read.parquet(sink).collect())
    assert got == list(range(5000))  # exactly once: no dupes, no gaps


def test_replay_reader_offset_monotone_across_restart(tmp_path):
    """Unit contract for the pacing cursor (regression: with
    rows_per_trigger set, a checkpoint-restarted reader started at
    cursor=0, so latestOffset could return an offset BELOW the
    committed one; Spark's new-data check is inequality, so the
    'backwards' batch rolled the commit log back and re-emitted
    committed rows). The engine contract (same one pyspark's
    _SimpleStreamReaderWrapper relies on) is that on ANY restart the
    last offset-log batch is replanned via partitions() before the
    first latestOffset poll — so partitions()/commit() re-learning
    keeps the paced offset at/above the committed one. NOTE:
    latestOffset may be polled BEFORE initialOffset on a fresh start,
    so pacing must work with no initialOffset call at all."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xetl_spark.sources.replay import ReplayStreamReader

    src = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({"i": list(range(2000))}), src, row_group_size=100)
    opts = {"path": src, "rows_per_batch": 100, "rows_per_trigger": 500}

    # fresh start, engine polls latestOffset first: paced from 0
    fresh = ReplayStreamReader(opts)
    assert fresh.latestOffset() == {"row": 500}
    assert fresh.latestOffset() == {"row": 1000}

    # restart: the engine replans the last offset-log batch FIRST;
    # partitions() re-learns the cursor from its end, so the next poll
    # is paced from the committed position, never below it
    restarted = ReplayStreamReader(opts)
    restarted.partitions({"row": 1000}, {"row": 1500})
    assert restarted.latestOffset() == {"row": 2000}  # min(n, 1500+500)

    # commit() also raises the cursor (restart where commit replays)
    c = ReplayStreamReader(opts)
    c.commit({"row": 1200})
    assert c.latestOffset() == {"row": 1700}


def test_replay_restart_after_complete_emits_nothing(spark, tmp_path):
    """E2E: re-starting a fully-drained checkpointed paced replay adds
    zero rows — the committed offset is never rolled back."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xetl_spark.sources.replay import register_replay_datasource

    src = str(tmp_path / "src.parquet")
    pq.write_table(pa.table({"i": list(range(1500))}), src, row_group_size=250)
    register_replay_datasource(spark)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        # NOT availableNow: that snapshots ONE paced latestOffset at
        # start and stops there; processAllAvailable keeps polling
        # until the paced cursor reaches the file end
        q = (
            spark.readStream.format("xetl_replay")
            .option("path", src)
            .option("rows_per_batch", 250)
            .option("rows_per_trigger", 500)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(r.i for r in spark.read.parquet(sink).collect()) == list(range(1500))
    run_once()  # second run restores the checkpoint: nothing new to emit
    assert sorted(r.i for r in spark.read.parquet(sink).collect()) == list(range(1500))


def test_observe_metrics_api(spark, sf_dir):
    """df.observe() accumulates in-query metrics without a second scan
    — the hook run reports would use for per-stage custom counters."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("stats")
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum("o_totalprice").alias("total"),
    ).filter(F.col("o_totalprice") > 0)
    n = out.count()
    assert obs.get["rows"] == df.count() and obs.get["rows"] >= n
    assert obs.get["total"] > 0


def test_rocksdb_state_store_equivalence(spark, sf_dir):
    """The same stateful query under RocksDBStateStoreProvider (the
    production backend once state outgrows executor heap) produces
    exactly the default-provider results; the provider override is
    scoped to the query and the session conf is restored."""
    from xetl_spark.streaming import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_window_agg,
    )

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)

    def rows(**kw):
        out = run_stream_to_memory(
            tumbling_window_agg(read_events_stream(spark, sf_dir)),
            mode="complete",
            **kw,
        )
        return sorted(map(tuple, out.collect()))

    default = rows(state_partitions=4)
    rocks = rows(state_partitions=4, state_store="rocksdb")
    assert rocks == default and len(rocks) > 0
    assert spark.conf.get(key, None) == before
    import pytest as _pytest

    with _pytest.raises(ValueError, match="state_store"):
        rows(state_store="bogus")
