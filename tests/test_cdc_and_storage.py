"""CDC operators (merge upsert, SCD2), bucketed co-located joins,
binaryFile source, rate streaming source."""

import datetime as dt

from pyspark.sql import functions as F

from xetl_spark.operators import merge_upsert, scd2


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, v string, amt double"
    )
    updates = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k long, v string, amt double"
    )
    out = {r.k: (r.v, r.amt) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_multi_row_updates_pick_latest(spark):
    target = spark.createDataFrame([(1, "old", 0)], "k long, v string, ver int")
    updates = spark.createDataFrame(
        [(1, "mid", 1), (1, "new", 2)], "k long, v string, ver int"
    )
    out = merge_upsert(target, updates, ["k"], order_by=["ver"]).collect()
    assert len(out) == 1 and out[0].v == "new"


def test_scd2_closes_and_opens_rows(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    current = spark.createDataFrame(
        [
            (1, "addr-a", t0, None, True),
            (2, "addr-b", t0, None, True),
        ],
        "k long, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    changes = spark.createDataFrame(
        [(1, "addr-a2", t1), (2, "addr-b", t1)],  # 1 changed, 2 unchanged
        "k long, addr string, ts timestamp",
    )
    out = scd2(current, changes, ["k"], "ts", ["addr"])
    rows = sorted(
        ((r.k, r.addr, r.is_current, r.valid_to) for r in out.collect())
    )
    assert rows == [
        (1, "addr-a", False, t1),   # closed history row
        (1, "addr-a2", True, None), # new current row
        (2, "addr-b", True, None),  # untouched
    ]


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """bucketBy co-location: a join between two tables bucketed on the
    same key plans WITHOUT shuffle exchanges (the 100 TB co-located
    join strategy)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a previous session's in-memory catalog leaves orphan files behind
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode(
        "overwrite"
    ).saveAsTable("b_orders")
    li.withColumnRenamed("l_orderkey", "o_orderkey").write.bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").mode("overwrite").saveAsTable("b_lineitem")
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    n = joined.count()
    assert n == li.count()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_binary_file_source(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "a.bin").write_bytes(b"hello world")
    (d / "b.bin").write_bytes(b"\x00\x01\x02")
    df = spark.read.format("binaryFile").load(str(d))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert bytes(rows["a.bin"].content) == b"hello world"
    assert rows["b.bin"].length == 3


def test_rate_source_smoke(spark):
    """The built-in rate streaming source produces monotonically
    timestamped rows (sanity for stream wiring without files)."""
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 100).load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .start()
    )
    try:
        import time

        deadline = time.time() + 15
        n = 0
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.table("rate_smoke").count()
            if n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n > 0


def test_compact_parquet(spark, sf_dir, tmp_path):
    """Small-file compaction: 64 tiny files -> few right-sized files,
    identical content."""
    from xetl_spark.sources.maintenance import compact_parquet

    src = str(tmp_path / "fragmented")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(64).write.mode("overwrite").parquet(src)
    import glob

    before_files = len(glob.glob(f"{src}/*.parquet"))
    assert before_files >= 32
    before_hash = sorted(r.o_orderkey for r in spark.read.parquet(src).collect())
    n = compact_parquet(spark, src, target_file_bytes=8 * 1024 * 1024)
    after_files = len(glob.glob(f"{src}/*.parquet"))
    assert after_files == n < before_files
    after_hash = sorted(r.o_orderkey for r in spark.read.parquet(src).collect())
    assert after_hash == before_hash


def test_scd2_two_consecutive_batches(spark):
    """Folding two change batches keeps a coherent history chain."""
    t0, t1, t2 = (dt.datetime(2024, m, 1) for m in (1, 3, 6))
    current = spark.createDataFrame(
        [(1, "a", t0, None, True)],
        "k long, addr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    c1 = spark.createDataFrame([(1, "b", t1)], "k long, addr string, ts timestamp")
    step1 = scd2(current, c1, ["k"], "ts", ["addr"])
    c2 = spark.createDataFrame([(1, "c", t2)], "k long, addr string, ts timestamp")
    step2 = scd2(step1, c2, ["k"], "ts", ["addr"]).collect()
    rows = sorted((r.addr, r.valid_from, r.valid_to, r.is_current) for r in step2)
    assert rows == [
        ("a", t0, t1, False),
        ("b", t1, t2, False),
        ("c", t2, None, True),
    ]


def test_stream_cdc_fold_versioned_snapshots(spark, tmp_path):
    """CDC fold over two micro-batches: the final snapshot keeps the
    max-(ver, k) row per key regardless of batch split; every version
    stays queryable (time travel)."""
    from xetl_spark.operators import latest_snapshot, stream_cdc_fold

    schema = "k long, ver long, amt double"
    src = tmp_path / "cdc_src"
    # batch 1: k=1 v1, k=2 v2 ; batch 2: k=1 v3 (newer), k=3 v1 (new key)
    spark.createDataFrame([(1, 1, 10.0), (2, 2, 20.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame([(1, 3, 99.0), (3, 1, 30.0)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    table = str(tmp_path / "cdc_table")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
    )
    n = stream_cdc_fold(stream, table, keys=["k"], order_by=["ver", "k"])
    assert n == 2

    final, v = latest_snapshot(spark, table)
    assert v == 1  # two batches -> v=0 then v=1
    assert {(r.k, r.ver, r.amt) for r in final.collect()} == {
        (1, 3, 99.0),
        (2, 2, 20.0),
        (3, 1, 30.0),
    }
    # old snapshot still queryable (poor man's time travel)
    v0 = spark.read.parquet(f"{table}/v=0")
    assert v0.count() in (1, 2)  # whichever file came first


def test_compact_parquet_cluster_by_disjoint_zones(spark, sf_dir, tmp_path):
    """cluster_by compaction: output files carry DISJOINT o_orderkey
    ranges (range partitioning + in-file sort), so parquet min/max
    stats prune whole files for selective scans."""
    import glob

    import pyarrow.parquet as pq

    from xetl_spark.sources.maintenance import compact_parquet

    src = str(tmp_path / "clustered")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # shuffled write: row order uncorrelated with o_orderkey
    orders.orderBy(F.rand(42)).repartition(6).write.parquet(src)

    n = compact_parquet(
        spark, src, target_file_bytes=256 * 1024, cluster_by=["o_orderkey"]
    )
    files = sorted(glob.glob(f"{src}/part-*.parquet"))
    assert 1 <= len(files) <= n + 1
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderkey"
        )
        mins = [md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint zones across files
    # data intact
    back = spark.read.parquet(src)
    assert back.count() == orders.count()


def test_compact_parquet_zorder_prunes_both_dims(spark, sf_dir, tmp_path):
    """zorder_by compaction: per-file min/max ranges narrow on BOTH
    z-ordered columns (single-column clustering can only narrow one),
    so selective scans on either column prune files."""
    import glob

    import pyarrow.parquet as pq

    from xetl_spark.sources.maintenance import compact_parquet

    def mean_file_range_frac(src, col):
        files = sorted(glob.glob(f"{src}/part-*.parquet"))
        spans, glo, ghi = [], None, None
        for f in files:
            md = pq.ParquetFile(f).metadata
            ci = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            mins = [md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups)]
            maxs = [md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups)]
            spans.append((min(mins), max(maxs)))
            glo = min(glo, *mins) if glo is not None else min(mins)
            ghi = max(ghi, *maxs) if ghi is not None else max(maxs)
        width = ghi - glo
        return sum((hi - lo) / width for lo, hi in spans) / len(spans), len(files)

    # sf0.01 for enough data to produce several output files
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")

    zsrc = str(tmp_path / "zordered")
    orders.orderBy(F.rand(7)).repartition(6).write.parquet(zsrc)
    compact_parquet(
        spark, zsrc, target_file_bytes=16 * 1024,
        zorder_by=["o_orderkey", "o_custkey"],
    )
    fr_ok, nf = mean_file_range_frac(zsrc, "o_orderkey")
    fr_ck, _ = mean_file_range_frac(zsrc, "o_custkey")
    assert nf >= 10  # enough files for pruning to mean anything
    # both dimensions narrowed well below the full range
    # (~19 files x 6-bit buckets measured 0.42/0.29; margin for variance)
    assert fr_ok < 0.6 and fr_ck < 0.5, (fr_ok, fr_ck)

    # contrast: single-column clustering leaves the OTHER column global
    csrc = str(tmp_path / "clustered1d")
    orders.orderBy(F.rand(7)).repartition(6).write.parquet(csrc)
    compact_parquet(
        spark, csrc, target_file_bytes=16 * 1024, cluster_by=["o_orderkey"]
    )
    fr1_ck, _ = mean_file_range_frac(csrc, "o_custkey")
    assert fr1_ck > 0.9  # uncorrelated dim: every file spans ~everything
    # data intact under zorder rewrite
    assert spark.read.parquet(zsrc).count() == orders.count()


def test_read_with_quarantine_splits_bad_rows(spark, tmp_path):
    """PERMISSIVE ingest: malformed JSONL rows land in the quarantine
    branch as raw text (replayable), parseable rows come back typed,
    and neither FAILFAST-aborts nor silently drops."""
    from xetl_spark.sources import read_with_quarantine

    src = tmp_path / "in.jsonl"
    src.write_text(
        '{"id": 1, "v": 10.5}\n'
        "not json at all\n"
        '{"id": 2, "v": "NaN-ish"}\n'   # type mismatch -> corrupt
        '{"id": 3, "v": 2.5}\n'
    )
    q = str(tmp_path / "quarantine")
    good, bad = read_with_quarantine(
        spark, str(src), "json", "id bigint, v double", quarantine_path=q
    )
    assert {r.id for r in good.collect()} == {1, 3}
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2 and "not json at all" in raws
    # quarantine file holds the same raw lines for replay
    replay = spark.read.text(q)
    assert replay.count() == 2


def test_compact_hive_partitions_selective(spark, sf_dir, tmp_path):
    """Per-partition compaction rewrites only fragmented partition
    dirs, preserves the partition column, and leaves compacted
    partitions untouched."""
    import glob

    from xetl_spark.sources.maintenance import compact_hive_partitions

    src = str(tmp_path / "hive")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # fragment only status 'O': many files; others stay single-file
    frag = orders.filter("o_orderstatus = 'O'").repartition(10)
    rest = orders.filter("o_orderstatus <> 'O'").coalesce(1)
    frag.unionByName(rest).write.partitionBy("o_orderstatus").parquet(src)
    before_f = len(glob.glob(f"{src}/o_orderstatus=F/part-*.parquet"))

    done = compact_hive_partitions(
        spark, src, target_file_bytes=64 * 1024 * 1024, min_files=4
    )
    assert set(done) == {"o_orderstatus=O"}  # only the fragmented one
    assert len(glob.glob(f"{src}/o_orderstatus=O/part-*.parquet")) < 10
    assert len(glob.glob(f"{src}/o_orderstatus=F/part-*.parquet")) == before_f
    back = spark.read.parquet(src)
    assert back.count() == orders.count()
    # partition column survives (it lives in the dir name)
    assert back.filter("o_orderstatus = 'O'").count() == frag.count()


def test_ivm_matches_full_recompute_under_inserts_and_retractions(spark):
    """Randomized: applying N insert/retract batches through ivm_apply
    equals a full groupBy recompute over the surviving multiset."""
    import random

    from pyspark.sql import functions as F

    from xetl_spark.operators.ivm import agg_snapshot, ivm_apply, ivm_read

    rnd = random.Random(11)
    live = []  # the surviving multiset, mirrored in plain Python
    base = [(rnd.randrange(6), rnd.randrange(100), round(rnd.uniform(0, 50), 2))
            for _ in range(400)]
    live.extend(base)
    schema = "k long, sub long, v double"
    state = agg_snapshot(spark.createDataFrame(base, schema), ["k"], ["v"])

    for _round in range(4):
        inserts = [(rnd.randrange(6), rnd.randrange(100), round(rnd.uniform(0, 50), 2))
                   for _ in range(120)]
        retracts = rnd.sample(live, 80)
        for r in retracts:
            live.remove(r)
        live.extend(inserts)
        batch = spark.createDataFrame(
            [(k, s, v, 1) for k, s, v in inserts]
            + [(k, s, v, -1) for k, s, v in retracts],
            schema + ", w int",
        )
        state = ivm_apply(state, batch, ["k"], ["v"], weight_col="w")

    got = {
        r.k: (r.n, round(r.sum_v, 6))
        for r in ivm_read(state, ["v"]).collect()
    }
    want: dict = {}
    for k, _s, v in live:
        n, s = want.get(k, (0, 0.0))
        want[k] = (n + 1, s + v)
    want = {k: (n, round(s, 6)) for k, (n, s) in want.items() if n}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 1e-4, k


def test_ivm_drops_emptied_groups_and_flags_drift(spark):
    from pyspark.sql import functions as F

    from xetl_spark.operators.ivm import agg_snapshot, ivm_apply

    base = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], "k long, v double")
    state = agg_snapshot(base, ["k"], ["v"])
    # retract both k=1 rows: the group disappears entirely
    batch = spark.createDataFrame(
        [(1, 10.0, -1), (1, 5.0, -1)], "k long, v double, w int"
    )
    state = ivm_apply(state, batch, ["k"], ["v"], weight_col="w")
    assert {r.k for r in state.collect()} == {2}
    # over-retraction drift is visible as a negative count, not clamped
    bad = ivm_apply(
        state,
        spark.createDataFrame([(2, 7.0, -1), (2, 1.0, -1)], "k long, v double, w int"),
        ["k"],
        ["v"],
        weight_col="w",
    )
    assert [r["__n"] for r in bad.collect()] == [-1]


def test_snapshot_diff_then_ivm_keeps_rollup_fresh(spark):
    """CDC-extract feeds IVM: diff(old,new) converted to insert/retract
    weights updates the rollup to exactly agg(new) — the end-to-end
    incremental freshness loop (diff is O(changes) input to ivm)."""
    from pyspark.sql import functions as F

    from xetl_spark.operators.cdc import snapshot_diff
    from xetl_spark.operators.ivm import agg_snapshot, ivm_apply, ivm_read

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0), (4, "b", 1.0)],
        "k long, g string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 5.0), (4, "b", 2.0), (5, "a", 9.0)],
        "k long, g string, v double",
    )
    diff = snapshot_diff(old, new, keys=["k"])
    ops = {r.k: r.op for r in diff.collect()}
    assert ops == {2: "update", 3: "delete", 4: "update", 5: "insert"}

    # updates retract the old image and insert the new one
    old_img = old.select("k", "g", "v")
    retract = (
        diff.filter(F.col("op").isin("delete", "update"))
        .select("k")
        .join(old_img, "k")
        .withColumn("w", F.lit(-1))
    )
    insert = (
        diff.filter(F.col("op").isin("insert", "update"))
        .select("k", "g", "v")
        .withColumn("w", F.lit(1))
    )
    state = agg_snapshot(old, ["g"], ["v"])
    state = ivm_apply(state, retract.unionByName(insert), ["g"], ["v"], weight_col="w")
    got = {r.g: (r.n, round(r.sum_v, 6)) for r in ivm_read(state, ["v"]).collect()}
    want = {
        r.g: (r.n, round(r.s, 6))
        for r in new.groupBy("g").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    assert got == want


def test_ivm_state_roundtrips_through_parquet(spark, tmp_path):
    """IVM state is a plain table: persisting to parquet between update
    batches (the real deployment shape — state lives in storage, not a
    session) changes nothing."""
    from pyspark.sql import functions as F

    from xetl_spark.operators.ivm import agg_snapshot, ivm_apply, ivm_read

    base = spark.createDataFrame(
        [(i % 5, float(i)) for i in range(100)], "k long, v double"
    )
    state = agg_snapshot(base, ["k"], ["v"])
    p1 = str(tmp_path / "state_v1")
    state.write.parquet(p1)

    batch = spark.createDataFrame(
        [(1, 100.0, 1), (2, 0.0, 1), (0, 0.0, -1)], "k long, v double, w int"
    )
    resumed = ivm_apply(spark.read.parquet(p1), batch, ["k"], ["v"], weight_col="w")
    live = ivm_apply(state, batch, ["k"], ["v"], weight_col="w")
    assert sorted(map(tuple, resumed.collect())) == sorted(map(tuple, live.collect()))
    out = {r.k: r.n for r in ivm_read(resumed, ["v"]).collect()}
    assert out[0] == 19 and out[1] == 21 and out[2] == 21


def test_dynamic_partition_overwrite(spark, tmp_path):
    """partitionOverwriteMode=dynamic replaces only the partitions the
    write touches — the idempotent-backfill write pattern (static mode
    would truncate the whole table first)."""
    dest = str(tmp_path / "dyn")
    base = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")], "id int, part string"
    )
    base.write.partitionBy("part").parquet(dest)
    patch = spark.createDataFrame([(99, "b")], "id int, part string")
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        patch.write.mode("overwrite").partitionBy("part").parquet(dest)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    back = sorted(map(tuple, spark.read.parquet(dest).collect()))
    # partition b fully replaced; a and c untouched
    assert back == [(1, "a"), (2, "a"), (4, "c"), (99, "b")]


def test_compression_codec_roundtrips(spark, tmp_path):
    """Parquet zstd/gzip and gzip CSV write+read roundtrip — codec
    choice is a storage knob, never a semantics change."""
    df = spark.range(500).selectExpr("id", "concat('x', id % 7) AS tag")
    want = sorted(map(tuple, df.collect()))
    for codec in ("zstd", "gzip", "snappy"):
        dest = str(tmp_path / f"pq_{codec}")
        df.write.option("compression", codec).parquet(dest)
        assert sorted(map(tuple, spark.read.parquet(dest).collect())) == want
    csvd = str(tmp_path / "csv_gz")
    df.write.option("compression", "gzip").option("header", True).csv(csvd)
    back = spark.read.option("header", True).schema("id long, tag string").csv(csvd)
    assert sorted(map(tuple, back.collect())) == want


def test_manifest_pruning_skips_files_and_matches_unpruned(spark, tmp_path):
    """sources/manifest.py: the footer-stats manifest must (a) carry
    exact per-file min/max in the column's own type, (b) prune the
    file list to only range-overlapping files, (c) return exactly the
    unpruned predicate's rows, and (d) handle the no-overlap case with
    an empty, correctly-typed result."""
    from xetl_spark.sources.manifest import _parquet_files, build_manifest, pruned_read

    dest = str(tmp_path / "fact")
    df = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    df.repartitionByRange(10, "k").sortWithinPartitions("k").write.parquet(dest)

    mani = build_manifest(spark, dest, "k").collect()
    assert len(mani) == len(_parquet_files(dest)) == 10
    assert all(isinstance(r.min_v, int) for r in mani)  # typed, not double
    assert sum(r.n_rows for r in mani) == 1000
    # disjoint sorted ranges: total span covers 0..999 without overlap
    spans = sorted((r.min_v, r.max_v) for r in mani)
    assert spans[0][0] == 0 and spans[-1][1] == 999
    assert all(a2 > b1 for (_a1, b1), (a2, _b2) in zip(spans, spans[1:]))

    got = pruned_read(spark, dest, "k", 150, 340)
    want = df.filter("k BETWEEN 150 AND 340")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # and it genuinely skipped files: the scan's input list is smaller
    kept_files = {f for f in got.inputFiles()}
    assert 0 < len(kept_files) < 10

    empty = pruned_read(spark, dest, "k", 5000, 6000)
    assert empty.count() == 0
    assert empty.schema == got.schema


def test_deletion_vectors_positional_semantics(spark, tmp_path):
    """operators/cdc.py deletion vectors address rows by PHYSICAL
    position (file, row_index), not by content — deleting one of two
    identical rows keeps the other, which no key-based anti-join can
    express. Also: empty DV is identity; bcast and shuffle paths
    agree."""
    from xetl_spark.operators.cdc import apply_deletion_vectors, read_with_position

    dest = str(tmp_path / "tbl")
    # two CONTENT-IDENTICAL rows (k=42) among distinct ones
    spark.createDataFrame(
        [(42, "dup"), (42, "dup"), (1, "a"), (2, "b")], "k long, v string"
    ).coalesce(1).write.parquet(dest)
    base = read_with_position(spark, dest)
    # delete exactly ONE of the duplicates (lowest position)
    one_dup = (
        base.filter("k = 42")
        .orderBy("__pos")
        .limit(1)
        .select(F.col("__file").alias("file"), F.col("__pos").alias("pos"))
    )
    alive = apply_deletion_vectors(base, one_dup)
    got = sorted((r.k, r.v) for r in alive.collect())
    assert got == [(1, "a"), (2, "b"), (42, "dup")]  # one dup survives
    assert "__pos" not in alive.columns and "__file" not in alive.columns

    none = spark.createDataFrame([], "file string, pos long")
    assert apply_deletion_vectors(base, none).count() == 4
    # broadcast and shuffle variants agree
    dv = base.filter("k <= 2").select(
        F.col("__file").alias("file"), F.col("__pos").alias("pos")
    )
    a = sorted(map(tuple, apply_deletion_vectors(base, dv, True).collect()))
    b = sorted(map(tuple, apply_deletion_vectors(base, dv, False).collect()))
    assert a == b and len(a) == 2


def test_ivm_minmax_matches_full_recompute(spark):
    """Randomized: min/max maintained through bounded top-k array state
    (k=4, so evictions + drains actually happen) equals a full
    recompute, with dirty groups repaired from the live base."""
    import random

    from xetl_spark.operators.ivm import (
        minmax_apply,
        minmax_read,
        minmax_snapshot,
    )

    rnd = random.Random(23)
    live = [(rnd.randrange(5), rnd.randrange(1000)) for _ in range(300)]
    schema = "k long, v long"
    state = minmax_snapshot(spark.createDataFrame(live, schema), ["k"], ["v"], k=4)

    for _round in range(3):
        inserts = [(rnd.randrange(5), rnd.randrange(1000)) for _ in range(40)]
        # retract aggressively from the extremes to force kept-array
        # drains (the recompute-on-eviction path)
        by_v = sorted(live)
        retracts = by_v[:30] + by_v[-30:]
        for r in retracts:
            live.remove(r)
        live.extend(inserts)
        batch = spark.createDataFrame(
            [(k, v, 1) for k, v in inserts] + [(k, v, -1) for k, v in retracts],
            schema + ", w int",
        )
        post_base = spark.createDataFrame(live, schema)
        state = minmax_apply(
            state, batch, ["k"], ["v"], weight_col="w", k=4, base=post_base
        ).localCheckpoint()  # the persisted-state-table usage: bound lineage per batch

    got = {r.k: (r.n, r.min_v, r.max_v, r.dirty_v)
           for r in minmax_read(state, ["v"]).collect()}
    want: dict = {}
    for k, v in live:
        n, lo, hi = want.get(k, (0, None, None))
        want[k] = (n + 1, v if lo is None else min(lo, v),
                   v if hi is None else max(hi, v))
    assert set(got) == set(want)
    for k, (n, lo, hi) in want.items():
        assert got[k] == (n, lo, hi, False), (k, got[k], (n, lo, hi))


def test_ivm_minmax_dirty_without_base_then_repair(spark):
    """Draining a group's kept arrays without a base flags it dirty
    (NULL extremes); a later minmax_repair restores exact values."""
    from xetl_spark.operators.ivm import (
        minmax_apply,
        minmax_read,
        minmax_repair,
        minmax_snapshot,
    )

    rows = [(1, v) for v in range(10)]  # k=2 keeps {0,1} and {8,9}
    base = spark.createDataFrame(rows, "k long, v long")
    state = minmax_snapshot(base, ["k"], ["v"], k=2)
    batch = spark.createDataFrame(
        [(1, v, -1) for v in (0, 1, 8, 9)], "k long, v long, w int"
    )
    live = spark.createDataFrame([(1, v) for v in range(2, 8)], "k long, v long")
    state = minmax_apply(state, batch, ["k"], ["v"], weight_col="w", k=2)
    row = minmax_read(state, ["v"]).collect()[0]
    assert (row.n, row.min_v, row.max_v, row.dirty_v) == (6, None, None, True)
    repaired = minmax_repair(state, live, ["k"], ["v"], k=2)
    row = minmax_read(repaired, ["v"]).collect()[0]
    assert (row.n, row.min_v, row.max_v, row.dirty_v) == (6, 2, 7, False)


def test_ivm_minmax_untracked_retraction_is_safe(spark):
    """Retracting a mid-range value that was evicted from the kept
    arrays must not disturb the (still-correct) extremes."""
    from xetl_spark.operators.ivm import minmax_apply, minmax_read, minmax_snapshot

    base = spark.createDataFrame([(1, v) for v in range(10)], "k long, v long")
    state = minmax_snapshot(base, ["k"], ["v"], k=2)  # keeps {0,1} / {8,9}
    batch = spark.createDataFrame([(1, 5, -1)], "k long, v long, w int")
    state = minmax_apply(state, batch, ["k"], ["v"], weight_col="w", k=2)
    row = minmax_read(state, ["v"]).collect()[0]
    assert (row.n, row.min_v, row.max_v, row.dirty_v) == (9, 0, 9, False)


def test_ivm_minmax_per_side_overflow_thresholds(spark):
    """Review-confirmed repro: retractions hit the two kept arrays
    asymmetrically (different multisets), so overflow/threshold updates
    must be PER SIDE — a shared flag let the max side evict past an
    un-raised threshold and report a confidently wrong, non-dirty max."""
    from xetl_spark.operators.ivm import minmax_apply, minmax_read, minmax_snapshot

    def batch(rows):
        return spark.createDataFrame(rows, "k long, v long, w int")

    state = minmax_snapshot(
        spark.createDataFrame([(1, 10), (1, 20)], "k long, v long"), ["k"], ["v"], k=2
    )
    state = minmax_apply(state, batch([(1, 30, 1), (1, 40, 1)]), ["k"], ["v"],
                         weight_col="w", k=2)
    state = minmax_apply(
        state, batch([(1, 10, -1), (1, 20, -1), (1, 5, 1), (1, 35, 1)]),
        ["k"], ["v"], weight_col="w", k=2,
    )
    state = minmax_apply(
        state, batch([(1, 35, -1), (1, 40, -1), (1, 25, 1)]),
        ["k"], ["v"], weight_col="w", k=2,
    )
    row = minmax_read(state, ["v"]).collect()[0]
    # live multiset is {5, 25, 30}: either the engine knows max=30 or it
    # must say DIRTY — it must never claim a wrong max confidently
    assert row.dirty_v or row.max_v == 30, row
    assert row.min_v == 5 or row.dirty_v
    # with the live base supplied, the dirty group repairs to the truth
    live = spark.createDataFrame([(1, 5), (1, 25), (1, 30)], "k long, v long")
    from xetl_spark.operators.ivm import minmax_repair

    row = minmax_read(minmax_repair(state, live, ["k"], ["v"], k=2), ["v"]).collect()[0]
    assert (row.min_v, row.max_v, row.dirty_v) == (5, 30, False)


def test_ivm_minmax_large_delta_recompute_path(spark):
    """r13 (found by the sf1 scaling leg): a group whose batch exceeds
    recompute_threshold skips the O(|batch-group|^2) array fold —
    counts still apply, the group goes DIRTY (NULL extremes) without
    base, and the same-call base repair rebuilds it exactly; small
    groups in the same batch keep the incremental path."""
    from xetl_spark.operators.ivm import (
        minmax_apply,
        minmax_read,
        minmax_snapshot,
    )

    base_rows = [(1, v) for v in range(20, 30)] + [(2, v) for v in (5, 6, 7)]
    base = spark.createDataFrame(base_rows, "k long, v long")
    state = minmax_snapshot(base, ["k"], ["v"], k=2)
    # group 1: 12-row delta (> threshold 4) — inserts 0..9, retracts 20+21
    big = [(1, v, 1) for v in range(10)] + [(1, 20, -1), (1, 21, -1)]
    # group 2: 1-row delta — stays on the fold path
    batch = spark.createDataFrame(big + [(2, 1, 1)], "k long, v long, w int")
    live_rows = (
        [(1, v) for v in range(10)] + [(1, v) for v in range(22, 30)]
        + [(2, v) for v in (1, 5, 6, 7)]
    )
    live = spark.createDataFrame(live_rows, "k long, v long")

    # without base: big group dirty, counts exact, small group folded
    st = minmax_apply(
        state, batch, ["k"], ["v"], weight_col="w", k=2,
        recompute_threshold=4,
    )
    got = {r.k: r for r in minmax_read(st, ["v"]).collect()}
    assert (got[1].n, got[1].min_v, got[1].max_v, got[1].dirty_v) == (
        18, None, None, True,
    )
    assert (got[2].n, got[2].min_v, got[2].max_v, got[2].dirty_v) == (
        4, 1, 7, False,
    )
    # with base: the in-call pruned repair rebuilds the big group exactly
    st2 = minmax_apply(
        state, batch, ["k"], ["v"], weight_col="w", k=2,
        recompute_threshold=4, base=live,
    )
    got2 = {r.k: r for r in minmax_read(st2, ["v"]).collect()}
    assert (got2[1].n, got2[1].min_v, got2[1].max_v, got2[1].dirty_v) == (
        18, 0, 29, False,
    )
    assert (got2[2].n, got2[2].min_v, got2[2].max_v) == (4, 1, 7)
    # a NEW group arriving as a big all-insert delta also repairs exactly
    batch3 = spark.createDataFrame(
        [(9, v, 1) for v in range(50, 60)], "k long, v long, w int"
    )
    live3 = spark.createDataFrame([(9, v) for v in range(50, 60)], "k long, v long")
    st3 = minmax_apply(
        state, batch3, ["k"], ["v"], weight_col="w", k=2,
        recompute_threshold=4, base=live3,
    )
    got3 = {r.k: r for r in minmax_read(st3, ["v"]).collect()}
    assert (got3[9].n, got3[9].min_v, got3[9].max_v, got3[9].dirty_v) == (
        10, 50, 59, False,
    )


def test_ivm_minmax_big_delta_lowers_threshold(spark):
    """r14 (advisor-found): the recompute-path threshold seed must
    LOWER (resp. raise) the old threshold to bound the big batch's own
    extremes — coalesce kept the OLD threshold when the big batch
    inserted values below it, so a later small insert inside the stale
    bound read the group CLEAN with a wrong min while a smaller value
    was live (and repair, which only rescans dirty groups, never fixed
    it). Max side symmetric."""
    from xetl_spark.operators.ivm import (
        minmax_apply,
        minmax_read,
        minmax_repair,
        minmax_snapshot,
    )

    base = spark.createDataFrame([(1, 20), (1, 21)], "k long, v long")
    state = minmax_snapshot(base, ["k"], ["v"], k=2)
    # overflow the kept arrays so mnthr/mxthr become non-null (=21 / =20)
    state = minmax_apply(
        state,
        spark.createDataFrame(
            [(1, 19, 1), (1, 22, 1), (1, 18, 1), (1, 23, 1)],
            "k long, v long, w int",
        ),
        ["k"], ["v"], weight_col="w", k=2,
    )
    # big all-insert delta with values OUTSIDE the old thresholds on
    # both sides (0..9 below mnthr, 100..109 above mxthr), no base
    big = [(1, v, 1) for v in list(range(10)) + list(range(100, 110))]
    state = minmax_apply(
        state,
        spark.createDataFrame(big, "k long, v long, w int"),
        ["k"], ["v"], weight_col="w", k=2, recompute_threshold=4,
    )
    # small follow-up insert BETWEEN the old and the true extremes: with
    # the stale threshold the group read clean with min=5/max=50
    state = minmax_apply(
        state,
        spark.createDataFrame([(1, 5, 1), (1, 50, 1)], "k long, v long, w int"),
        ["k"], ["v"], weight_col="w", k=2,
    )
    row = minmax_read(state, ["v"]).collect()[0]
    # 0 and 109 are live and untracked: the group MUST stay dirty
    assert row.dirty_v, row
    assert row.min_v is None and row.max_v is None
    live = spark.createDataFrame(
        [(1, v) for v in (18, 19, 20, 21, 22, 23, 5, 50)]
        + [(1, v) for v in list(range(10)) + list(range(100, 110))],
        "k long, v long",
    )
    row = minmax_read(
        minmax_repair(state, live, ["k"], ["v"], k=2), ["v"]
    ).collect()[0]
    assert (row.min_v, row.max_v, row.dirty_v) == (0, 109, False)
