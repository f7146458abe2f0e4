"""Operator-level unit tests: as-of join, dedup determinism, sampling,
sessionization, plan-shape assertions (broadcast, pushdown)."""

import pandas as pd
from pyspark.sql import functions as F

from xetl_spark.operators import (
    asof_join,
    dedup_keep_first,
    deterministic_sample,
    sessionize,
    topk_per_group,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_matches_merge_asof(spark):
    """Window-composition as-of join == pandas merge_asof on the same
    data (per-key nearest prior row)."""
    left = _df(
        spark,
        [(1, 10.0), (1, 25.0), (1, 4.0), (2, 7.0), (3, 5.0)],
        "k int, ts double",
    )
    right = _df(
        spark,
        [(1, 5.0, "a"), (1, 20.0, "b"), (2, 7.0, "c"), (2, 9.0, "d")],
        "k int, rts double, v string",
    )
    got = (
        asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["v"])
        .orderBy("k", "ts")
        .collect()
    )
    lp = left.toPandas().sort_values("ts")
    rp = right.toPandas().sort_values("rts")
    exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k")
    exp = exp.sort_values(["k", "ts"]).reset_index(drop=True)
    assert [(r.k, r.ts, r.v_asof) for r in got] == [
        (int(t.k), float(t.ts), None if pd.isna(t.v) else t.v) for t in exp.itertuples()
    ]


def test_asof_exact_match_and_forward(spark):
    left = _df(spark, [(1, 10.0)], "k int, ts double")
    right = _df(spark, [(1, 10.0, "exact"), (1, 12.0, "later")], "k int, rts double, v string")
    back = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", right_payload=["v"])
    assert back.collect()[0].v_asof == "exact"
    noexact = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_payload=["v"], allow_exact=False,
    )
    assert noexact.collect()[0].v_asof is None
    fwd = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_payload=["v"], direction="forward", allow_exact=False,
    )
    assert fwd.collect()[0].v_asof == "later"


def test_dedup_keep_first_deterministic(spark):
    df = _df(
        spark,
        [(1, "b", 2), (1, "a", 1), (2, "z", 9)],
        "k int, v string, ord int",
    )
    out = dedup_keep_first(df, ["k"], [F.col("ord")]).orderBy("k").collect()
    assert [(r.k, r.v) for r in out] == [(1, "a"), (2, "z")]


def test_topk_per_group(spark):
    df = _df(spark, [(1, i) for i in range(10)] + [(2, 5)], "g int, v int")
    out = topk_per_group(df, ["g"], [F.col("v").desc()], 3)
    got = {(r.g, r.v) for r in out.collect()}
    assert got == {(1, 9), (1, 8), (1, 7), (2, 5)}


def test_deterministic_sample_stable_and_partition_invariant(spark):
    df = spark.range(10000).withColumnRenamed("id", "k")
    a = {r.k for r in deterministic_sample(df, ["k"], 10).collect()}
    b = {r.k for r in deterministic_sample(df.repartition(13), ["k"], 10).collect()}
    assert a == b  # content-addressed: partitioning can't change the sample
    assert 0.05 < len(a) / 10000 < 0.15


def test_sessionize_gap_boundaries(spark):
    df = _df(
        spark,
        [(1, 0.0), (1, 100.0), (1, 100.0 + 1801.0), (2, 0.0)],
        "u int, ts double",
    )
    out = sessionize(df, "u", "ts", 1800).orderBy("u", "ts").collect()
    assert [r.session_id for r in out] == [1, 1, 2, 1]


def test_broadcast_join_plan(spark, sf_dir):
    """The flagship's dimension join must be a broadcast hash join and
    the parquet scan must show pushed filters (scale contract)."""
    from xetl_spark.queries import REGISTRY

    plan = (
        REGISTRY["q_join_revenue_by_nation"]
        .fn(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_parquet_pushdown_plan(spark, sf_dir):
    from xetl_spark.queries import REGISTRY

    df = REGISTRY["q_scan_parquet"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(l_partkey)" in plan
    # column pruning: only the three referenced columns are read
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_extendedprice:double>" in plan


def test_multimodal_feature_schema(spark, sf_dir):
    """The OPERATOR emits the typed feature vector (array<float> — the
    embedding-pipeline contract); the registry QUERY flattens it to
    scalar columns per the canon rule (r4's one red driver row was
    exactly this query returning the raw array)."""
    from xetl_spark.operators import multimodal
    from xetl_spark.queries import REGISTRY, load

    (docs,) = load(spark, sf_dir, "documents")
    with_media = multimodal.attach_binary(docs, "text", mime="text/plain")
    feats = multimodal.extract_features(with_media, "media", "doc_id")
    assert feats.schema.simpleString() == (
        "struct<id:bigint,byte_len:bigint,width:int,height:int,features:array<float>>"
    )
    rows = feats.limit(5).collect()
    assert all(len(r.features) == 8 for r in rows)
    # determinism: same payload → same features on a second run
    again = (
        multimodal.extract_features(with_media, "media", "doc_id").limit(5).collect()
    )
    assert [r.features for r in rows] == [r.features for r in again]

    q = REGISTRY["q_multimodal_features"].fn(spark, sf_dir)
    assert q.schema.simpleString() == (
        "struct<doc_id:bigint,byte_len:bigint,width:int,height:int,"
        "feat_sum:double,f0:double>"
    )


def test_functions_library_columns(spark):
    """The functions/ column library composes in plain selects."""
    from xetl_spark import functions as XF

    df = spark.createDataFrame(
        [(1, "The quick brown fox", [1.0, 0.0], [0.6, 0.8])],
        "id long, text string, a array<double>, b array<double>",
    )
    row = df.select(
        XF.token_count("text").alias("n"),
        XF.dot("a", "b").alias("d"),
        XF.norm("b").alias("nb"),
        XF.cosine_sim("a", "b").alias("cs"),
    ).collect()[0]
    assert row.n == 4
    assert row.d == 0.6
    assert abs(row.nb - 1.0) < 1e-12
    assert abs(row.cs - 0.6) < 1e-12


def test_asof_tolerance(spark):
    """pandas merge_asof tolerance parity: matches further than the
    tolerance are nulled."""
    left = _df(spark, [(1, 100.0), (1, 300.0)], "k int, ts double")
    right = _df(spark, [(1, 95.0, "near")], "k int, rts double, v string")
    out = {
        r.ts: r.v_asof
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts",
            right_payload=["v"], tolerance=10.0,
        ).collect()
    }
    assert out == {100.0: "near", 300.0: None}  # 205s away > tolerance


def test_multimodal_resize_and_frames(spark, sf_dir):
    """Resize (1→1) and frame-sample (1→N) multimodal plumbing:
    schemas, deterministic stub payloads, bounded frame counts."""
    from xetl_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.attach_binary(docs, "text")
    resized = multimodal.resize_images(media, "media", "doc_id", 64, 48)
    rows = resized.collect()
    assert len(rows) == 20
    assert all(r.width == 64 and r.height == 48 and len(r.resized) == 32 for r in rows)
    again = multimodal.resize_images(media, "media", "doc_id", 64, 48).collect()
    assert {r.id: bytes(r.resized) for r in rows} == {
        r.id: bytes(r.resized) for r in again
    }

    frames = multimodal.sample_frames(media, "media", "doc_id", every_ms=500, max_frames=3)
    fr = frames.collect()
    assert len(fr) >= 20  # at least one frame per doc
    by_id = {}
    for r in fr:
        by_id.setdefault(r.id, []).append(r)
    for rid, rs in by_id.items():
        assert 1 <= len(rs) <= 3
        assert sorted(r.frame_idx for r in rs) == list(range(len(rs)))
        assert all(r.frame_ts_ms == r.frame_idx * 500 for r in rs)


def test_train_test_split_stable_and_disjoint(spark):
    from xetl_spark.operators.relational import train_test_split

    df = spark.range(5000).withColumnRenamed("id", "k")
    a = train_test_split(df, ["k"], 20)
    parts = {r.k: r.split for r in a.collect()}
    b = {r.k: r.split for r in train_test_split(df.repartition(7), ["k"], 20).collect()}
    assert parts == b  # partitioning-invariant assignment
    frac = sum(1 for v in parts.values() if v == "test") / len(parts)
    assert 0.15 < frac < 0.25


def test_bpe_ish_token_count_examples(spark):
    from xetl_spark.operators.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "it's 42 degrees!"), (3, "")],
        "id long, text string",
    )
    got = {r.id: r.n for r in df.select("id", bpe_ish_token_count("text").alias("n")).collect()}
    assert got[1] == 2          # two letter runs
    assert got[2] == 5          # "it" "'s" " 42" " degrees" "!"
    assert got[3] == 0


def test_profile_one_pass(spark, sf_dir):
    from xetl_spark.operators.quality import profile

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    prof = {r.column: r for r in profile(cust, ["c_custkey", "c_mktsegment"]).collect()}
    assert prof["c_custkey"].n_rows == cust.count()
    assert prof["c_custkey"].n_nulls == 0
    assert prof["c_mktsegment"].min_str == "AUTOMOBILE"
    assert prof["c_mktsegment"].max_str == "MACHINERY"
    # one aggregation regardless of column count
    plan = profile(cust)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2


def test_union_by_name_allow_missing(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, 3.5)], "id long, b double")
    out = a.unionByName(b, allowMissingColumns=True).orderBy("id").collect()
    assert out[0].a == "x" and out[0].b is None
    assert out[1].a is None and out[1].b == 3.5


def test_join_strategy_hints(spark, sf_dir):
    """Join strategy hints are honored: shuffle_hash and merge override
    the optimizer's default pick."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sh = orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
    assert "ShuffledHashJoin" in sh._jdf.queryExecution().executedPlan().toString()
    sm = orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    assert "SortMergeJoin" in sm._jdf.queryExecution().executedPlan().toString()


def test_multimodal_audio_windows(spark, sf_dir):
    """Audio windowing (1→N overlapping PCM windows): contiguous hop
    starts, window/hop timing, deterministic stub payloads."""
    from xetl_spark.operators import multimodal

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = multimodal.attach_binary(docs, "text", mime="audio/wav")
    wins = multimodal.window_audio(
        media, "media", "doc_id", window_ms=1000, hop_ms=500
    ).collect()
    by_id = {}
    for r in wins:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id) == 20
    for rid, rs in by_id.items():
        rs.sort(key=lambda r: r.window_idx)
        assert 1 <= len(rs) <= 8
        assert [r.start_ms for r in rs] == [i * 500 for i in range(len(rs))]
        assert all(r.end_ms <= r.start_ms + 1000 for r in rs)
        assert all(len(bytes(r.pcm)) == 32 for r in rs)
    # determinism across runs
    again = multimodal.window_audio(media, "media", "doc_id").collect()
    assert {(r.id, r.window_idx): bytes(r.pcm) for r in again} == {
        (r.id, r.window_idx): bytes(r.pcm) for r in wins
    }


def test_resample_ffill_hand_series(spark):
    """Gaps get the grid rows; v stays NULL there while v_filled
    carries the last observation forward; each key spans only its own
    range."""
    from xetl_spark.operators import resample_ffill

    rows = [
        (1, "2024-01-01 00:10:00", 1.0),
        (1, "2024-01-01 00:40:00", 2.0),   # same bucket as above
        (1, "2024-01-01 03:05:00", 5.0),   # 2-hour gap
        (2, "2024-01-01 10:00:00", 7.0),   # key 2: single bucket
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = resample_ffill(df, "ts", "user_id", "value", unit="hour")
    got = {
        (r.key, str(r.bucket)): (r.v, r.v_filled)
        for r in out.collect()
    }
    assert got == {
        (1, "2024-01-01 00:00:00"): (3.0, 3.0),
        (1, "2024-01-01 01:00:00"): (None, 3.0),
        (1, "2024-01-01 02:00:00"): (None, 3.0),
        (1, "2024-01-01 03:00:00"): (5.0, 5.0),
        (2, "2024-01-01 10:00:00"): (7.0, 7.0),
    }


def test_cohort_retention_two_phase_distinct_plan(spark, sf_dir):
    """countDistinct per (cohort, offset) must not funnel a hot cell's
    raw users through one reducer. Catalyst's distinct-aggregate
    rewrite handles this: the first exchange hashes on
    (cohort, offset, user_id) — uniform even when one cohort holds
    every user — and the per-cell exchange carries only map-side
    partial COUNTS. Pin that shape so a refactor (e.g. rewriting via
    collect_set or a window) can't silently reintroduce the skew."""
    from pyspark.sql import functions as F

    from xetl_spark.queries import REGISTRY

    import re

    df = REGISTRY["q_cohort_retention"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # dedup stage keyed by the full (cohort, offset, user) tuple
    assert re.search(r"hashpartitioning\(cohort[^)]*user_id", plan), plan
    # per-cell stage merges partial counts, not raw rows
    assert "partial_count(distinct" in plan


def test_cohort_retention_skewed_cohort_differential(spark):
    """One mega-cohort (90% of users first appear the same week) —
    the exact skew VERDICT flagged. The query's result must equal a
    manually salted two-phase countDistinct on the same data."""
    import pandas as pd
    from pyspark.sql import functions as F

    rows = []
    # 900 users first appear in week 0; 100 spread over weeks 1-4;
    # everyone re-appears in later weeks
    for u in range(1000):
        first_week = 0 if u < 900 else 1 + u % 4
        for wk in range(first_week, 8, 2):
            rows.append((u, pd.Timestamp("2024-01-01") + pd.Timedelta(weeks=wk)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"]), "user_id long, ts timestamp"
    )

    firsts = df.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    joined = df.join(firsts, "user_id")
    offset = F.floor(
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort")) / 7
    ).cast("long")
    cells = joined.select(
        F.col("cohort").alias("cohort_week"), offset.alias("week_offset"), "user_id"
    )
    engine = (
        cells.groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    # manual salted two-phase: distinct per (cell, salt), sum partials
    salted = (
        cells.withColumn("salt", F.col("user_id") % 16)
        .groupBy("cohort_week", "week_offset", "salt")
        .agg(F.countDistinct("user_id").alias("part"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.sum("part").alias("active_users"))
    )
    a = sorted(map(tuple, engine.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # the mega-cohort is really in the data (sanity of the fixture)
    mega = [r for r in a if r[1] == 0]
    assert max(r[2] for r in mega) >= 900


def test_cms_overestimates_and_merges(spark):
    """Count-min invariants: estimate ≥ true always; sketch(A∪B) =
    merge(sketch(A), sketch(B)); wide sketch on few keys is exact."""
    from pyspark.sql import functions as F

    from xetl_spark.operators.sketch import cms_estimate, cms_merge, count_min_sketch

    a = spark.createDataFrame([(i % 7,) for i in range(300)], "k long")
    b = spark.createDataFrame([(i % 11,) for i in range(200)], "k long")
    keys = spark.range(12).select(F.col("id").alias("k"))
    true_union = {
        r.k: r.n
        for r in a.unionByName(b).groupBy("k").agg(F.count("*").alias("n")).collect()
    }

    d, w = 4, 64
    sk_a = count_min_sketch(a, "k", d, w)
    sk_b = count_min_sketch(b, "k", d, w)
    merged = cms_merge(sk_a, sk_b)
    direct = count_min_sketch(a.unionByName(b), "k", d, w)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    est = {r.k: r.est for r in cms_estimate(merged, keys, "k", d, w).collect()}
    n_total = 500
    for k in range(12):
        truth = true_union.get(k, 0)
        assert est[k] >= truth  # counters only over-count
        assert est[k] <= truth + n_total  # trivial sanity ceiling
    # 12 keys in a 4x4096 sketch: collisions virtually impossible → exact
    wide = count_min_sketch(a.unionByName(b), "k", 4, 4096)
    est_w = {r.k: r.est for r in cms_estimate(wide, keys, "k", 4, 4096).collect()}
    assert est_w == {k: true_union.get(k, 0) for k in range(12)}


def test_cms_deterministic_across_partitionings(spark):
    from xetl_spark.operators.sketch import count_min_sketch

    df = spark.createDataFrame([(i % 13,) for i in range(500)], "k long")
    one = sorted(map(tuple, count_min_sketch(df.coalesce(1), "k").collect()))
    many = sorted(map(tuple, count_min_sketch(df.repartition(16), "k").collect()))
    assert one == many


def test_cms_error_bound_on_fixture(spark, sf_dir):
    """CMS estimate error on real data stays within the theoretical
    envelope: with width w, expected per-key overestimate is N/w; the
    fixture check allows 3x the eN/w bound (deterministic hashing, so
    this pins behavior, not luck)."""
    import math

    from pyspark.sql import functions as F

    from xetl_spark.operators.sketch import cms_estimate, count_min_sketch

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    d, w = 4, 2048
    n_total = events.count()
    sketch = count_min_sketch(events, "user_id", d, w)
    users = events.select("user_id").distinct()
    est = {r.user_id: r.est for r in cms_estimate(sketch, users, "user_id", d, w).collect()}
    true = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    bound = 3 * math.e * n_total / w
    for k, t in true.items():
        assert est[k] >= t, k  # never undercounts
        assert est[k] - t <= bound, (k, est[k], t, bound)


def test_interpolate_linear_hand_series(spark):
    """Interior gaps interpolate time-weighted between the surrounding
    observed buckets; observed buckets pass through; leading/trailing
    gaps take the nearest single side."""
    from xetl_spark.operators.timeseries import interpolate_linear

    rows = [
        (1, "2024-01-01 00:10:00", 1.0),
        (1, "2024-01-01 03:05:00", 7.0),   # 2 missing hours between
        (2, "2024-01-01 10:00:00", 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = interpolate_linear(df, "ts", "user_id", "value", unit="hour")
    got = {(r.key, str(r.bucket)): (r.v, r.v_interp) for r in out.collect()}
    assert got == {
        (1, "2024-01-01 00:00:00"): (1.0, 1.0),
        (1, "2024-01-01 01:00:00"): (None, 3.0),   # 1 + (7-1)*1/3
        (1, "2024-01-01 02:00:00"): (None, 5.0),   # 1 + (7-1)*2/3
        (1, "2024-01-01 03:00:00"): (7.0, 7.0),
        (2, "2024-01-01 10:00:00"): (4.0, 4.0),
    }


def test_salted_join_equals_plain_join(spark):
    """Salting changes only the physical distribution: the salted join
    must return exactly the plain join's multiset, including left rows
    duplicated per matching right row and (for how='left') unmatched
    left rows."""
    from xetl_spark.operators.relational import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (9, "z")], "k int, lv string"
    )
    right = spark.createDataFrame(
        [(1, "X"), (1, "Y"), (2, "W")], "k int, rv string"
    )
    for how in ("inner", "left"):
        got = sorted(
            map(tuple, salted_join(left, right, ["k"], how=how).collect())
        )
        want = sorted(map(tuple, left.join(right, ["k"], how).collect()))
        assert got == want, how
    import pytest

    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")


def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every inserted key must probe present; FP rate over a disjoint
    probe set stays within ~2x of the analytic (1-e^{-kn/m})^k."""
    import math

    from xetl_spark.operators.sketch import bloom_build, bloom_probe

    n, k, m = 500, 7, 1 << 14
    present = spark.range(n).selectExpr("id AS key")
    absent = spark.range(10_000, 12_000).selectExpr("id AS key")
    sk = bloom_build(present, "key", num_hashes=k, num_bits=m)
    hits = bloom_probe(sk, present, "key", num_hashes=k, num_bits=m)
    assert hits.filter("NOT maybe_present").count() == 0
    fp = bloom_probe(sk, absent, "key", num_hashes=k, num_bits=m)
    rate = fp.filter("maybe_present").count() / 2_000
    analytic = (1 - math.exp(-k * n / m)) ** k
    assert rate <= max(2 * analytic, 0.01), (rate, analytic)


def test_bloom_probe_duplicate_keys_no_false_negative(spark):
    """A key repeated k times in the probe batch must still report
    maybe_present=true (regression: a raw hit-count == num_hashes
    compare saw k*num_hashes joined rows and reported a present key
    absent — violating the definitely-absent guarantee). Absent keys
    stay absent when duplicated, and output is one row per distinct
    key."""
    import pyspark.sql.functions as F

    from xetl_spark.operators.sketch import bloom_build, bloom_probe

    k, m = 7, 1 << 14
    present = spark.range(100).selectExpr("id AS key")
    sk = bloom_build(present, "key", num_hashes=k, num_bits=m)
    dup_present = present.withColumn("x", F.explode(F.array_repeat(F.lit(1), 3)))
    probed = bloom_probe(sk, dup_present.select("key"), "key", k, m)
    assert probed.count() == 100
    assert probed.filter("NOT maybe_present").count() == 0
    # duplicated ABSENT keys: overwhelmingly still definitely-absent
    # (equality would be flaky only via genuine FP collisions, ~0 here)
    dup_absent = (
        spark.range(10_000, 10_100)
        .selectExpr("id AS key")
        .withColumn("x", F.explode(F.array_repeat(F.lit(1), 3)))
        .select("key")
    )
    fp = bloom_probe(sk, dup_absent, "key", k, m).filter("maybe_present").count()
    assert fp <= 2


def test_bloom_merge_distributivity(spark):
    """bloom(A ∪ B) == merge(bloom(A), bloom(B)) exactly (bit-set
    union), and the merged filter answers membership for both halves."""
    from xetl_spark.operators.sketch import bloom_build, bloom_merge, bloom_probe

    a = spark.range(0, 300).selectExpr("id AS key")
    b = spark.range(300, 600).selectExpr("id AS key")
    both = a.unionByName(b)
    k, m = 5, 1 << 13
    merged = bloom_merge(
        bloom_build(a, "key", k, m), bloom_build(b, "key", k, m)
    )
    direct = bloom_build(both, "key", k, m)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    assert (
        bloom_probe(merged, both, "key", k, m).filter("NOT maybe_present").count()
        == 0
    )


def test_ewma_hand_series(spark):
    """Half-life-one EWMA over observed buckets: weights 2^-j on the
    j-th newest; [10, 20, 40] folds to (10*0.25+20*0.5+40*1)/1.75."""
    from xetl_spark.operators.timeseries import ewma

    rows = [
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 01:10:00", 20.0),
        (1, "2024-01-01 02:10:00", 40.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    out = ewma(df, "ts", "user_id", "value", unit="hour", window=12)
    got = {str(r.bucket): r.ewma_v for r in out.collect()}
    assert got["2024-01-01 00:00:00"] == 10.0
    assert abs(got["2024-01-01 01:00:00"] - (10 * 0.5 + 20) / 1.5) < 1e-12
    assert abs(got["2024-01-01 02:00:00"] - 30.0) < 1e-12


def test_sliding_distinct_hll_accuracy(spark, sf_dir):
    """The HLL trailing-24h distinct estimate must track the exact
    trailing-window distinct (range self-join) within 2% on the events
    fixture, and the per-bucket frame must be a true time RANGE (gaps
    in the hour sequence don't stretch the window)."""
    import xetl_spark.queries as Q

    est = {
        r.bucket_us: r.approx_users_24h
        for r in Q.REGISTRY["q_stream_sliding_distinct_hll"].fn(
            spark, sf_dir
        ).collect()
    }
    (events,) = Q.load(spark, sf_dir, "events")
    ex = events.selectExpr(
        "unix_timestamp(date_trunc('hour', ts)) AS b", "user_id"
    ).distinct()
    buckets = ex.selectExpr("b AS bb").distinct()
    exact = {
        r.bb * 1_000_000: r.exact
        for r in buckets.join(
            ex, (F.col("b") <= F.col("bb")) & (F.col("b") > F.col("bb") - 24 * 3600)
        )
        .groupBy("bb")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, 0.02 * e), (k, est[k], e)


def test_weighted_sample_properties(spark):
    """Inclusion tracks the weight (rate within binomial noise per
    weight class), weight 0 excludes, weight >= scale always includes,
    and the draw is stable across partitionings."""
    from xetl_spark.operators import weighted_sample

    df = spark.range(4000).selectExpr(
        "id", "CAST(CASE WHEN id % 4 = 0 THEN 0 WHEN id % 4 = 1 THEN 250 "
        "WHEN id % 4 = 2 THEN 750 ELSE 1500 END AS BIGINT) AS w"
    )
    out = weighted_sample(df, "w", ["id"], scale=1000)
    got = out.groupBy("w").count().collect()
    by_w = {r.w: r["count"] for r in got}
    assert 0 not in by_w                       # p=0 never sampled
    assert by_w[1500] == 1000                  # p=1 keeps all
    assert abs(by_w[250] - 250) < 80           # p=0.25 of 1000
    assert abs(by_w[750] - 750) < 80           # p=0.75 of 1000
    a = sorted(r.id for r in out.collect())
    b = sorted(r.id for r in weighted_sample(df.repartition(17), "w", ["id"], 1000).collect())
    assert a == b


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Catalyst injects a runtime Bloom filter on the fact side of a
    selective shuffle join (bloom_filter_might_contain in the plan).
    The size thresholds are lowered because local fixtures sit under
    the 10MB creation-side default; at production scale the defaults
    engage on their own — this pins that the engine's join pipeline is
    inject-capable, the built-in complement of sketch.bloom_probe's
    explicit semi-join pruning."""
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    )
    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        j = li.join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            li.l_orderkey == orders.o_orderkey,
        ).agg(F.sum("l_quantity").alias("q"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter" in plan.lower(), plan[:2000]
        assert j.collect()[0].q is not None  # and it still computes
    finally:
        for k in overrides:
            spark.conf.unset(k)


def test_frequent_pairs_exact_and_guard(spark):
    from xetl_spark.operators.basket import frequent_pairs

    rows = [
        # basket 1: {a, b, c}; basket 2: {a, b}; basket 3: {a, b, d};
        # basket 4 (oversized under a cap of 3): {a, b, c, d}
        (1, "a"), (1, "b"), (1, "c"), (1, "a"),  # duplicate item collapses
        (2, "a"), (2, "b"),
        (3, "a"), (3, "b"), (3, "d"),
        (4, "a"), (4, "b"), (4, "c"), (4, "d"),
    ]
    df = spark.createDataFrame(rows, ["bk", "it"])
    got = {
        (r.item_a, r.item_b): r.n_baskets
        for r in frequent_pairs(df, "bk", "it", min_support=2).collect()
    }
    # min_support=2 filters the ("c","d") singleton
    assert got == {("a", "b"): 4, ("a", "c"): 2, ("b", "c"): 2,
                   ("a", "d"): 2, ("b", "d"): 2}
    # quadratic guard: dropping the 4-item basket removes its pairs
    guarded = {
        (r.item_a, r.item_b): r.n_baskets
        for r in frequent_pairs(df, "bk", "it", min_support=1,
                                max_basket_size=3).collect()
    }
    assert guarded == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1,
                       ("a", "d"): 1, ("b", "d"): 1}
    # A-Priori prune is semantics-preserving for pairs >= min_support
    pruned = {
        (r.item_a, r.item_b): r.n_baskets
        for r in frequent_pairs(df, "bk", "it", min_support=2,
                                prune_items=True).collect()
    }
    assert pruned == got
