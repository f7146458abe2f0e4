"""Property bounds for approximate operators (the SURVEY §2-B 'P'
verification class): HLL distinct, approx percentile, seeded sampling,
IVF-ANN recall."""

from pyspark.sql import functions as F


def test_approx_count_distinct_rsd(spark, sf_dir):
    from xetl_spark.queries import REGISTRY

    rows = REGISTRY["q_agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_orders - r.exact_orders) / max(r.exact_orders, 1)
        assert rel_err < 0.1, (r.l_returnflag, r.approx_orders, r.exact_orders)


def test_approx_percentile_close_to_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_seeded_sample_fraction(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    s = orders.sample(fraction=0.1, seed=42).count()
    assert 0.05 * n < s < 0.15 * n
    # same seed+data → same sample (stable within an engine/partitioning)
    s2 = orders.sample(fraction=0.1, seed=42).count()
    assert s == s2


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from xetl_spark.operators import cosine_topk_bruteforce, ivf_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(emb, queries, "embedding", "vec_id", k=5)
    approx = ivf_ann_topk(
        emb, queries, "embedding", "vec_id", k=5, n_clusters=8, n_probe=4
    )
    truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # probing half the cells of a data-adaptive index: strong recall
    assert recall >= 0.6, recall


def test_xxhash_stable_and_unique(spark, sf_dir):
    from xetl_spark.queries import REGISTRY

    a = REGISTRY["q_fn_nondeterministic_ids"].fn(spark, sf_dir).collect()
    b = REGISTRY["q_fn_nondeterministic_ids"].fn(spark, sf_dir).collect()
    assert {r.c_custkey: r.name_xxh for r in a} == {r.c_custkey: r.name_xxh for r in b}
    mono = [r.mono_id for r in a]
    assert len(set(mono)) == len(mono)  # unique ids


def test_stratified_sample_fractions(spark, sf_dir):
    from xetl_spark.queries import REGISTRY, load

    out = REGISTRY["q_sample_stratified"].fn(spark, sf_dir).groupBy("l_returnflag").count()
    got = {r.l_returnflag: r["count"] for r in out.collect()}
    (li,) = load(spark, sf_dir, "lineitem")
    totals = {r.l_returnflag: r["count"] for r in li.groupBy("l_returnflag").count().collect()}
    for flag, frac in [("A", 0.05), ("N", 0.2), ("R", 0.1)]:
        ratio = got.get(flag, 0) / totals[flag]
        assert 0.5 * frac < ratio < 1.5 * frac, (flag, ratio)


def test_ivf_persisted_index_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    """ivf_build_index + ivf_query_index: same results as the in-memory
    IVF (same seed → same centroids), and the index scan is
    partition-pruned to the probed cells."""
    from xetl_spark.operators import ivf_ann_topk, ivf_build_index, ivf_query_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf_idx")
    ivf_build_index(emb, "embedding", "vec_id", idx, n_clusters=8, seed=42)

    got_df = ivf_query_index(spark, idx, queries, "embedding", "vec_id", k=5, n_probe=4)
    got = {(r.query_id, r.neighbor_id, r.nn_rank) for r in got_df.collect()}
    want_df = ivf_ann_topk(
        emb, queries, "embedding", "vec_id", k=5, n_clusters=8, n_probe=4, seed=42
    )
    want = {(r.query_id, r.neighbor_id, r.nn_rank) for r in want_df.collect()}
    assert got == want

    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan


def test_hll_sketch_estimates_and_merge(spark, sf_dir):
    """DataSketches HLL: per-group estimates within the lgK=14 error
    bound of exact, and the merged (union) sketch approximates the
    global distinct count without rescanning the data."""
    from xetl_spark.queries import REGISTRY, load

    rows = {r.o_orderstatus: r for r in REGISTRY["q_agg_hll_sketch"].fn(spark, sf_dir).collect()}
    all_row = rows.pop("ALL")
    for status, r in rows.items():
        assert abs(r.approx_custs - r.exact_custs) / r.exact_custs < 0.05, (
            status, r.approx_custs, r.exact_custs)
    (orders,) = load(spark, sf_dir, "orders")
    exact_all = orders.select("o_custkey").distinct().count()
    assert abs(all_row.approx_custs - exact_all) / exact_all < 0.05


def test_ivf_centroid_cache(spark, sf_dir):
    """Repeated centroid fits over the same corpus plan return the
    memoized list (no KMeans re-scan); cache=False and a changed plan
    both refit."""
    from xetl_spark.operators.similarity import (
        clear_centroid_cache,
        ivf_fit_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clear_centroid_cache()
    first = ivf_fit_centroids(emb, "embedding", n_clusters=4)
    assert ivf_fit_centroids(emb, "embedding", n_clusters=4) is first
    # same plan rebuilt from scratch still hits (semantic hash, not id)
    emb2 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert ivf_fit_centroids(emb2, "embedding", n_clusters=4) is first
    # different params / cache opt-out miss
    assert ivf_fit_centroids(emb, "embedding", n_clusters=5) is not first
    uncached = ivf_fit_centroids(emb, "embedding", n_clusters=4, cache=False)
    assert uncached is not first and uncached == first
    clear_centroid_cache()
    assert ivf_fit_centroids(emb, "embedding", n_clusters=4) is not first


def test_load_clears_centroid_memo(spark, sf_dir):
    """The bench/oracle honesty boundary (r14): the registry's load()
    clears the centroid-fit memo the way it clears the Spark cache, so
    a re-invoked kmeans/IVF/semdedup query re-fits from the parquet
    inputs instead of reusing the previous invocation's result."""
    import xetl_spark.operators.similarity as sim
    from xetl_spark.queries import load

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sim.clear_centroid_cache()
    first = sim.ivf_fit_centroids(emb, "embedding", n_clusters=4)
    assert len(sim._CENTROID_CACHE) == 1
    # within-invocation reuse still applies (same plan, same params)
    assert sim.ivf_fit_centroids(emb, "embedding", n_clusters=4) is first
    load(spark, sf_dir, "embeddings")  # next query construction
    assert len(sim._CENTROID_CACHE) == 0
    refit = sim.ivf_fit_centroids(emb, "embedding", n_clusters=4)
    assert refit is not first and refit == first  # deterministic refit


def test_ivf_fit_empty_and_blocked_assignment(spark, sf_dir):
    """r14 advisor: an empty corpus raises a clear error (was a
    ZeroDivisionError in the tiny-corpus pad), and the row-blocked
    Lloyd's assignment (driver-memory bound at large k) is exactly
    equal to the unblocked expansion."""
    import numpy as np
    import pytest

    from xetl_spark.operators.similarity import (
        clear_centroid_cache,
        ivf_fit_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    empty = emb.filter("vec_id < 0")
    with pytest.raises(ValueError, match="no non-null"):
        ivf_fit_centroids(empty, "embedding", n_clusters=4, cache=False)
    # all-null vectors also count as empty (unit-norm drops nulls)
    from pyspark.sql import functions as F

    nulls = emb.limit(5).select(
        "vec_id", F.lit(None).cast("array<float>").alias("embedding")
    )
    with pytest.raises(ValueError, match="no non-null"):
        ivf_fit_centroids(nulls, "embedding", n_clusters=4, cache=False)
    # blocked == unblocked: shrink the block bound so the assignment
    # runs in many row blocks and assert bit-identical centroids
    import xetl_spark.operators.similarity as sim

    clear_centroid_cache()
    small = emb.limit(64)
    one_block = ivf_fit_centroids(small, "embedding", n_clusters=8, cache=False)
    old = sim._ASSIGN_BLOCK_ELEMS
    sim._ASSIGN_BLOCK_ELEMS = 8 * 7  # block of 7 rows at k=8
    try:
        many_blocks = ivf_fit_centroids(
            small, "embedding", n_clusters=8, cache=False
        )
    finally:
        sim._ASSIGN_BLOCK_ELEMS = old
    assert np.array_equal(np.asarray(one_block), np.asarray(many_blocks))


def test_hll_union_equals_direct_sketch(spark):
    """Sketch mergeability: union of split sketches estimates the same
    as one sketch over the union (deterministic, no RNG)."""
    from pyspark.sql import functions as F

    a = spark.range(0, 7000).select(F.hll_sketch_agg("id").alias("sk"))
    b = spark.range(5000, 12000).select(F.hll_sketch_agg("id").alias("sk"))
    direct = (
        spark.range(0, 12000)
        .select(F.hll_sketch_agg("id").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .first().e
    )
    merged = (
        a.unionByName(b)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .first().e
    )
    assert abs(merged - direct) <= 0.02 * direct + 2


def test_semdedup_planted_groups(spark):
    """SemDeDup (similarity.semdedup): planted near-copy triplets each
    collapse to exactly one keeper; distinct vectors all survive; the
    keeper is the group member FARTHEST from its centroid (lowest
    centroid cosine, min-id tiebreak)."""
    import numpy as np

    from xetl_spark.operators.similarity import semdedup

    rng = np.random.default_rng(7)
    rows = []
    for g in range(10):
        base = rng.standard_normal(16)
        for j in range(3):
            v = base + rng.standard_normal(16) * 0.01
            rows.append((g * 10 + j, [float(x) for x in v]))
    for i in range(20):
        rows.append((1000 + i, [float(x) for x in rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, "doc_id long, emb array<float>")
    out = semdedup(df, "emb", "doc_id", threshold=0.95, n_clusters=4).collect()
    assert len(out) == 50
    by_group: dict[int, list] = {}
    for r in out:
        by_group.setdefault(r["group"], []).append(r)
    multi = [m for m in by_group.values() if len(m) > 1]
    # all 10 planted triplets collapse, singletons self-keep
    assert len(multi) == 10
    assert sum(1 for r in out if r["keep"]) == 30
    for m in multi:
        keepers = [r for r in m if r["keep"]]
        assert len(keepers) == 1
        k = keepers[0]
        lo = min(r["centroid_sim"] for r in m)
        assert k["centroid_sim"] == lo  # farthest-from-centroid policy
    # determinism: same seed, same decisions
    again = semdedup(df, "emb", "doc_id", threshold=0.95, n_clusters=4).collect()
    assert {(r["id"], r["keep"]) for r in again} == {
        (r["id"], r["keep"]) for r in out
    }


def test_semdedup_cluster_locality_and_threshold(spark):
    """Dissimilar vectors never pair even inside one cluster (threshold
    respected), and an over-cap cluster is skipped, not exploded."""
    import numpy as np

    from xetl_spark.operators.similarity import semdedup

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, emb array<float>")
    out = semdedup(df, "emb", "doc_id", threshold=0.999, n_clusters=2).collect()
    # random gaussians virtually never reach cos >= 0.999
    assert all(r["keep"] for r in out)
    # cap guard: with max_cluster_size=1 every cluster is skipped
    out2 = semdedup(
        df, "emb", "doc_id", threshold=0.0, n_clusters=2, max_cluster_size=1
    ).collect()
    assert all(r["keep"] for r in out2)


def test_semdedup_oversized_cell_exemption_rate(spark):
    """r14 (verdict watch item): max_cluster_size SKIPS oversized
    cells, silently exempting every member from semantic dedup. This
    pins the exemption contract on a degenerate clustering: one giant
    planted-duplicate cell (over cap -> 100% of its members come back
    keep=True as singletons) next to a small duplicate cell (under cap
    -> collapses normally), with the exact exemption fraction
    asserted."""
    import numpy as np

    from xetl_spark.operators.similarity import semdedup

    rng = np.random.default_rng(3)
    rows = []
    # giant cell: 40 near-copies of one base vector (all land in one
    # k-means cell and all pair above threshold — the degenerate case)
    base = rng.standard_normal(16)
    for i in range(40):
        v = base + rng.standard_normal(16) * 0.005
        rows.append((i, [float(x) for x in v]))
    # small cell: 3 near-copies of an orthogonal-ish base
    base2 = rng.standard_normal(16)
    for j in range(3):
        v = base2 + rng.standard_normal(16) * 0.005
        rows.append((100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "doc_id long, emb array<float>")
    out = semdedup(
        df, "emb", "doc_id", threshold=0.95, n_clusters=2,
        max_cluster_size=10,
    ).collect()
    assert len(out) == 43
    giant = [r for r in out if r["id"] < 100]
    small = [r for r in out if r["id"] >= 100]
    # exemption: the over-cap cell's members ALL keep (each its own
    # singleton group) — 40/43 = 93% of this corpus escapes dedup
    assert all(r["keep"] for r in giant)
    assert all(r["group"] == r["id"] for r in giant)
    # the under-cap duplicate cell still collapses to one keeper
    assert sum(1 for r in small if r["keep"]) == 1
    exempt_frac = len(giant) / len(out)
    assert abs(exempt_frac - 40 / 43) < 1e-9
    # same corpus with the cap lifted: the giant group collapses too
    out2 = semdedup(
        df, "emb", "doc_id", threshold=0.95, n_clusters=2,
        max_cluster_size=None,
    ).collect()
    assert sum(1 for r in out2 if r["keep"]) == 2


def test_semdedup_adaptive_cell_ceiling_tracks_fit_sample(spark):
    """The adaptive n_clusters ceiling is max_fit_sample // 16 (>= 16
    fit points per centroid), not a hard 4096: shrinking the fit
    sample shrinks the ceiling in lockstep."""
    import numpy as np

    from xetl_spark.operators.similarity import semdedup

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)]) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, emb array<float>")
    # n/250 = 8 cells would be adaptive; max_fit_sample=512 caps the
    # ceiling at 512//16 = 32 (not binding here) — assert it RUNS and
    # every doc appears once with a cell in range
    out = semdedup(
        df, "emb", "doc_id", threshold=0.99, n_clusters=None,
        max_fit_sample=512,
    ).collect()
    assert len(out) == 2000
    assert all(0 <= r["cell"] < 32 for r in out)


def test_incremental_semdedup_screen_and_store_roundtrip(spark, tmp_path):
    """Cross-run semantic ingestion (similarity.incremental_semdedup):
    batch 1 drops its in-batch near-copy and seeds the store + fitted
    centroids; batch 2 — screened against the PARQUET-round-tripped
    store with the reused centroids — drops near-copies of stored
    vectors and of lower-id in-batch partners, keeps genuinely new
    ones, and never re-emits old rows."""
    import numpy as np

    from xetl_spark.operators.similarity import (
        incremental_semdedup,
        semdedup_load_store,
        semdedup_save_store,
    )

    rng = np.random.default_rng(11)
    v1, v2, v3 = (rng.standard_normal(16) for _ in range(3))

    def jitter(v):
        return [float(x) for x in (v + rng.standard_normal(16) * 0.001)]

    b1 = spark.createDataFrame(
        [(1, jitter(v1)), (2, jitter(v1)), (3, jitter(v2))],
        "vec_id long, emb array<float>",
    )
    fresh1, store1, ctr1 = incremental_semdedup(
        b1, None, None, "emb", "vec_id", n_clusters=2
    )
    assert sorted(r.vec_id for r in fresh1.collect()) == [1, 3]
    assert sorted(r.id for r in store1.collect()) == [1, 3]

    path = str(tmp_path / "sem_store")
    semdedup_save_store(store1, ctr1, path)
    store_l, ctr_l = semdedup_load_store(spark, path)
    assert sorted(r.cell for r in ctr_l.collect()) == sorted(
        r.cell for r in ctr1.collect()
    )

    # batch 2: 10 dups v1-store, 20 new v3, 21 dups 20 in-batch
    b2 = spark.createDataFrame(
        [(10, jitter(v1)), (20, jitter(v3)), (21, jitter(v3))],
        "vec_id long, emb array<float>",
    )
    fresh2, store2, ctr2 = incremental_semdedup(
        b2, store_l, ctr_l, "emb", "vec_id", n_clusters=2
    )
    assert sorted(r.vec_id for r in fresh2.collect()) == [20]
    assert sorted(r.id for r in store2.collect()) == [1, 3, 20]
    # centroids reused verbatim, not refitted
    got = {r.cell: list(r.centroid) for r in ctr2.collect()}
    want = {r.cell: list(r.centroid) for r in ctr_l.collect()}
    assert got == want

    # quadratic guard: cap of 1 skips every cell -> nothing dropped
    fresh_cap, _s, _c = incremental_semdedup(
        b2, store_l, ctr_l, "emb", "vec_id", n_clusters=2, max_bucket_size=1
    )
    assert fresh_cap.count() == 3


def test_fuzzy_decontaminate_persisted_eval_signatures(spark, tmp_path):
    """decontamination_signatures round-trips through parquet and
    screening against the persisted table flags exactly what the
    recompute-from-eval_df path flags."""
    from xetl_spark.operators.dedup import (
        decontamination_signatures,
        fuzzy_decontaminate,
    )

    shared = " ".join(f"w{i}" for i in range(30))
    corpus = spark.createDataFrame(
        [(1, shared), (2, "totally different text " + " ".join(f"z{i}" for i in range(25)))],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, shared + " tail")], "doc_id long, text string"
    )
    direct = sorted(
        (r.doc, r.eval_doc)
        for r in fuzzy_decontaminate(corpus, ev, "text", "doc_id").collect()
    )
    path = str(tmp_path / "eval_sigs")
    decontamination_signatures(ev, "text", "doc_id").write.parquet(path)
    sigs = spark.read.parquet(path)
    via_store = sorted(
        (r.doc, r.eval_doc)
        for r in fuzzy_decontaminate(
            corpus, None, "text", "doc_id", eval_signatures=sigs
        ).collect()
    )
    assert direct == via_store == [(1, 100)]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="eval_df or eval_signatures"):
        fuzzy_decontaminate(corpus, None, "text", "doc_id")


def test_ivfpq_recall_at_10_bound(spark):
    """IVF-PQ recall@10 floor on the sf0.001 embeddings with the
    ANN.md dials (probe 8/16, shortlist 400): deterministic seeds, so
    this pins the post-store-layout recall (measured 0.82 at sf0.1,
    round 10) instead of letting an encode/centroid regression coast.
    Ground truth is exact L2 in numpy."""
    import numpy as np

    from xetl_spark.operators.pq import ivfpq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r.vec_id for r in rows]
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    truth = {}
    for qr in queries.select("vec_id", "embedding").collect():
        d = ((x - np.asarray(qr.embedding)) ** 2).sum(1)
        truth[qr.vec_id] = {ids[i] for i in np.argsort(d, kind="stable")[:10]}
    got = {}
    res = ivfpq_topk(
        emb, queries, "embedding", n_cells=16, n_probe=8, k=10, shortlist=400
    ).collect()
    for r in res:
        got.setdefault(r[0], set()).add(r[1])
    recall = sum(len(truth[q] & got.get(q, set())) / 10 for q in truth) / len(truth)
    assert recall >= 0.7, f"IVF-PQ recall@10 regressed: {recall:.2f}"
