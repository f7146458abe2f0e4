"""Training-data assembly: greedy packing invariants, deterministic
mixing/sharding properties (the non-SQL-expressible side of
xetl_spark/queries/training_pipeline.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xetl_spark.queries.training_pipeline import pack_greedy

BUDGET = 64


@pytest.fixture(scope="module")
def toks(spark):
    # ids deliberately interleaved across shards; one oversize doc (90
    # tokens > budget) and several exact-fit sizes to hit boundaries
    rows = [(i, i % 4, t) for i, t in enumerate([7, 64, 30, 33, 90, 1, 63, 2, 31, 31, 31, 5])]
    return spark.createDataFrame(rows, "doc_id long, shard long, tok long")


def test_pack_greedy_capacity_and_completeness(spark, toks):
    packed = pack_greedy(toks, budget=BUDGET).collect()
    # every doc assigned exactly once
    assert sorted(r.doc_id for r in packed) == sorted(r.doc_id for r in toks.collect())
    fills: dict[tuple, int] = {}
    docs_per_bin: dict[tuple, list] = {}
    for r in packed:
        fills[(r.shard, r.bin)] = fills.get((r.shard, r.bin), 0) + r.tok
        docs_per_bin.setdefault((r.shard, r.bin), []).append(r)
    for key, fill in fills.items():
        members = docs_per_bin[key]
        # a bin only exceeds the budget when a single oversize doc owns it
        assert fill <= BUDGET or (len(members) == 1 and members[0].tok > BUDGET), (
            key,
            fill,
            members,
        )


def test_pack_greedy_respects_id_order_within_shard(spark, toks):
    packed = sorted(pack_greedy(toks, budget=BUDGET).collect(), key=lambda r: (r.shard, r.doc_id))
    for a, b in zip(packed, packed[1:]):
        if a.shard == b.shard:
            assert b.bin >= a.bin  # bins open monotonically along id order


def test_pack_greedy_deterministic(spark, toks):
    a = sorted(map(tuple, pack_greedy(toks, budget=BUDGET).collect()))
    b = sorted(map(tuple, pack_greedy(toks, budget=BUDGET).collect()))
    assert a == b


def test_pack_greedy_never_splits_vs_cumsum_packing(spark, sf_dir):
    """Greedy (no-overflow) bins are at least as numerous as
    concat-and-cut bins, and no greedy bin crosses the budget."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(300)
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.greatest(F.lit(1), F.col("n_chars") / 4).cast("long").alias("tok"),
    )
    packed = pack_greedy(t, budget=512)
    per_bin = packed.groupBy("shard", "bin").agg(F.sum("tok").alias("fill"), F.count("*").alias("n"))
    bad = per_bin.filter((F.col("fill") > 512) & (F.col("n") > 1)).count()
    assert bad == 0
    n_greedy = per_bin.count()
    total = t.agg(F.sum("tok")).first()[0]
    assert n_greedy >= -(-total // 512) - 8  # ≥ lower bound minus per-shard slack


def test_temperature_mixing_rates_and_determinism(spark, sf_dir):
    import xetl_spark.queries as Q

    q = Q.REGISTRY["q_mix_sources_temperature"].fn
    a = {r.source: (r.n_docs, r.keep_rate, r.n_kept) for r in q(spark, sf_dir).collect()}
    b = {r.source: (r.n_docs, r.keep_rate, r.n_kept) for r in q(spark, sf_dir).collect()}
    assert a == b  # hash-based selection: no RNG, rerun-identical
    biggest = max(a.values(), key=lambda v: v[0])
    assert biggest[1] == pytest.approx(1.0)  # largest source keeps everything
    for n_docs, rate, n_kept in a.values():
        assert 0 < rate <= 1.0
        assert n_kept <= n_docs
        # hash-uniform selection tracks the target rate (binomial 5σ)
        import math

        sigma = math.sqrt(n_docs * rate * (1 - rate))
        assert abs(n_kept - n_docs * rate) <= 5 * sigma + 1


def test_shard_assignment_balance(spark, sf_dir):
    import xetl_spark.queries as Q

    rows = Q.REGISTRY["q_shard_assignment"].fn(spark, sf_dir).collect()
    assert len(rows) == 64
    counts = [r.n_docs for r in rows]
    n = sum(counts)
    # multiplicative hashing spreads sequential ids near-uniformly:
    # every shard within 4x of the mean (loose, but catches stride bugs
    # like all-even shards empty)
    assert min(counts) > 0
    assert max(counts) <= 4 * n / 64


def test_training_tasks_in_job_manifest(spark, tmp_path):
    """pack / mix_sources / shard as pipeline stages: a YAML manifest
    counts tokens, rebalances sources, packs bins, and shards output."""
    import textwrap

    from pyspark.sql import functions as F

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    out = tmp_path / "shards"
    job = Job.from_yaml(
        textwrap.dedent(
            f"""
            name: prep
            data: {tmp_path}
            env: {{SF_DIR: /root/testdata/sf0.001}}
            commands:
              - name: docs
                task: read_parquet
                env: {{PATH: "${{SF_DIR}}/documents.parquet"}}
              - name: toks
                task: sql
                env: {{QUERY: "SELECT doc_id, source,
                               greatest(1, n_chars div 4) AS tok FROM docs"}}
              - name: mixed
                task: mix_sources
                env: {{ALPHA: 0.5}}
              - name: packed
                task: pack
                env: {{BUDGET: 512, SHARDS: 8}}
              - name: sharded
                task: shard
                env: {{INPUT: mixed, SHARDS: 4, PATH: {out}}}
            """
        )
    )
    results = run_job(spark, job)
    assert [r.status for r in results] == ["success"] * 5
    docs_n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    mixed = results[2].output
    packed = results[3].output
    assert 0 < mixed.count() <= docs_n
    # every mixed doc got a bin, and no multi-doc bin exceeds budget
    assert packed.count() == mixed.count()
    bad = (
        packed.groupBy("shard", "bin")
        .agg(F.sum("tok").alias("fill"), F.count("*").alias("n"))
        .filter((F.col("fill") > 512) & (F.col("n") > 1))
        .count()
    )
    assert bad == 0
    # shard task wrote one directory per shard, round-trippable
    sharded = spark.read.parquet(str(out))
    assert sharded.count() == mixed.count()
    assert sharded.select("shard").distinct().count() == 4


def test_pack_greedy_hypothesis_invariants(spark):
    """Property fuzz: for arbitrary token lists and budgets, greedy
    packing preserves membership, respects capacity (modulo oversize
    singletons), and never reorders within a shard."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        toks=st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=40),
        budget=st.integers(min_value=8, max_value=96),
    )
    def check(toks, budget):
        rows = [(i, i % 3, t) for i, t in enumerate(toks)]
        df = spark.createDataFrame(rows, "doc_id long, shard long, tok long")
        packed = sorted(
            pack_greedy(df, budget=budget).collect(),
            key=lambda r: (r.shard, r.doc_id),
        )
        assert sorted(r.doc_id for r in packed) == list(range(len(toks)))
        fills: dict[tuple, list] = {}
        for r in packed:
            fills.setdefault((r.shard, r.bin), []).append(r.tok)
        for members in fills.values():
            assert sum(members) <= budget or (
                len(members) == 1 and members[0] > budget
            )
        for a, b in zip(packed, packed[1:]):
            if a.shard == b.shard:
                assert b.bin >= a.bin

    check()
