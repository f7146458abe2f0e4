"""Distributed BPE (operators/bpe.py): merge learning cross-validated
against a single-process reference, encode round-trip/consistency
properties, and determinism under repartitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xetl_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    bpe_train_reference,
)

CORPUS = (
    ["low low low low low lower lower newest newest newest newest newest"] * 3
    + ["the quick brown fox, the quick fox! newest low's"]
    + ["widest widest widest wide wide new new news"]
)


@pytest.fixture(scope="module")
def merges(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    return bpe_train(df, "text", num_merges=15)


def test_train_matches_reference(merges):
    assert merges == bpe_train_reference(CORPUS, 15)


def test_train_is_partitioning_independent(spark, merges):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string").repartition(7)
    assert bpe_train(df, "text", num_merges=15) == merges


def test_encode_roundtrip_and_compression(spark, merges):
    df = spark.createDataFrame(
        [(0, "newest lowest fox"), (1, "the quick brown fox"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in bpe_encode(df, "text", merges).collect()}
    # lossless: concatenating tokens reproduces the input exactly
    assert "".join(rows[0].tokens) == "newest lowest fox"
    assert "".join(rows[1].tokens) == "the quick brown fox"
    assert rows[2].tokens == [] and rows[2].n_tokens == 0
    # merges compress: fewer tokens than characters for in-vocab text
    assert rows[0].n_tokens < len("newest lowest fox")
    # learned units surface as single tokens
    assert "est" in rows[0].tokens or " new" in rows[0].tokens


def test_encode_greedy_rank_rule(spark):
    """Lowest-rank merge applies first regardless of position — the
    GPT-2 greedy rule, distinct from training-order replay."""
    df = spark.createDataFrame([(0, "abcbc")], "doc_id long, text string")
    # rank 0: (b, c) ; rank 1: (a, b) — 'ab' can never form because
    # 'bc' merges first
    (row,) = bpe_encode(df, "text", [("b", "c"), ("a", "b")]).collect()
    assert row.tokens == ["a", "bc", "bc"]


def test_train_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    got = bpe_train(df, "text", num_merges=50)
    assert len(got) < 50  # every pair unique -> early stop, no padding
