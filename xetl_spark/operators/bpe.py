"""Distributed byte-pair-encoding tokenizer: merge-table learning and
corpus encoding as DataFrame pipelines.

The brief's baseline is a BPE-ish regex counter (operators/text.py);
this is the real algorithm (Sennrich et al. 2016, the GPT-2 tokenizer
family), shaped for scale:

- ``bpe_train`` never iterates over the corpus. One pass pre-tokenizes
  and aggregates a WORD-FREQUENCY HISTOGRAM (one shuffle, keyed by
  distinct word piece — bounded by vocabulary, not corpus size); every
  merge iteration then runs on the histogram alone: one pair-count
  shuffle + a vectorized merge-apply, with a single-row collect for
  the argmax pair. Lineage is truncated with localCheckpoint every few
  iterations (same pattern as operators/graph.py).
- Ties on pair frequency break lexicographically, so the learned merge
  table is deterministic for a given corpus regardless of
  partitioning.
- ``bpe_encode`` pre-tokenizes JVM-side (the same regexp the counter
  uses — no Python/JVM regex drift) and applies the merge table in an
  Arrow-batched pandas UDF with the ranking dict in the closure (the
  merge table is vocab-sized: broadcast-tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xetl_spark.operators.util import ensure_parallelism

# GPT-2-style pre-tokenization (shared with bpe_ish_token_count)
_PRETOKEN = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def _pretokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(_PRETOKEN), F.lit(0))


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Standard left-to-right non-overlapping merge of one pair."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    df: DataFrame,
    text_col: str,
    num_merges: int = 50,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns the merge
    list in learned order (rank = list position). The driver holds only
    the merge table and one argmax row per iteration — the histogram
    stays distributed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    hist = (
        ensure_parallelism(df)
        .select(F.explode(_pretokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .withColumn("syms", F.split("w", ""))
        .drop("w")
        .persist()
    )
    hist.count()  # materialize before the loop

    merges: list[tuple[str, str]] = []
    pending_release = None  # unpersisted once its successor is cached
    for it in range(num_merges):
        pairs = (
            hist.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                        F.slice("syms", 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                    )
                ).alias("p"),
            )
            .select("freq", F.col("p.0").alias("a"), F.col("p.1").alias("b"))
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")  # deterministic tie-break
            .limit(1)
            .collect()
        )
        # the collect just materialized hist into its persist cache —
        # the previous generation can now release without forcing a
        # dedicated count() job per iteration
        if pending_release is not None:
            pending_release.unpersist()
            pending_release = None
        if not pairs or pairs[0]["n"] < 2:
            break
        pair = (pairs[0]["a"], pairs[0]["b"])
        merges.append(pair)

        def _apply_factory(p: tuple[str, str]):
            # factory scope: the UDF closes over ITS OWN pair binding,
            # so a cache-evicted partition recomputing later still
            # applies the right merge (a loop-variable closure would
            # see the latest pair instead)
            def _apply(s):
                return pd.Series([_merge_word(list(x), p) for x in s])

            return pandas_udf(_apply, "array<string>")

        apply_merge = _apply_factory(pair)

        prev = hist
        hist = hist.withColumn("syms", apply_merge("syms"))
        if (it + 1) % checkpoint_every == 0:
            hist = hist.localCheckpoint()  # eager: truncates the chain
            prev.unpersist()
        else:
            hist = hist.persist()  # lazily filled by the next collect
            pending_release = prev
    if pending_release is not None:
        pending_release.unpersist()
    hist.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize with a learned merge table → (id, tokens, n_tokens).

    Pre-tokenization runs JVM-side; the pandas UDF applies merges per
    piece in rank order with the greedy lowest-rank-first rule (the
    GPT-2 algorithm), memoized per distinct piece within each batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rank = {p: i for i, p in enumerate(merges)}

    def encode_piece(piece: str, cache: dict) -> list[str]:
        got = cache.get(piece)
        if got is not None:
            return got
        syms = list(piece)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                break
            syms = _merge_word(syms, merges[best[0]])
        cache[piece] = syms
        return syms

    @pandas_udf("array<string>")
    def encode(s):
        cache: dict = {}
        return pd.Series(
            [[t for p in pieces for t in encode_piece(p, cache)] for pieces in s]
        )

    return (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _pretokens(text_col).alias("__pieces"))
        .select("id", encode("__pieces").alias("tokens"))
        .withColumn("n_tokens", F.size("tokens"))
    )


def bpe_train_reference(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """Single-process reference implementation (tests cross-validate
    the distributed trainer against this)."""
    import re
    from collections import Counter

    # ASCII rendering of the JVM pre-token regex (\p{L}/\p{N}); exact
    # for the ASCII test fixtures this reference is used with
    pat = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+")
    hist: Counter = Counter()
    for t in texts:
        for piece in pat.findall(t):
            hist[piece] += 1
    words = {w: list(w) for w in hist}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, syms in words.items():
            f = hist[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        words = {w: _merge_word(s, best[0]) for w, s in words.items()}
    return merges
