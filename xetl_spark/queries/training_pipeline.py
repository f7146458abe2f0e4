"""Training-data assembly operators: the last mile between a cleaned
corpus and an LLM training run — sequence packing into fixed token
budgets, temperature-weighted source mixing, and deterministic
shard assignment for reproducible global shuffles.

Everything here is deterministic by construction (multiplicative
integer hashing, not RNG), so each op carries a DuckDB oracle and
hash-verifies cross-engine:

- Pseudo-randomness is Knuth's multiplicative hash
  ``(key × 2654435761) mod 2³¹`` evaluated in exact BIGINT arithmetic
  (products stay far below 2⁶³), identical in both engines — unlike
  engine RNGs, which never agree across systems.
- Token counts use the corpus's materialized ``n_chars`` with the
  standard ~4-chars/token estimate in integer division; the exact
  BPE-ish counter lives in q_text_bpe_tokens.
- Temperature weights need ``pow(n, α)``: α = 0.5 makes that
  ``sqrt``, which IEEE 754 requires to be correctly rounded — both
  engines produce bit-identical doubles, so the keep-threshold
  comparison can't flip rows between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xetl_spark.queries import load, query

# Knuth multiplicative constant (2654435761 = floor(2^32 / phi)).
_KNUTH = 2654435761
_MOD31 = 2_147_483_648  # 2^31


@query(
    "q_pack_sequences",
    oracle="""
    WITH toks AS (
      SELECT doc_id, doc_id % 32 AS shard,
             greatest(1, n_chars // 4) AS tok
      FROM documents
    ),
    placed AS (
      SELECT shard, doc_id, tok,
             -- DuckDB windows/sums promote to HUGEINT (→ float64 in
             -- pandas); pin BIGINT so value hashes compare as ints
             CAST((sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - tok) // 2048
                  AS BIGINT) AS bin
      FROM toks
    )
    SELECT shard, bin, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS bin_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM placed GROUP BY 1, 2
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: concatenate documents in stable
    (shard, doc_id) order and cut at a 2048-token budget — each doc's
    bin is the budget-window its *starting* offset falls in, the
    standard concat-and-split packing used for LLM pretraining
    batches. A document straddling a boundary stays in its starting
    bin (real pipelines splice text across the cut; bin accounting
    follows the start).

    Scale: one window over (shard, doc_id) — 32-way parallel streaming
    cumsum, no driver state; the final rollup groups on (shard, bin).
    At 100 TB raise the shard count to O(cluster cores); the plan is
    unchanged.
    """
    (docs,) = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 32).alias("shard"),
        F.greatest(F.lit(1), F.col("n_chars") / F.lit(4)).cast("long").alias("tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn(
        "bin", ((F.sum("tok").over(w) - F.col("tok")) / 2048).cast("long")
    )
    return placed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("tok").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@query(
    "q_mix_sources_temperature",
    oracle=f"""
    WITH rates AS (
      SELECT source, count(*) AS n_docs,
             sqrt(CAST(count(*) AS DOUBLE))
               / max(sqrt(CAST(count(*) AS DOUBLE))) OVER () AS keep_rate
      FROM documents GROUP BY source
    )
    SELECT d.source, any_value(r.n_docs) AS n_docs,
           round(any_value(r.keep_rate), 6) AS keep_rate,
           count(*) FILTER (
             WHERE CAST((d.doc_id * {_KNUTH}) % {_MOD31} AS DOUBLE)
                   / {_MOD31} < r.keep_rate
           ) AS n_kept
    FROM documents d JOIN rates r USING (source)
    GROUP BY d.source
    """,
)
def q_mix_sources_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (α = 0.5): per-source keep
    rates ∝ n^α normalized to the largest source, so over-represented
    sources are down-sampled toward balance — the multilingual /
    multi-source rebalancing recipe from the mT5/XLM-R lineage. Doc
    selection is the deterministic per-doc hash-uniform draw, so the
    sample is reproducible run-over-run and engine-over-engine (no
    RNG), and resuming a pipeline re-selects the identical subset.

    Scale: a tiny per-source rate table (one row per source) joined
    back broadcast; selection is a stateless map over the fact —
    no shuffle beyond the rate aggregation itself.
    """
    (docs,) = load(spark, sf_dir, "documents")
    rates = docs.groupBy("source").agg(F.count("*").alias("n_docs"))
    max_w = rates.agg(F.max(F.sqrt(F.col("n_docs").cast("double"))).alias("mw"))
    rates = rates.join(F.broadcast(max_w)).select(
        "source",
        "n_docs",
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("mw")).alias("keep_rate"),
    )
    u = ((F.col("doc_id") * _KNUTH) % _MOD31).cast("double") / F.lit(_MOD31)
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.any_value("n_docs").alias("n_docs"),
            F.round(F.any_value("keep_rate"), 6).alias("keep_rate"),
            F.count(F.when(u < F.col("keep_rate"), 1)).alias("n_kept"),
        )
    )


@query(
    "q_shard_assignment",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id,
             ((doc_id * {_KNUTH}) % {_MOD31}) % 64 AS shard,
             greatest(1, n_chars // 4) AS tok
      FROM documents
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS shard_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM assigned GROUP BY shard
    """,
)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle-shard assignment: each document
    lands in one of 64 shards via the multiplicative hash of its id —
    a seeded, order-free permutation that decorrelates adjacent doc
    ids (crawl order, source order) from shard membership. The output
    is the shard manifest (doc/token counts per shard) a training job
    reads to schedule epochs; balance across shards is a property test.

    Scale: stateless map + one 64-group rollup. Writing the actual
    shards is `df.repartition(64, hash).write` with the same
    expression — assignment and physical partitioning share the key,
    so no second shuffle.
    """
    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            (((F.col("doc_id") * _KNUTH) % _MOD31) % 64).alias("shard"),
            F.greatest(F.lit(1), F.col("n_chars") / F.lit(4))
            .cast("long")
            .alias("tok"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("shard_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def pack_greedy(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tok_col: str = "tok",
    shard_col: str = "shard",
) -> DataFrame:
    """True greedy bin packing with reset (bins never exceed ``budget``
    unless a single document does): within each shard, walk documents
    in id order and open a new bin whenever the next doc would
    overflow the current one. Unlike q_pack_sequences' concat-and-cut,
    no bin mixes a document across the boundary — the layout for
    padded (non-spliced) batch construction.

    Sequential per shard, parallel across shards: Arrow-batched
    ``applyInPandas`` holds one shard in memory at a time, so shard
    count — not corpus size — bounds parallelism and per-task memory.
    Returns the input with a ``bin`` column appended.
    """
    import pandas as pd

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in docs.schema.fields
    ) + ", bin long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, cur_bin, cur_fill = [], 0, 0
        for t in pdf[tok_col].astype("int64"):
            if cur_fill and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            bins.append(cur_bin)
            cur_fill += t
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    return docs.groupBy(shard_col).applyInPandas(pack, schema=out_schema)


@query(
    "q_pack_greedy",
    oracle="""
    WITH RECURSIVE ordered AS (
      SELECT doc_id, doc_id % 32 AS shard, greatest(1, n_chars // 4) AS tok,
             row_number() OVER (PARTITION BY doc_id % 32 ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT shard, rn, tok, CAST(0 AS BIGINT) AS bin, tok AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.tok,
             CASE WHEN p.fill > 0 AND p.fill + o.tok > 2048
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.fill > 0 AND p.fill + o.tok > 2048
                  THEN o.tok ELSE p.fill + o.tok END
      FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT shard, bin, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY 1, 2
    """,
)
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy no-overflow packing manifest over the documents corpus.
    The greedy recurrence is sequential per shard — Spark runs it as a
    per-shard applyInPandas fold, and the ORACLE expresses the same
    fold as a recursive CTE stepping one row per shard per iteration
    (recursion depth = rows/shard), so even this stateful operator is
    hash-verified cross-engine. Capacity/completeness/determinism are
    additionally property-tested in tests/test_training_pipeline.py."""
    (docs,) = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 32).alias("shard"),
        F.greatest(F.lit(1), F.col("n_chars") / F.lit(4)).cast("long").alias("tok"),
    )
    packed = pack_greedy(toks, budget=2048)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"), F.sum("tok").alias("bin_tokens")
    )


@query(
    "q_sample_weighted",
    oracle="""
    SELECT doc_id, n_chars, source FROM documents
    WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) * 4000
          < n_chars * 4294967296
    """,
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sampling (importance sampling): each doc
    is kept with probability min(1, n_chars/4000), decided by a pure
    integer test on md5(doc_id) (operators/relational.py
    weighted_sample) — reproducible across runs, partitionings, and
    engines, and pushed down as a plain scan filter (no shuffle, no
    RNG state, retry-safe)."""
    from xetl_spark.operators import weighted_sample

    (docs,) = load(spark, sf_dir, "documents")
    return weighted_sample(docs, "n_chars", ["doc_id"], scale=4000).select(
        "doc_id", "n_chars", "source"
    )
