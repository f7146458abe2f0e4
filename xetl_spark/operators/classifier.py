"""Model-based quality filtering — the CCNet / fastText-classifier
recipe every modern pretraining corpus runs (label a few thousand
docs good/bad, train a linear classifier on hashed n-gram features,
score the whole corpus, keep the top band).

Implementation is a transparent distributed logistic regression rather
than an opaque library call, so the scale story is auditable:

- **Features** (pure Catalyst): lowercase word unigrams + bigrams,
  hashed to ``num_features`` buckets with ``xxhash64`` — computed in
  the scan stage, no vocabulary to build or broadcast.
- **Training** (full-batch gradient descent, deterministic): per
  iteration, the current weight vector (a few hundred KB) ships to
  executors inside an Arrow-batched pandas UDF that computes each
  document's margin; the gradient is one ``explode → groupBy(bucket)
  → sum`` with map-side partial aggregation, and the driver collect
  is bounded by ``num_features`` rows (the same bounded-collect
  contract as operators/pca.py) — never by corpus size. Cost:
  ``iters`` shuffles of at most ``num_features`` rows each.
- **Scoring** (one map stage): broadcast weights, sigmoid margin per
  document, no shuffle.

Fixed iteration count + full-batch updates make training exactly
reproducible; tests pin it against a single-machine numpy reference
on the same features.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["QualityModel", "hashed_text_features", "train_quality_classifier", "score_quality"]


def hashed_text_features(text: Column | str, num_features: int = 1 << 15) -> Column:
    """array<int> of hashed unigram + bigram buckets (pure Catalyst).

    NULL text is treated as the empty document (empty feature array, only
    the bias bucket fires downstream) — corpora routinely carry NULL text
    rows (e.g. failed extractions) and one of them must not kill a job.
    Bigrams are built from two aligned length-(n-1) slices so there is no
    zip_with null padding: every feature is a real n-gram hash.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(
        F.split(F.lower(F.coalesce(c, F.lit(""))), r"[^a-z0-9]+"),
        lambda t: t != F.lit(""),
    )
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, 1, n1), F.slice(toks, 2, n1),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.transform(
        F.concat(toks, bigrams),
        lambda t: F.pmod(F.xxhash64(t), F.lit(num_features)).cast("int"),
    )


@dataclass
class QualityModel:
    weights: np.ndarray  # [num_features + 1], last entry = bias
    num_features: int


def _feats_with_bias(text_col: str, num_features: int) -> Column:
    """Feature array + a constant bias bucket (index ``num_features``)
    so the bias trains through the same explode/groupBy gradient as
    every other weight."""
    return F.concat(
        hashed_text_features(text_col, num_features),
        F.array(F.lit(num_features).cast("int")),
    )


def _margin_schema(df: DataFrame, id_col: str) -> str:
    """mapInPandas output schema with ``id`` keeping the SOURCE id
    column's type — ids may be longs or strings (e.g. file paths from
    binaryFile ingestion); a hardcoded ``id long`` fails deep inside
    Arrow on string keys (same contract as multimodal._id_typed)."""
    id_type = df.schema[id_col].dataType.simpleString()
    return f"id {id_type}, label double, margin double"


def _margin_udf(weights: np.ndarray):
    w = weights  # closure-captured; shipped once per task via pickle

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            margins = np.empty(len(pdf))
            for i, idxs in enumerate(pdf["feats"]):
                # defensive: a NULL feature array scores as the empty doc
                a = np.asarray(idxs if idxs is not None else (), dtype=np.int64)
                margins[i] = w[a].sum()
            out = pdf.drop(columns=["feats"]).copy()
            out["margin"] = margins
            yield out

    return compute


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    num_features: int = 1 << 15,
    iters: int = 30,
    lr: float = 0.5,
    l2: float = 1e-6,
) -> QualityModel:
    """Fit the classifier on (text, 0/1 label) rows. Deterministic:
    full-batch GD, fixed ``iters``, zero-initialized weights."""
    feats = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("double").alias("label"),
        _feats_with_bias(text_col, num_features).alias("feats"),
    ).persist()
    try:
        n = feats.count()  # also materializes the persisted features
        if n == 0:
            raise ValueError("empty training set")
        w = np.zeros(num_features + 1)
        schema = _margin_schema(df, id_col)
        for _ in range(iters):
            scored = feats.mapInPandas(_margin_udf(w), schema=schema)
            err = scored.select(
                "id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
                    - F.col("label")
                ).alias("err"),
            )
            grad_rows = (
                feats.join(err, "id")
                .select(F.explode("feats").alias("bucket"), "err")
                .groupBy("bucket")
                .agg(F.sum("err").alias("g"))
                .collect()  # bounded: ≤ num_features rows by construction
            )
            grad = np.zeros(num_features + 1)
            for r in grad_rows:
                grad[r["bucket"]] = r["g"]
            w -= lr * (grad / n + l2 * w)
        return QualityModel(weights=w, num_features=num_features)
    finally:
        feats.unpersist()


def score_quality(
    df: DataFrame,
    model: QualityModel,
    text_col: str,
    id_col: str,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score a corpus: one map stage, no shuffle; probability of the
    positive (high-quality) class per document."""
    feats = df.select(
        F.col(id_col).alias("id"),
        F.lit(0.0).alias("label"),
        _feats_with_bias(text_col, model.num_features).alias("feats"),
    )
    scored = feats.mapInPandas(
        _margin_udf(model.weights), schema=_margin_schema(df, id_col)
    )
    return scored.select(
        "id",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias(out_col),
    )
