"""Model-based quality filtering (operators/classifier.py): the
distributed full-batch logistic regression must match a single-machine
numpy reference exactly (same features, same schedule), and learn a
planted quality signal."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xetl_spark.operators.classifier import (
    QualityModel,
    hashed_text_features,
    score_quality,
    train_quality_classifier,
)

GOOD = ["insightful", "rigorous", "detailed", "coherent"]
BAD = ["clickbait", "spammy", "garbled", "lorem"]


def _corpus(n=120, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(n):
        label = i % 2
        words = list(rng.choice(vocab, 12))
        markers = GOOD if label else BAD
        for _ in range(3):
            words.insert(int(rng.integers(0, len(words))), str(rng.choice(markers)))
        rows.append((i, " ".join(words), label))
    return rows


def test_training_matches_numpy_reference(spark):
    rows = _corpus(n=60)
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    nf, iters, lr, l2 = 1 << 10, 12, 0.5, 1e-6
    model = train_quality_classifier(
        df, "text", "label", "doc_id", num_features=nf, iters=iters, lr=lr, l2=l2
    )

    # numpy reference on the SAME hashed features (pulled from Spark so
    # the hash function is shared; GD schedule reimplemented locally)
    feats = (
        df.select(
            "doc_id", "label", hashed_text_features("text", nf).alias("f")
        )
        .orderBy("doc_id")
        .collect()
    )
    X = [np.r_[np.asarray(r["f"], dtype=np.int64), nf] for r in feats]
    y = np.array([r["label"] for r in feats], dtype=float)
    w = np.zeros(nf + 1)
    for _ in range(iters):
        grad = np.zeros(nf + 1)
        for xi, yi in zip(X, y):
            err = 1.0 / (1.0 + np.exp(-w[xi].sum())) - yi
            np.add.at(grad, xi, err)
        w -= lr * (grad / len(X) + l2 * w)
    assert np.allclose(model.weights, w, atol=1e-9)


def test_classifier_learns_planted_signal(spark):
    rows = _corpus(n=120)
    train = [r for r in rows if r[0] % 3 != 0]
    held = [r for r in rows if r[0] % 3 == 0]
    tdf = spark.createDataFrame(train, "doc_id long, text string, label int")
    model = train_quality_classifier(
        tdf, "text", "label", "doc_id", num_features=1 << 12, iters=20
    )
    hdf = spark.createDataFrame(held, "doc_id long, text string, label int")
    scored = score_quality(hdf, model, "text", "doc_id")
    got = {r["id"]: r["quality_prob"] for r in scored.collect()}
    correct = sum(
        1 for did, _t, lab in held if (got[did] >= 0.5) == bool(lab)
    )
    assert correct / len(held) >= 0.95
    # scoring is deterministic
    again = {r["id"]: r["quality_prob"] for r in scored.collect()}
    assert got == again


def test_features_no_null_padding_artifact(spark):
    """Bigrams come from aligned slices, so no zip_with null padding:
    no spurious constant xxhash64(NULL)=seed feature, and a k-token doc
    yields exactly k unigrams + (k-1) bigrams."""
    df = spark.createDataFrame(
        [("hello world foo",), ("single",), ("",), (None,)], "text string"
    )
    rows = df.select(hashed_text_features("text", 1 << 10).alias("f")).collect()
    assert [len(r["f"]) for r in rows] == [5, 1, 0, 0]
    for r in rows:
        assert all(v is not None for v in r["f"])


def test_null_text_rows_survive_train_and_score(spark):
    """NULL text is the empty document — it must not crash training or
    scoring (corpora carry NULL text from failed extractions)."""
    rows = _corpus(n=40)
    rows = rows + [(1000, None, 0), (1001, None, 1)]
    df = spark.createDataFrame(rows, "doc_id long, text string, label int")
    model = train_quality_classifier(
        df, "text", "label", "doc_id", num_features=1 << 10, iters=3
    )
    scored = score_quality(df, model, "text", "doc_id").collect()
    assert len(scored) == len(rows)
    probs = {r["id"]: r["quality_prob"] for r in scored}
    # both NULL docs score identically (bias-only margin)
    assert probs[1000] == probs[1001]


def test_string_id_column(spark):
    """The quality_filter surface exposes ID_COLUMN generically — string
    ids (e.g. file paths) must work end-to-end."""
    rows = [(f"path/{i}.txt", t, lab) for i, t, lab in _corpus(n=40)]
    df = spark.createDataFrame(rows, "path string, text string, label int")
    model = train_quality_classifier(
        df, "text", "label", "path", num_features=1 << 10, iters=3
    )
    scored = score_quality(df, model, "text", "path").collect()
    assert len(scored) == len(rows)
    assert all(isinstance(r["id"], str) for r in scored)


def test_empty_training_set_raises(spark):
    df = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty"):
        train_quality_classifier(df, "text", "label", "doc_id", iters=1)


def test_quality_filter_builtin_task(spark, tmp_path):
    """Declarative corpus filter: train on a labeled stage, keep only
    high-scoring rows of the main stage."""
    import textwrap

    from xetl_spark.plans.models import Job
    from xetl_spark.plans.runner import run_job

    rows = _corpus(n=90)
    train = [r for r in rows if r[0] < 60]
    corpus = [(i, t) for i, t, _l in rows if i >= 60]
    tdir, cdir = tmp_path / "train", tmp_path / "corpus"
    spark.createDataFrame(train, "doc_id long, text string, label int").write.parquet(str(tdir))
    spark.createDataFrame(corpus, "doc_id long, text string").write.parquet(str(cdir))
    job = Job.from_yaml(
        textwrap.dedent(
            f"""
            name: qf
            commands:
              - {{name: labeled, task: read_parquet, env: {{PATH: {tdir}}}}}
              - {{name: corpus, task: read_parquet, env: {{PATH: {cdir}}}}}
              - name: kept
                task: quality_filter
                env: {{TRAIN: labeled, INPUT: corpus, ITERS: 10, FEATURES: 4096}}
            """
        )
    )
    results = run_job(spark, job)
    kept = {r.doc_id for r in results[-1].output.collect()}
    want_good = {i for i, _t, lab in rows if i >= 60 and lab == 1}
    # planted signal is strong: the filter keeps (almost exactly) the good half
    assert len(kept ^ want_good) <= 2
    # score column survives for downstream band selection
    assert "quality_prob" in results[-1].output.columns
