"""Distributed PCA (operators/pca.py): exact agreement with numpy's
eigendecomposition of the collected matrix, projection correctness,
and partitioning independence."""

from __future__ import annotations

import numpy as np
import pytest

from xetl_spark.operators.pca import pca_fit, pca_project


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_ref(X: np.ndarray, k: int):
    cov = np.cov(X, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for i in range(k):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return evals[order], comps


def test_pca_matches_numpy(spark, emb):
    model = pca_fit(emb, "embedding", k=8)
    X = np.array([r.embedding for r in emb.select("embedding").collect()], np.float64)
    ref_var, ref_comps = _numpy_ref(X, 8)
    assert np.allclose(model["explained_variance"], ref_var, rtol=1e-8)
    assert np.allclose(np.asarray(model["components"]), ref_comps, atol=1e-8)
    # variance ordering is descending
    ev = model["explained_variance"]
    assert all(a >= b for a, b in zip(ev, ev[1:]))


def test_pca_projection_and_partitioning(spark, emb):
    model = pca_fit(emb, "embedding", k=4)
    proj = pca_project(emb, "embedding", model)
    rows = proj.select("vec_id", "embedding", "pca").limit(50).collect()
    mean = np.asarray(model["mean"])
    comps = np.asarray(model["components"])
    for r in rows:
        exp = (np.asarray(r.embedding, np.float64) - mean) @ comps.T
        assert np.allclose(np.asarray(r.pca), exp, atol=1e-8)
    # repartitioned input → same model (fixed combine order)
    m2 = pca_fit(emb.repartition(13), "embedding", k=4)
    assert np.allclose(
        m2["explained_variance"], model["explained_variance"], rtol=1e-9
    )
    assert np.allclose(
        np.asarray(m2["components"]), np.asarray(model["components"]), atol=1e-9
    )


def test_pca_empty_raises(spark, emb):
    with pytest.raises(ValueError, match="empty"):
        pca_fit(emb.filter("vec_id < 0"), "embedding", k=2)
