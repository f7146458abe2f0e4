"""Distributed PCA over embedding columns.

The scale shape is the textbook one for d ≪ n: each partition reduces
its rows to a single (count, Σx, ΣxxT) moment row inside an
Arrow-batched mapInPandas (one BLAS syrk per batch), the driver
combines #partitions moment rows (bounded by cluster parallelism, not
data size) and eigendecomposes the d×d covariance — d=64 here, a 4 KB
matrix. Projection is then one matmul per batch executor-side. No
shuffle anywhere: the moments pass is map-only + a tiny collect, and
projection is a map.

Deterministic: moments are summed in a fixed driver-side order and
eigenvectors sign-normalized (largest-|component| coordinate made
positive), so results are partitioning-independent up to float
addition order in the per-partition syrk (validated against numpy PCA
on the collected matrix in tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xetl_spark.operators.util import ensure_parallelism


def pca_fit(df: DataFrame, vec_col: str, k: int) -> dict:
    """Fit PCA → {"mean": [d], "components": [k][d] (rows = top
    components by variance), "explained_variance": [k]}."""
    import pandas as pd

    def moments(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n += len(x)
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    rows = (
        ensure_parallelism(df)
        .select(vec_col)
        .mapInPandas(moments, schema="n long, s array<double>, ss array<double>")
        .collect()  # one row per partition: bounded by parallelism
    )
    if not rows:
        raise ValueError("pca_fit on an empty DataFrame")
    rows.sort(key=lambda r: (r["n"], r["s"][0]))  # fixed combine order
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: make the largest-magnitude coordinate positive
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "explained_variance": np.maximum(evals[order], 0.0).tolist(),
    }


def pca_project(
    df: DataFrame, vec_col: str, model: dict, out_col: str = "pca"
) -> DataFrame:
    """Append the k-dim projection (x - mean) @ components.T — one
    matmul per Arrow batch; the (k, d) model rides the closure."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(model["mean"])
    comps = np.asarray(model["components"])

    def _project(s):
        if not len(s):
            return pd.Series([], dtype=object)
        x = np.array(s.tolist(), dtype=np.float64) - mean
        p = x @ comps.T
        return pd.Series(list(p))

    proj = pandas_udf(_project, "array<double>")
    return df.withColumn(out_col, proj(F.col(vec_col)))
