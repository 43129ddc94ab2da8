"""Distributed PCA over an embedding column.

The scale shape: each partition computes a PARTIAL Gram matrix (X^T X) and
feature sum over its Arrow batches — d*d + d floats per partition regardless
of row count — which reduce to the exact covariance matrix; the (tiny, d x d)
eigendecomposition runs driver-side with numpy; projection back over the data
is map-only. One pass for the fit, one for the transform, no shuffle larger
than n_partitions * d^2 floats. This is how Spark ML's PCA works internally
(RowMatrix.computeGramianMatrix); re-implemented here over the plain
array<float> column so it composes with the rest of the embedding pipeline
(and so the covariance reduction is independently verifiable against a SQL
engine — see emb_covariance_sample).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_and_mean(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact (X^T X, column means, n) via per-partition partial Gram
    matrices. Returns (gram[d,d], mean[d], n)."""
    import pandas as pd

    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    d = int(first["d"])

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = np.zeros((d, d))
        s = np.zeros(d)
        n = 0
        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            if len(x):
                g += x.T @ x
                s += x.sum(axis=0)
                n += len(x)
        if n:
            yield pd.DataFrame({"g": [g.reshape(-1).tolist()], "s": [s.tolist()], "n": [n]})

    parts = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(_partial, schema="g array<double>, s array<double>, n long")
        .collect()
    )  # n_partitions rows of d^2+d floats — bounded
    gram = np.zeros((d, d))
    mean = np.zeros(d)
    n = 0
    for r in parts:
        gram += np.asarray(r["g"]).reshape(d, d)
        mean += np.asarray(r["s"])
        n += r["n"]
    if n == 0:
        raise ValueError("PCA over an empty DataFrame")
    return gram, mean / n, n


def pca_fit(df: DataFrame, vec_col: str, k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA -> (components[k,d], explained_variance[k], mean[d]).

    Covariance = (X^T X - n * mean mean^T) / (n-1); eigh on the symmetric
    d x d matrix driver-side (d is the embedding dim — tiny). Component
    sign is canonicalized (largest-|.| coordinate positive) so the fit is
    deterministic across BLAS builds."""
    gram, mean, n = gram_and_mean(df, vec_col)
    cov = (gram - n * np.outer(mean, mean)) / max(n - 1, 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # [k, d]
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return comps, vals[order], mean


def pca_transform(df: DataFrame, id_col: str, vec_col: str, components: np.ndarray, mean: np.ndarray) -> DataFrame:
    """Project vectors onto the fitted components -> (id, pca array<double>).
    Map-only vectorized numpy over Arrow batches; components/mean travel by
    closure (k*d floats)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    comps = np.asarray(components)
    mu = np.asarray(mean)

    @pandas_udf("array<double>")
    def _proj(vecs):
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64) - mu
            out.append((comps @ x).tolist())
        return pd.Series(out)

    return df.select(F.col(id_col), _proj(F.col(vec_col).cast("array<double>")).alias("pca"))
