"""Distributed PCA over an ``array<float>`` embedding column.

The dimension-reduction / whitening stage a vector pipeline runs in front
of index build (FAISS's OPQ/PCAMatrix pre-transforms; reduces the
reference's 1536-dim regime to an index-friendly width). Spark-first
shape:

- **sufficient statistics, one distributed pass**: per-partition partial
  (n, Σx, ΣxxT) via mapInPandas (one BLAS ``x.T @ x`` per Arrow batch),
  then a single-task combine — the classic mergeable-moments pattern, so
  corpus size only affects the first (fully parallel) stage.
- **eigendecomposition on the driver**: the combined covariance is d×d —
  O(dim²) scalars, INDEPENDENT of corpus size (64-dim fixtures: 4 KB;
  the reference's 1536 dims: ~19 MB — still a driver-trivial eigh).
  ``max_dim`` guards against misuse on wider-than-covariance-fits data.
- **projection is a narrow Arrow map**: one (batch × d) @ (d × k) matmul
  per batch; components ride the UDF closure.

Determinism: eigh of a symmetric matrix with distinct eigenvalues is
deterministic up to per-component sign; signs are canonicalized (largest
|coordinate| made positive) so repeated fits are bit-stable. Sign
ambiguity is inherent to PCA ⇒ rows-only at the driver gate; invariants
(orthonormality, variance ordering, reconstruction) are pinned in
tests/test_pca.py.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class PCAModel:
    mean: np.ndarray        # (d,)
    components: np.ndarray  # (k, d) — rows are principal axes
    explained_var: np.ndarray  # (k,) eigenvalues, descending
    n: int


def fit_pca(corpus: DataFrame, k: int = 8, vec_col: str = "embedding",
            max_dim: int = 4096) -> PCAModel:
    """One distributed stats pass + driver eigh. See module docstring."""
    stats_schema = "n LONG, s ARRAY<DOUBLE>, ss ARRAY<DOUBLE>"

    def partial(batches):
        n, s, ss = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] > max_dim:
                raise ValueError(
                    f"fit_pca: dim {x.shape[1]} > max_dim {max_dim} — the "
                    "d×d covariance would not be driver-safe")
            n += len(x)
            s = x.sum(0) if s is None else s + x.sum(0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame({"n": [n], "s": [s], "ss": [ss.reshape(-1)]})

    parts = corpus.select(vec_col).mapInPandas(partial, stats_schema)

    def combine(batches):
        n, s, ss = 0, None, None
        for pdf in batches:
            for _, row in pdf.iterrows():
                n += int(row["n"])
                rs = np.asarray(row["s"], dtype=np.float64)
                rss = np.asarray(row["ss"], dtype=np.float64)
                s = rs if s is None else s + rs
                ss = rss if ss is None else ss + rss
        if n:
            yield pd.DataFrame({"n": [n], "s": [s], "ss": [ss]})

    one = parts.coalesce(1).mapInPandas(combine, stats_schema).collect()
    if not one:
        raise ValueError("fit_pca: empty corpus")
    row = one[0]
    n = int(row["n"])
    s = np.asarray(row["s"], dtype=np.float64)
    d = len(s)
    ss = np.asarray(row["ss"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    # canonical sign: the largest-|coordinate| entry of each axis positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(mean=mean, components=comps,
                    explained_var=np.maximum(vals[order], 0.0), n=n)


def pca_project(corpus: DataFrame, model: PCAModel,
                vec_col: str = "embedding",
                out_col: str = "pvec") -> DataFrame:
    """Append the k-dim projection (x − mean) @ componentsᵀ as
    ``array<float>`` — a shuffle-free narrow map."""
    mean = model.mean
    ct = model.components.T  # (d, k)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def proj(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        p = ((x - mean) @ ct).astype(np.float32)
        return pd.Series(list(p))

    return corpus.withColumn(out_col, proj(F.col(vec_col)))
