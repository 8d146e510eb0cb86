"""Distributed-PCA invariants: orthonormal axes, descending explained
variance, planted-structure recovery, exact reconstruction at full rank,
and numpy parity of the distributed sufficient statistics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators.pca import fit_pca, pca_project
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _planted(spark, n=400, d=16, seed=7):
    """Variance concentrated on axis 0 (×10) and axis 1 (×3)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    x[:, 0] *= 10.0
    x[:, 1] *= 3.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>")
    return df.repartition(8), x.astype(np.float32).astype(np.float64)


def test_pca_matches_numpy_and_recovers_structure(spark):
    df, x = _planted(spark)
    m = fit_pca(df, k=4)
    assert m.n == len(x)
    assert np.allclose(m.mean, x.mean(0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    assert np.allclose(m.explained_var, vals, rtol=1e-9)
    # descending variance; first axis ≈ e0, second ≈ e1 (planted)
    assert all(a >= b for a, b in zip(m.explained_var, m.explained_var[1:]))
    assert abs(m.components[0, 0]) > 0.99
    assert abs(m.components[1, 1]) > 0.99
    # orthonormal rows
    assert np.allclose(m.components @ m.components.T, np.eye(4), atol=1e-9)


def test_pca_projection_and_full_rank_reconstruction(spark):
    df, x = _planted(spark, d=8)
    m = fit_pca(df, k=8)  # full rank
    rows = pca_project(df, m).orderBy("vec_id").collect()
    p = np.stack([np.asarray(r.pvec, dtype=np.float64) for r in rows])
    # projection matches numpy
    want = (x - x.mean(0)) @ m.components.T
    assert np.allclose(p, want, atol=1e-3)  # float32 output tolerance
    # full-rank reconstruction recovers the centered data
    rec = p @ m.components + x.mean(0)
    assert np.allclose(rec, x, atol=1e-2)


def test_pca_deterministic_across_fits(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = fit_pca(emb, k=4)
    b = fit_pca(emb.repartition(16), k=4)  # different partitioning
    assert np.allclose(a.components, b.components, atol=1e-9)
    assert np.allclose(a.explained_var, b.explained_var, rtol=1e-9)


def test_pca_projection_preserves_neighborhoods(spark):
    """The point of the operator: top-k neighbors in the 16-dim projection
    of a 64-dim corpus overlap heavily with full-dim neighbors (planted
    clusters make the structure real)."""
    rng = np.random.RandomState(11)
    centers = rng.randn(5, 64).astype(np.float64) * 3
    rows = []
    for i in range(500):
        c = centers[i % 5]
        rows.append((i, [float(v) for v in c + rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    m = fit_pca(df, k=16)
    proj = {r.vec_id: np.asarray(r.pvec, dtype=np.float64)
            for r in pca_project(df, m).collect()}

    def topk(space, q, k=10):
        ds = sorted((np.linalg.norm(v - space[q]), i)
                    for i, v in space.items() if i != q)[:k]
        return {i for _, i in ds}

    # within-cluster neighbor RANKS are isotropic-noise-driven (not
    # PCA-preservable by design); the structure PCA must keep is cluster
    # membership: every projected top-10 neighbor shares the query's
    # planted cluster.
    for q in range(8):
        assert all(i % 5 == q % 5 for i in topk(proj, q)), q


def test_pca_reduced_ivf_pipeline(spark):
    """The OPQ-style composition the operators exist for: coarse-quantize
    in the 16-dim PCA space (4× cheaper k-means + assignment + probe),
    shortlist there, exact-rerank on the full 64-dim vectors. Recall@10 vs
    the full-space exact oracle must clear the ANN gate on clustered
    data."""
    from parquetaivectorsearch_spark.operators import pq as PQ
    from parquetaivectorsearch_spark.operators.ann import IVFIndex, ivf_search
    from parquetaivectorsearch_spark.operators.knn import knn_join

    rng = np.random.RandomState(21)
    centers = rng.randn(5, 64).astype(np.float64) * 3
    rows = []
    for i in range(500):
        c = centers[i % 5]
        rows.append((i, [float(v) for v in c + rng.randn(64)]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")

    m = fit_pca(df, k=16)
    proj = pca_project(df, m)  # vec_id, embedding, pvec
    index = IVFIndex.build(proj, nlist=5, vec_col="pvec", metric="l2")
    queries = proj.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("pvec").alias("query_vec"))
    short = ivf_search(index, queries, k=50, nprobe=2, vec_col="pvec") \
        .select("query_id", "vec_id")
    full_queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    got = {}
    for r in PQ.pq_rerank(short, df, full_queries, k=10).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    exact = {}
    for r in knn_join(df, full_queries, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.9, recall
