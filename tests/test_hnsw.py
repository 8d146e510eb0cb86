"""HNSW semantic checks: recall vs the exact oracle, persist/load
round-trip equality (the reference's own checksum-after-deserialize
invariant, Program.cs:223-227), and global-merge correctness."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import hnsw as H
from parquetaivectorsearch_spark.operators import knn
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _queries(emb, n=8):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_hnsw_recall_vs_exact(spark):
    """recall@20 ≥ 0.9 against the exact-KNN oracle (arXiv:1603.09320 §5
    methodology). Unlike pruned-probe IVF, HNSW searches every partition
    graph, so no neighbor structure needs planting even on the ~random
    fixture vectors."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = _queries(emb)
    exact = {(r.query_id, r.vec_id)
             for r in knn.knn_join(emb, queries, k=20).collect()}
    graph = H.build_hnsw(emb, n_partitions=4)
    approx = {(r.query_id, r.vec_id)
              for r in H.hnsw_search(graph, emb, queries, k=20).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@20 = {recall:.3f}"


def test_hnsw_persist_load_roundtrip(spark):
    """Persist → load must return the identical result set."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = _queries(emb, n=1)
    graph = H.build_hnsw(emb, n_partitions=4)
    mem = {(r.query_id, r.vec_id, round(r.distance, 6))
           for r in H.hnsw_search(graph, emb, queries, k=20).collect()}
    path = tempfile.mkdtemp(prefix="hnsw_rt_") + "/graph"
    H.write_hnsw(graph, path)
    loaded = H.read_hnsw(spark, path)
    disk = {(r.query_id, r.vec_id, round(r.distance, 6))
            for r in H.hnsw_search(loaded, emb, queries, k=20).collect()}
    assert mem == disk
    assert len(mem) == 20


def test_hnsw_results_are_global_topk_shape(spark):
    """Exactly k rows per query, ascending distance, no duplicate ids."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = _queries(emb, n=4)
    graph = H.build_hnsw(emb, n_partitions=4)
    rows = H.hnsw_search(graph, emb, queries, k=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2, 3}
    for q, rs in by_q.items():
        assert len(rs) == 10
        assert len({r.vec_id for r in rs}) == 10
        ds = [r.distance for r in rs]
        assert ds == sorted(ds)
