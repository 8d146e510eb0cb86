"""KNN bulk-path semantics: the partition-local top-k join must return the
same neighbor ids as the exact Catalyst window form (distances agree to
float64-reduction tolerance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import knn
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_knn_join_bulk_matches_exact(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.rank): (r.vec_id, r.distance)
             for r in knn.knn_join(emb, queries, k=20).collect()}
    bulk = {(r.query_id, r.rank): (r.vec_id, r.distance)
            for r in knn.knn_join_bulk(emb, queries, k=20).collect()}
    assert exact.keys() == bulk.keys()
    for key in exact:
        ev, ed = exact[key]
        bv, bd = bulk[key]
        assert ev == bv, f"{key}: id {bv} != {ev}"
        assert abs(ed - bd) < 1e-9


def test_knn_join_bulk_fewer_shuffled_rows(spark):
    """The survivor set entering the global merge is bounded by
    partitions × queries × k, independent of corpus size."""
    emb = load_table(spark, SF_SMOKE, "embeddings").repartition(4)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn.knn_join_bulk(emb, queries, k=3)
    assert out.count() == 2 * 3


def test_knn_topk_arrow_matches_exact_ids(spark):
    """The Arrow/matmul KNN must return exactly the ids of the canonical
    HOF-fold KNN, in the same order (distances may differ in the last ulp)."""
    from parquetaivectorsearch_spark import queries as Q
    from tests.conftest import SF_CORRECT

    qs = Q.all_queries()
    exact = [r["vec_id"] for r in
             qs["knn_topk"](spark, SF_CORRECT).select("vec_id").collect()]
    arrow = [r["vec_id"] for r in
             qs["knn_topk_arrow"](spark, SF_CORRECT).select("vec_id").collect()]
    assert arrow == exact
