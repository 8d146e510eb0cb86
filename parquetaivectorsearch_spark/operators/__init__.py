from parquetaivectorsearch_spark.operators.knn import (
    knn_join,
    knn_topk,
    knn_topk_arrow,
    query_vector_df,
)

__all__ = ["knn_topk", "knn_topk_arrow", "knn_join", "query_vector_df"]
