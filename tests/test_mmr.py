"""MMR re-rank semantics: equality with a plain-python reference
implementation, and the diversification property (lower intra-set
similarity than the pure relevance top-k)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import knn
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _setup(spark, n_q=2, n_cand=30):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cand = knn.knn_join(emb, queries, k=n_cand)
    return emb, queries, cand


def _py_mmr(q, ids, X, dists, k, lam):
    order = np.lexsort((ids, dists))
    ids, X = ids[order], X[order]
    rel = X @ q
    sim = X @ X.T
    chosen, free = [], np.ones(len(ids), bool)
    for _ in range(k):
        red = sim[:, chosen].max(1) if chosen else np.zeros(len(ids))
        score = np.where(free, lam * rel - (1 - lam) * red, -np.inf)
        pick = int(score.argmax())
        chosen.append(pick)
        free[pick] = False
    return [int(ids[c]) for c in chosen]


def test_mmr_matches_python_reference(spark):
    emb, queries, cand = _setup(spark)
    out = knn.mmr_rerank(cand, emb, queries, k=8, lam=0.7).toPandas()
    emb_pdf = emb.toPandas().set_index("vec_id")
    q_pdf = queries.toPandas().set_index("query_id")
    cand_pdf = cand.toPandas()
    for qid, grp in cand_pdf.groupby("query_id"):
        ids = grp["vec_id"].to_numpy()
        X = np.stack([np.asarray(emb_pdf.loc[i, "embedding"], dtype=np.float64)
                      for i in ids])
        q = np.asarray(q_pdf.loc[qid, "query_vec"], dtype=np.float64)
        want = _py_mmr(q, ids, X, grp["distance"].to_numpy(), 8, 0.7)
        got = (out[out.query_id == qid].sort_values("mmr_rank")["vec_id"]
               .astype(int).tolist())
        assert got == want, (qid, got, want)


def test_mmr_reduces_intra_set_similarity(spark):
    emb, queries, cand = _setup(spark)
    out = knn.mmr_rerank(cand, emb, queries, k=8, lam=0.5).toPandas()
    emb_pdf = emb.toPandas().set_index("vec_id")

    def mean_pair_sim(ids):
        X = np.stack([np.asarray(emb_pdf.loc[i, "embedding"], dtype=np.float64)
                      for i in ids])
        s = X @ X.T
        iu = np.triu_indices(len(ids), 1)
        return float(s[iu].mean())

    cand_pdf = cand.toPandas()
    for qid, grp in cand_pdf.groupby("query_id"):
        topk = grp.sort_values(["distance", "vec_id"])["vec_id"].head(8).tolist()
        mmr = (out[out.query_id == qid].sort_values("mmr_rank")["vec_id"]
               .tolist())
        assert mean_pair_sim(mmr) <= mean_pair_sim(topk) + 1e-12, qid
