"""Vector-retrieval shapes beyond the reference's single top-k query.

The reference answers exactly one retrieval question — top-k by dot-product
distance (Program.cs:207-227). Production vector engines ask three more,
implemented here Spark-first:

* **range search** — every vector within a distance radius (the "all
  near-duplicates of this item" query). No top-k heap: a pushed filter over
  a broadcast-join scan, so at 100 TB it is a single pass with no shuffle
  and no driver-side state; result size is data-dependent, not k-bounded.
* **matryoshka retrieval** — coarse shortlist on a prefix of the embedding
  dimensions (Matryoshka Representation Learning, Kusupati et al. 2022),
  exact rerank on the full vector. At scale the coarse pass reads a 4×
  narrower column slice per row; only the ≤50-row shortlist pays full-width
  math. The same adaptive-width trick PQ/int8 tiers use, but along dims.
* **MaxSim late interaction** — ColBERT-style multi-vector scoring
  (Khattab & Zaharia 2020): each document and the query carry several
  sub-vectors; score = Σ over query tokens of the max dot against any doc
  token. Here the 64-dim embedding is viewed as 4×16-dim token vectors,
  which keeps the whole score ROW-LOCAL: a greatest() over a 4×4 dot grid
  inside one projection — zero explode, zero shuffle, one TakeOrdered.
  The naive plan (posexplode tokens → join → two groupBys) shuffles
  4×|corpus| rows twice; this one shuffles only the final top-k heads.

All three are exact and deterministic, hence oracle-backed (hash-gated):
distances fold sequentially in double (functions/vector.dot) to match
DuckDB's list_inner_product bit-for-bit, and every emitted float is
ROUND(6)-ed per the repo-wide driver-hash convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions.vector import dot
from parquetaivectorsearch_spark.operators.knn import query_vector_df
from parquetaivectorsearch_spark.queries import _t, register

_DOT = "list_inner_product(e.embedding::DOUBLE[], q.qv)"

# MaxSim token geometry: 64-dim fixture embeddings viewed as 4 tokens × 16 dims.
_N_TOK = 4
_TOK_DIM = 16
# Matryoshka coarse-stage prefix width — semantically unrelated to the MaxSim
# token dim (they are both 16 only by coincidence); interpolated into BOTH the
# Spark plan and the DuckDB oracle so a retune cannot desynchronize them.
_PREFIX_DIM = 16


@register("knn_range_search", f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id = 0)
    SELECT q.query_id, e.vec_id, ROUND(1.0 - {_DOT}, 6) + 0.0 AS distance
    FROM embeddings e, q
    WHERE ROUND(1.0 - {_DOT}, 6) + 0.0 < 0.9
""")
def q_knn_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius query: all corpus vectors within distance < 0.9 of corpus row
    0 (the fixture's label cluster sits well inside; the bulk sits at ≈1.0,
    so the boundary crosses a sparse region — and the compared value is
    ROUND(6)-ed on both sides regardless, so a last-ulp fold difference
    cannot flip membership). Plan: broadcast 1-row query → scan-side filter
    → no shuffle at all; scales as one pass over the corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    q = query_vector_df(emb, 0)
    d = F.round(F.lit(1.0) - dot("embedding", "query_vec"), 6) + F.lit(0.0)
    return (
        emb.join(F.broadcast(q))
        .select("query_id", "vec_id", d.alias("distance"))
        .filter(F.col("distance") < 0.9)
    )


@register("matryoshka_topk", f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id = 0),
    coarse AS (
      SELECT q.query_id, e.vec_id, e.embedding,
             ROUND(1.0 - list_inner_product(e.embedding[1:{_PREFIX_DIM}]::DOUBLE[],
                                            q.qv[1:{_PREFIX_DIM}]), 6) + 0.0 AS cdist
      FROM embeddings e, q
      ORDER BY cdist, e.vec_id
      LIMIT 50
    )
    SELECT c.query_id, c.vec_id,
           ROUND(1.0 - list_inner_product(c.embedding::DOUBLE[], q.qv), 6) + 0.0
             AS distance
    FROM coarse c, q
    ORDER BY distance, c.vec_id
    LIMIT 10
""")
def q_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-width retrieval: shortlist top-50 on the FIRST 16 dims only,
    then exact top-10 rerank on all 64. Both stages are TakeOrdered (per-
    partition heaps, k rows shuffled per partition); the rerank touches 50
    rows total. At 100 TB the coarse stage is the only corpus-wide pass and
    reads 1/4 of the vector bytes — pair with a persisted prefix column (à
    la the int8 artifact) to shrink the scan itself."""
    emb = _t(spark, sf_dir, "embeddings")
    q = query_vector_df(emb, 0)
    cdist = F.round(
        F.lit(1.0) - dot(F.slice("embedding", 1, _PREFIX_DIM),
                         F.slice("query_vec", 1, _PREFIX_DIM)), 6) + F.lit(0.0)
    coarse = (
        emb.join(F.broadcast(q))
        .select("query_id", "vec_id", "embedding", "query_vec",
                cdist.alias("cdist"))
        .orderBy("cdist", "vec_id")
        .limit(50)
    )
    full = F.round(F.lit(1.0) - dot("embedding", "query_vec"), 6) + F.lit(0.0)
    return (
        coarse.select("query_id", "vec_id", full.alias("distance"))
        .orderBy("distance", "vec_id")
        .limit(10)
    )


def _duck_tok(col: str, i: int) -> str:
    lo, hi = i * _TOK_DIM + 1, (i + 1) * _TOK_DIM
    return f"{col}[{lo}:{hi}]"


def _maxsim_score_sql() -> str:
    """The GREATEST-grid MaxSim score as a DuckDB expression over aliases
    e (doc) and q (query) — shared by the single-query and join oracles."""
    per_qi = []
    for i in range(_N_TOK):
        dots = ", ".join(
            f"list_inner_product({_duck_tok('e.embedding', j)}::DOUBLE[], "
            f"{_duck_tok('q.qv', i)})"
            for j in range(_N_TOK)
        )
        per_qi.append(f"GREATEST({dots})")
    return " + ".join(per_qi)


def _maxsim_oracle() -> str:
    score = _maxsim_score_sql()
    return f"""
    WITH q AS (SELECT embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, ROUND({score}, 6) + 0.0 AS maxsim
    FROM embeddings e, q
    ORDER BY maxsim DESC, e.vec_id
    LIMIT 10
"""


@register("maxsim_multivector", _maxsim_oracle())
def q_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT MaxSim over 4×16-dim token views of each embedding: score =
    Σ_i max_j dot(query_tok_i, doc_tok_j), top-10 by descending score.

    The whole 4×4 interaction grid is one row-local projection —
    greatest() of 4 sequential-fold dots per query token, summed in fixed
    left-to-right order (matches the oracle's explicit + chain, so no
    aggregation-order nondeterminism reaches the ROUND). Catalyst keeps it
    inside WholeStageCodegen; the only exchange is the final top-10 heads.
    """
    from parquetaivectorsearch_spark.functions.vector import maxsim_score

    emb = _t(spark, sf_dir, "embeddings")
    q = query_vector_df(emb, 0)
    score = maxsim_score("embedding", "query_vec", _N_TOK, _TOK_DIM)
    return (
        emb.join(F.broadcast(q))
        .select("vec_id", (F.round(score, 6) + F.lit(0.0)).alias("maxsim"))
        .orderBy(F.desc("maxsim"), "vec_id")
        .limit(10)
    )



@register("maxsim_join", f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id < 4),
    scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND({{score}}, 6) + 0.0 AS maxsim
      FROM embeddings e, q
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY maxsim DESC, vec_id) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, maxsim, rank FROM r WHERE rank <= 5
""".replace("{score}", _maxsim_score_sql()))
def q_maxsim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MaxSim retrieval: top-5 per query for 4 query documents —
    the late-interaction analog of `knn_join`. The interaction grid stays
    row-local per (doc, query) pair; the only exchange is the per-query
    rank window over |corpus|×4 scored rows (same shuffle budget as
    knn_join; the bulk path for large query sets would mirror
    knn_join_bulk with maxsim_topk_arrow's einsum)."""
    from pyspark.sql.window import Window

    from parquetaivectorsearch_spark.functions.vector import maxsim_score

    emb = _t(spark, sf_dir, "embeddings")
    q4 = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    score = F.round(maxsim_score("embedding", "query_vec", _N_TOK, _TOK_DIM),
                    6) + F.lit(0.0)
    scored = (
        emb.join(F.broadcast(q4))
        .select("query_id", "vec_id", score.alias("maxsim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("maxsim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


@register("retrieve_docs", f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
               FROM embeddings WHERE vec_id = 0),
    topk AS (
      SELECT q.query_id, e.vec_id, ROUND(1.0 - {_DOT}, 6) + 0.0 AS distance
      FROM embeddings e, q
      ORDER BY distance, e.vec_id
      LIMIT 10
    )
    SELECT t.query_id, t.vec_id AS doc_id, t.distance,
           d.source, d.lang, substr(d.text, 1, 48) AS snippet
    FROM topk t JOIN documents d ON d.doc_id = t.vec_id
""")
def q_retrieve_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval, the reference's ACTUAL result shape: KNN hits
    mapped back to full records (the reference's graph returns item ids
    that index dataSetDbPedias — Title/Text ride along, Program.cs:106-107,
    216-224). Top-10 by distance, then the 10-row shortlist broadcasts
    into the documents join — the big side streams once, no shuffle.
    Snippet = first 48 chars (fixture text is ASCII; substr semantics are
    1-based character counts in both engines)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = query_vector_df(emb, 0)
    d = F.round(F.lit(1.0) - dot("embedding", "query_vec"), 6) + F.lit(0.0)
    topk = (
        emb.join(F.broadcast(q))
        .select("query_id", "vec_id", d.alias("distance"))
        .orderBy("distance", "vec_id")
        .limit(10)
    )
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.join(F.broadcast(topk), docs["doc_id"] == topk["vec_id"])
        .select("query_id", "doc_id", "distance", "source", "lang",
                F.substring("text", 1, 48).alias("snippet"))
    )
