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


def test_binary_tier_recall_at_partial_shortlist(spark):
    """The 1-bit hamming shortlist must keep recall@20 ≥ 0.9 while ranking
    only 40% of the corpus (depth 200 of 500) — the non-trivial gate for
    the binary tier (the registered query's depth covers ≥ that fraction
    at every fixture sf)."""
    from pyspark.sql.window import Window

    from parquetaivectorsearch_spark.functions.vector import (
        binary_quantize,
        hamming_distance,
    )
    from parquetaivectorsearch_spark.operators import knn as KNN

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    codes = binary_quantize(emb)
    qcodes = (binary_quantize(queries, vec_col="query_vec", id_col="query_id")
              .withColumnRenamed("vec_id", "query_id")
              .withColumnRenamed("bcode", "qcode"))
    w = Window.partitionBy("query_id").orderBy("hd", "vec_id")
    short = (codes.join(F.broadcast(qcodes))
             .select("query_id", "vec_id",
                     hamming_distance("bcode", "qcode").alias("hd"))
             .withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= 200).select("query_id", "vec_id"))
    exact = KNN.knn_join(emb, queries, k=20).select("query_id", "vec_id")
    hits = short.join(exact, ["query_id", "vec_id"]).count()
    assert hits / 160 >= 0.9, hits / 160


def test_binary_quantize_matches_numpy_bits(spark):
    """Sign-bit packing must equal the definitional numpy bit loop."""
    import numpy as np

    from parquetaivectorsearch_spark.functions.vector import binary_quantize

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(20)
    got = {r.vec_id: list(r.bcode) for r in binary_quantize(emb).collect()}
    for r in emb.collect():
        v = np.array(r.embedding)
        words = []
        for w0 in range(0, len(v), 64):
            code = 0
            for j, x in enumerate(v[w0:w0 + 64]):
                if x > 0:
                    code |= 1 << j
            words.append(code - (1 << 64) if code >= (1 << 63) else code)
        assert got[r.vec_id] == words, r.vec_id


def test_int8_knn_join_bulk_matches_exact_after_rerank(spark):
    """int8 shortlist (Arrow matmul over the quantized table) + exact
    rerank must return the exact twin's ids: quantization error may
    reorder the shortlist interior but a 10×k depth keeps every true
    neighbor inside it on the fixtures."""
    from parquetaivectorsearch_spark.functions.vector import int8_quantize
    from parquetaivectorsearch_spark.operators.knn import (
        int8_knn_join_bulk,
        knn_join,
    )
    from parquetaivectorsearch_spark.sources import load_table
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    quant = int8_quantize(emb).select("vec_id", "scale", "qvec")
    got = {}
    for r in int8_knn_join_bulk(quant, emb, queries, k=10, shortlist=100).collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    want = {}
    for r in knn_join(emb, queries, k=10).collect():
        want.setdefault(r.query_id, set()).add(r.vec_id)
    assert got == want

    # non-default id_col must thread through BOTH phases (the phase-1
    # mapInPandas schema used to hardcode vec_id → missing-column crash)
    emb2 = emb.withColumnRenamed("vec_id", "item_id")
    quant2 = quant.withColumnRenamed("vec_id", "item_id")
    got2 = {}
    for r in int8_knn_join_bulk(quant2, emb2, queries, k=10, shortlist=100,
                                id_col="item_id").collect():
        got2.setdefault(r.query_id, set()).add(r.item_id)
    assert got2 == want


def test_prefix_rerank_topk_matches_two_stage_definition(spark):
    """Matryoshka artifact serve: (a) with a full-width 'prefix' and a
    corpus-sized shortlist it degenerates to exact knn_topk; (b) with a
    16-dim prefix it returns exactly the numpy-recomputed two-stage result
    (coarse float64 top-50 on the prefix, exact rerank)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.operators import knn
    from parquetaivectorsearch_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = knn.query_vector_df(emb, 0)

    full = knn.prefix_rerank_topk(emb.select("vec_id", "embedding"), emb, q,
                                  k=20, shortlist=10_000)
    exact = knn.knn_topk(emb, q, k=20)
    assert [r.vec_id for r in full.collect()] == [r.vec_id for r in exact.collect()]

    prefix = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    got = knn.prefix_rerank_topk(prefix, emb, q, k=10, shortlist=50,
                                 prefix_dim=16)
    t = pq.read_table(f"{SF_SMOKE}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    o = np.argsort(ids)
    ids, mat = ids[o], mat[o]
    qv = mat[ids == 0][0]
    pre = 1.0 - mat[:, :16] @ qv[:16]
    short = [int(i) for _, i in sorted(zip(pre, ids), key=lambda x: (x[0], x[1]))[:50]]
    sub = np.isin(ids, short)
    fulld = 1.0 - mat[sub] @ qv
    want = [int(i) for _, i in
            sorted(zip(fulld, ids[sub]), key=lambda x: (x[0], x[1]))[:10]]
    assert [r.vec_id for r in got.collect()] == want


def test_maxsim_arrow_matches_expression_form(spark):
    """The Arrow einsum MaxSim returns the same ids in the same order as
    the codegen expression form (functions/vector.maxsim_score) on the
    fixture — the two forms implement one definition at different widths."""
    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.functions.vector import maxsim_score
    from parquetaivectorsearch_spark.operators import knn
    from parquetaivectorsearch_spark.sources import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = knn.query_vector_df(emb, 0)
    arrow = knn.maxsim_topk_arrow(emb, q, k=10, n_tok=4)
    expr = (
        emb.join(F.broadcast(q))
        .select("vec_id", maxsim_score("embedding", "query_vec", 4, 16)
                .alias("maxsim"))
        .orderBy(F.desc("maxsim"), "vec_id")
        .limit(10)
    )
    assert ([r.vec_id for r in arrow.collect()]
            == [r.vec_id for r in expr.collect()])


def test_arrow_topk_tie_break_on_duplicate_vectors(spark):
    """All-identical corpus vectors: every distance ties, so the batch-k
    selection must keep the SMALLEST ids (lexsort on (score, id)) for the
    global (distance, id) order to return ids 0..k-1 — the boundary case
    argpartition-based selection gets wrong."""
    from parquetaivectorsearch_spark.operators import knn

    rows = [(i, [1.0] * 8) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    q = knn.query_vector_df(df, 0)
    got = [r.vec_id for r in knn.knn_topk_arrow(df, q, k=10).collect()]
    assert got == list(range(10))
    got2 = [r.vec_id for r in
            knn.maxsim_topk_arrow(df, q, k=10, n_tok=4).collect()]
    assert got2 == list(range(10))


def test_bulk_paths_tie_safe_with_duplicate_vectors(spark):
    """Exact-tie regression (ADVICE r8 / VERDICT r9 #5): duplicate vectors
    straddling the batch-k cut must surface the SMALLEST id, matching the
    exact window's (distance, id) order — the old argpartition cut could
    drop the id-winning twin before the tie-aware heap saw it. Corpus: a
    query vector duplicated many times under ids sorted so the duplicates
    span partition/batch boundaries, k smaller than the duplicate count."""
    import numpy as np

    from parquetaivectorsearch_spark.functions.vector import int8_quantize

    dim, n_dup, n_bg, k = 8, 30, 40, 6
    rng = np.random.RandomState(3)
    v = rng.randn(dim); v /= np.linalg.norm(v)
    rows = []
    # duplicates get the HIGHEST ids except one low id placed LAST in row
    # order: argpartition over the all-equal distance block keeps early
    # indices, so the pre-fix cut verifiably drops the id-winning twin
    # (numpy sim: argpartition keeps 1018-1024, lexsort keeps 5,1000-1004)
    dup_ids = list(range(1000, 1000 + n_dup - 1))
    for i in dup_ids:
        rows.append((i, [float(x) for x in v]))
    for i in range(100, 100 + n_bg):
        u = rng.randn(dim); u /= np.linalg.norm(u)
        rows.append((i, [float(x) for x in u]))
    rows.append((5, [float(x) for x in v]))
    dup_ids.append(5)
    corpus = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>").coalesce(1)
    queries = spark.createDataFrame(
        [(0, [float(x) for x in v])],
        "query_id BIGINT, query_vec ARRAY<FLOAT>")

    expect = sorted(dup_ids)[:k]
    got_bulk = [r.vec_id for r in knn.knn_join_bulk(corpus, queries, k=k)
                .orderBy("rank").collect()]
    assert got_bulk == expect, got_bulk

    quant = int8_quantize(corpus).select("vec_id", "scale", "qvec")
    got_int8 = [r.vec_id
                for r in knn.int8_knn_join_bulk(quant, corpus, queries,
                                                k=k, shortlist=k)
                .orderBy("rank").collect()]
    assert got_int8 == expect, got_int8
