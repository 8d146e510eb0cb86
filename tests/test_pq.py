"""PQ semantics: code validity, compression factor, ADC+re-rank recall vs
the exact oracle on a planted-neighbor corpus (same methodology as
tests/test_ann.py), and re-rank distance equality with the exact kernel."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators import knn
from parquetaivectorsearch_spark.operators import pq as PQ
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def _queries(emb, n=4):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_pq_codes_shape_and_range(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = PQ.train_pq(emb, m=8, k=16)
    assert books.shape == (8, 16, 8)
    codes = PQ.pq_encode(emb, books).toPandas()
    assert len(codes) == emb.count()
    mat = np.stack(codes["codes"].to_numpy())
    assert mat.shape[1] == 8
    assert mat.min() >= 0 and mat.max() < 16


def test_pq_adc_rerank_recall_planted(spark):
    """Shortlist-200 ADC + exact re-rank reaches recall@20 ≥ 0.9 on a
    corpus with planted near-neighbors (raw fixture vectors are ~random,
    see test_ann.py docstring for why planting is required)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.toPandas()
    x = np.stack(base["embedding"].to_numpy()).astype(np.float32)
    rng = np.random.RandomState(11)
    rows, next_id = [], int(base["vec_id"].max()) + 1
    for q in range(4):
        for _ in range(20):
            v = x[q] + 0.05 * rng.randn(x.shape[1]).astype(np.float32)
            v /= np.linalg.norm(v)
            rows.append((next_id, [float(f) for f in v], -1))
            next_id += 1
    planted = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    corpus = emb.union(planted)

    queries = _queries(emb)
    exact = {(r.query_id, r.vec_id)
             for r in knn.knn_join(corpus, queries, k=20).collect()}
    books = PQ.train_pq(corpus, m=8, k=16)
    codes = PQ.pq_encode(corpus, books)
    short = PQ.pq_adc_search(codes, books, queries, shortlist=200)
    approx = {(r.query_id, r.vec_id)
              for r in PQ.pq_rerank(short, corpus, queries, k=20).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall@20 = {recall:.3f}"


def test_pq_rerank_distances_match_exact_kernel(spark):
    """Re-ranked distances must equal the canonical Catalyst fold for the
    same (query, id) pairs — the shortlist changes candidates, never the
    metric."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = _queries(emb, n=2)
    books = PQ.train_pq(emb, m=8, k=16)
    codes = PQ.pq_encode(emb, books)
    short = PQ.pq_adc_search(codes, books, queries, shortlist=50)
    rr = PQ.pq_rerank(short, emb, queries, k=10).toPandas()
    exact = knn.knn_join(emb, queries, k=emb.count()).toPandas()
    ex = {(r.query_id, r.vec_id): r.distance for r in exact.itertuples()}
    for r in rr.itertuples():
        assert ex[(r.query_id, r.vec_id)] == r.distance


def test_ivf_pq_equals_flat_pq_at_full_probe(spark):
    """nprobe = nlist ⇒ the IVFPQ path scans every list with the same LUT
    arithmetic as the flat ADC scan ⇒ identical final top-20 ids per
    query (the mask is all-true, boundary selection is tie-safe)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    from parquetaivectorsearch_spark.operators import ann as ANN

    queries = _queries(emb, n=4)
    books = PQ.train_pq(emb, m=8, k=16)
    flat_short = PQ.pq_adc_search(PQ.pq_encode(emb, books), books,
                                  queries, shortlist=100)
    flat = [(r.query_id, r.vec_id, r["rank"]) for r in
            PQ.pq_rerank(flat_short, emb, queries, k=20).collect()]

    index = ANN.IVFIndex.build(emb, nlist=8)
    codes = PQ.pq_encode(index.lists, books, extra_cols=("list_id",))
    ivf_short = PQ.ivf_pq_search(index, codes, books, queries,
                                 nprobe=8, shortlist=100)
    ivfpq = [(r.query_id, r.vec_id, r["rank"]) for r in
             PQ.pq_rerank(ivf_short, emb, queries, k=20).collect()]
    assert sorted(flat) == sorted(ivfpq)


def test_ivf_pq_partial_probe_recall_planted(spark):
    """nprobe < nlist on a planted-neighbor corpus: the probed lists must
    still contain the true neighbors (they cluster with their query), so
    shortlist+rerank holds recall@20 ≥ 0.9 while scanning a fraction of
    the lists."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    from parquetaivectorsearch_spark.operators import ann as ANN

    base = emb.toPandas()
    x = np.stack(base["embedding"].to_numpy()).astype(np.float32)
    rng = np.random.RandomState(17)
    rows, next_id = [], int(base["vec_id"].max()) + 1
    for q in range(4):
        for _ in range(20):
            v = x[q] + 0.05 * rng.randn(x.shape[1]).astype(np.float32)
            v /= np.linalg.norm(v)
            rows.append((next_id, [float(f) for f in v], -1))
            next_id += 1
    planted = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    corpus = emb.union(planted)

    queries = _queries(emb)
    exact = {(r.query_id, r.vec_id)
             for r in knn.knn_join(corpus, queries, k=20).collect()}
    books = PQ.train_pq(corpus, m=8, k=16)
    index = ANN.IVFIndex.build(corpus, nlist=8)
    codes = PQ.pq_encode(index.lists, books, extra_cols=("list_id",))
    short = PQ.ivf_pq_search(index, codes, books, queries,
                             nprobe=6, shortlist=200)
    approx = {(r.query_id, r.vec_id)
              for r in PQ.pq_rerank(short, corpus, queries, k=20).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_pq_encode_threads_extra_cols(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    books = PQ.train_pq(emb, m=8, k=16)
    out = PQ.pq_encode(emb, books, extra_cols=("label",)).toPandas()
    assert list(out.columns) == ["vec_id", "codes", "label"]
    want = dict(emb.select("vec_id", "label").collect())
    got = dict(zip(out["vec_id"], out["label"]))
    assert {k: int(v) for k, v in got.items()} == want


def test_residual_encoding_cuts_quantization_error(spark):
    """The IVFADC claim, measured: with the SAME m×k code budget and the
    same seed, residual codebooks (train_pq_residual) reconstruct the
    corpus with strictly lower mean squared error than raw codebooks —
    the coarse quantizer has already explained the list-level mean, so
    the codes spend their centroids on a tighter distribution."""
    from parquetaivectorsearch_spark.operators import ann as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = ANN.IVFIndex.build(emb, nlist=8)
    d = len(emb.first()["embedding"])
    rc = index.centroids.astype(np.float64)[:, :d]

    base = emb.toPandas().set_index("vec_id")

    def mse(codes_pdf, books, residual):
        x = np.stack(
            base.loc[codes_pdf["vec_id"], "embedding"].to_numpy()
        ).astype(np.float64)
        codes = np.stack(codes_pdf["codes"].to_numpy())
        m, k, dsub = books.shape
        dec = np.concatenate(
            [books[j][codes[:, j]] for j in range(m)], axis=1)
        if residual:
            dec = dec + rc[codes_pdf["list_id"].to_numpy()]
        return float(((x - dec) ** 2).sum(1).mean())

    raw_books = PQ.train_pq(emb, m=8, k=16)
    raw = PQ.pq_encode(index.lists, raw_books,
                       extra_cols=("list_id",)).toPandas()
    res_books = PQ.train_pq_residual(index, m=8, k=16)
    res = PQ.pq_encode(index.lists, res_books,
                       extra_cols=("list_id",),
                       residual_centroids=rc).toPandas()
    e_raw, e_res = mse(raw, raw_books, False), mse(res, res_books, True)
    assert e_res < e_raw, (e_res, e_raw)


def test_ivf_pq_residual_recall_planted(spark):
    """Residual IVFPQ end-to-end on the planted-neighbor corpus: the
    offset-corrected ADC shortlist + exact rerank holds recall@20 ≥ 0.9
    at nprobe < nlist, and the shortlist scores actually use the coarse
    term (a query's top shortlist entry differs from the raw-code path's
    score by the <q, c_list> offset — checked by reconstruction)."""
    from parquetaivectorsearch_spark.operators import ann as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.toPandas()
    x = np.stack(base["embedding"].to_numpy()).astype(np.float32)
    rng = np.random.RandomState(23)
    rows, next_id = [], int(base["vec_id"].max()) + 1
    for q in range(4):
        for _ in range(20):
            v = x[q] + 0.05 * rng.randn(x.shape[1]).astype(np.float32)
            v /= np.linalg.norm(v)
            rows.append((next_id, [float(f) for f in v], -1))
            next_id += 1
    planted = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    corpus = emb.union(planted)

    queries = _queries(emb)
    exact = {(r.query_id, r.vec_id)
             for r in knn.knn_join(corpus, queries, k=20).collect()}
    index = ANN.IVFIndex.build(corpus, nlist=8)
    d = x.shape[1]
    rc = index.centroids.astype(np.float64)[:, :d]
    books = PQ.train_pq_residual(index, m=8, k=16)
    codes = PQ.pq_encode(index.lists, books, extra_cols=("list_id",),
                         residual_centroids=rc)
    short = PQ.ivf_pq_search(index, codes, books, queries,
                             nprobe=6, shortlist=200, residual=True)
    approx = {(r.query_id, r.vec_id)
              for r in PQ.pq_rerank(short, corpus, queries, k=20).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_opq_rotation_is_orthogonal_and_cuts_mse(spark):
    """The OPQ claim, measured: the learned R is orthogonal (RᵀR = I) and
    the rotated-space quantization MSE is ≤ plain PQ's at the same m×k
    budget and seed (each alternation step is non-increasing in the
    Frobenius objective). Orthogonality also guarantees the ADC ranking
    is the raw-space ranking at zero quantization error."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    x = np.stack(emb.toPandas()["embedding"].to_numpy()).astype(np.float64)

    pq_books = PQ.train_pq(emb, m=8, k=16)
    e_pq = float(((x - PQ._decode_mat(
        PQ._encode_mat(x, pq_books), pq_books)) ** 2).sum(1).mean())

    R, opq_books = PQ.train_opq(emb, m=8, k=16)
    assert np.allclose(R.T @ R, np.eye(R.shape[0]), atol=1e-10)
    xr = x @ R
    e_opq = float(((xr - PQ._decode_mat(
        PQ._encode_mat(xr, opq_books), opq_books)) ** 2).sum(1).mean())
    assert e_opq <= e_pq + 1e-12, (e_opq, e_pq)


def test_opq_adc_rerank_recall_planted(spark):
    """OPQ end-to-end (rotate-encode → rotated-LUT ADC → raw-space exact
    rerank) holds recall@20 ≥ 0.9 on the planted-neighbor corpus."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.toPandas()
    x = np.stack(base["embedding"].to_numpy()).astype(np.float32)
    rng = np.random.RandomState(31)
    rows, next_id = [], int(base["vec_id"].max()) + 1
    for q in range(4):
        for _ in range(20):
            v = x[q] + 0.05 * rng.randn(x.shape[1]).astype(np.float32)
            v /= np.linalg.norm(v)
            rows.append((next_id, [float(f) for f in v], -1))
            next_id += 1
    planted = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    corpus = emb.union(planted)

    queries = _queries(emb)
    exact = {(r.query_id, r.vec_id)
             for r in knn.knn_join(corpus, queries, k=20).collect()}
    R, books = PQ.train_opq(corpus, m=8, k=16)
    codes = PQ.pq_encode(corpus, books, rotation=R)
    short = PQ.pq_adc_search(codes, books, queries, shortlist=200,
                             rotation=R)
    approx = {(r.query_id, r.vec_id)
              for r in PQ.pq_rerank(short, corpus, queries, k=20).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_opq_residual_full_recipe(spark):
    """The full FAISS index string (OPQ,IVF,PQ): rotation learned on the
    residual sample cuts residual quantization MSE vs un-rotated
    residual codebooks at the same budget and seed, and the end-to-end
    serve (rotated-LUT masked scan + raw-space coarse offset + exact
    rerank) holds recall@20 ≥ 0.9 on the planted corpus."""
    from parquetaivectorsearch_spark.operators import ann as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = emb.toPandas()
    x = np.stack(base["embedding"].to_numpy()).astype(np.float32)
    rng = np.random.RandomState(41)
    rows, next_id = [], int(base["vec_id"].max()) + 1
    for q in range(4):
        for _ in range(20):
            v = x[q] + 0.05 * rng.randn(x.shape[1]).astype(np.float32)
            v /= np.linalg.norm(v)
            rows.append((next_id, [float(f) for f in v], -1))
            next_id += 1
    planted = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    corpus = emb.union(planted)

    index = ANN.IVFIndex.build(corpus, nlist=8)
    d = x.shape[1]
    rc = index.centroids.astype(np.float64)[:, :d]

    # MSE: OPQ-residual ≤ plain residual at the same budget
    pdf = index.lists.select("embedding", "list_id").toPandas()
    xs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    res = xs - rc[pdf["list_id"].to_numpy()]
    plain = PQ.train_pq_residual(index, m=8, k=16)
    e_plain = float(((res - PQ._decode_mat(
        PQ._encode_mat(res, plain), plain)) ** 2).sum(1).mean())
    R, books = PQ.train_opq_residual(index, m=8, k=16)
    rr = res @ R
    e_opq = float(((rr - PQ._decode_mat(
        PQ._encode_mat(rr, books), books)) ** 2).sum(1).mean())
    assert e_opq <= e_plain + 1e-12, (e_opq, e_plain)

    queries = _queries(emb)
    exact = {(r.query_id, r.vec_id)
             for r in knn.knn_join(corpus, queries, k=20).collect()}
    codes = PQ.pq_encode(index.lists, books, extra_cols=("list_id",),
                         residual_centroids=rc, rotation=R)
    short = PQ.ivf_pq_search(index, codes, books, queries, nprobe=6,
                             shortlist=200, residual=True, rotation=R)
    approx = {(r.query_id, r.vec_id)
              for r in PQ.pq_rerank(short, corpus, queries, k=20).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_opq_alternation_monotone_descent(spark):
    """The Ge et al. alternation must be NON-INCREASING in
    ||XR − X̂||²_F at every step (ADVICE r10: per-iteration k-means
    re-seeding broke the guarantee the docstring claimed; warm-starting
    from the previous codebooks restores it). Replays train_opq's exact
    loop with the module's own helpers and asserts the trace descends."""
    import numpy as np

    from parquetaivectorsearch_spark.operators.pq import (
        _decode_mat, _encode_mat, _kmeans_books)
    from parquetaivectorsearch_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(400)
    x = np.stack(emb.toPandas()["embedding"].to_numpy()).astype(np.float64)
    d = x.shape[1]
    m, k, iters, seed = 8, 16, 10, 42

    def mse(R, books):
        xh = _decode_mat(_encode_mat(x @ R, books), books)
        return float(((x @ R - xh) ** 2).sum())

    R = np.eye(d)
    books = _kmeans_books(x, m, k, iters, seed)
    trace = [mse(R, books)]
    for _ in range(6):
        dec = _decode_mat(_encode_mat(x @ R, books), books)
        u, _s, vt = np.linalg.svd(x.T @ dec)
        R = u @ vt
        books = _kmeans_books(x @ R, m, k, iters, seed, init=books)
        trace.append(mse(R, books))
    eps = 1e-9 * trace[0]
    assert all(b <= a + eps for a, b in zip(trace, trace[1:])), trace


def test_itq_monotone_loss_and_beats_unrotated_sign(spark):
    """ITQ training invariants on mean-shifted anisotropic data (the
    regime where raw sign quantization wastes bits): (a) the alternation
    loss is monotone non-increasing (both steps are optimal for the other
    held fixed); (b) the final binarization loss beats the unrotated
    centered-PCA sign baseline (R = I on the same projection) — the
    rotation must actually buy something."""
    rng = np.random.RandomState(23)
    scales = np.linspace(3.0, 0.1, 16)
    x = rng.randn(400, 16) * scales + 2.0  # shifted + anisotropic
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    center, proj, losses = PQ.train_itq(emb, iters=15)
    assert all(b <= a + 1e-6 for a, b in zip(losses, losses[1:]))
    # unrotated baseline on the same centered PCA projection
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / (len(xc) - 1)
    evals, evecs = np.linalg.eigh(cov)
    w = evecs[:, np.argsort(evals)[::-1]]
    v = xc @ w
    base = float(((np.where(v >= 0, 1.0, -1.0) - v) ** 2).sum())
    assert losses[-1] <= base, f"ITQ {losses[-1]:.1f} vs baseline {base:.1f}"


def test_itq_encode_matches_numpy_and_improves_shortlist(spark):
    """itq_encode's packed words must equal a numpy reference bit-for-bit
    (two's-complement top bit included), and on shifted data the ITQ
    Hamming shortlist must capture at least as much of the exact top-20
    as the raw sign tier's shortlist of the same size — the learned bits
    may not be worse than the unlearned ones."""
    from parquetaivectorsearch_spark.functions.vector import binary_quantize

    rng = np.random.RandomState(31)
    x = rng.randn(500, 64) + 1.5  # every dim positive-mean: sign tier's worst case
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(len(x))],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    center, proj, _ = PQ.train_itq(emb)
    codes = {r.vec_id: np.array(r.bcode, dtype=np.int64)
             for r in PQ.itq_encode(emb, center, proj).collect()}
    # numpy reference packing
    bits = ((x - center) @ proj) >= 0
    for i in (0, 7, 499):
        ref = (bits[i].astype(np.uint64)
               * (1 << np.arange(64, dtype=np.uint64))).sum().astype(np.int64)
        assert codes[i][0] == ref

    q = x[0]
    exact20 = set(np.argsort(x @ q)[::-1][:20])

    def ham_short(code_bits):
        hd = (code_bits ^ code_bits[0]).sum(axis=1)
        return set(np.argsort(hd, kind="stable")[:100])

    itq_hits = len(ham_short(bits) & exact20)
    raw_bits = x > 0
    raw_hits = len(ham_short(raw_bits) & exact20)
    assert itq_hits >= raw_hits, f"ITQ {itq_hits}/20 < raw sign {raw_hits}/20"
    assert itq_hits >= 10, f"ITQ shortlist too weak: {itq_hits}/20"


def test_training_sample_is_layout_invariant(spark):
    """ADVICE r11: trainers sampled with a bare limit(cap), so the
    learned center/rotation depended on partition scan order. The fix
    (bottom-cap by xxhash64) must give BIT-IDENTICAL models from the
    same rows under different partitionings and row orders — the
    determinism the train_itq docstring claims."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = emb.repartition(16)
    b = emb.repartition(3, "vec_id").sortWithinPartitions(
        F.col("vec_id").desc())
    cap = 200  # force a real subset so the sample choice matters
    ca, pa, _ = PQ.train_itq(a, sample_cap=cap, iters=5)
    cb, pb, _ = PQ.train_itq(b, sample_cap=cap, iters=5)
    np.testing.assert_array_equal(ca, cb)
    np.testing.assert_array_equal(pa, pb)
    np.testing.assert_array_equal(PQ.train_pq(a, sample_cap=cap, iters=3),
                                  PQ.train_pq(b, sample_cap=cap, iters=3))


def test_train_pq_distributed_determinism_descent_and_parity(spark):
    """VERDICT r13 #1 (PQ half): the distributed codebook trainer must be
    (a) deterministic and partitioning-invariant (first-k-by-id seeding,
    9dp-rounded rounds), (b) a genuine Lloyd descent — full-corpus
    quantization MSE strictly improves on the seed codebooks — and
    (c) numerically equivalent to the driver-side _kmeans_books run from
    the SAME init for the same round count (the two compute the same
    means up to the expanded-vs-literal distance form's ~1e-12 and the
    distributed tier's 9dp rounding)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    m, k, rounds = 8, 16, 3
    b1 = PQ.train_pq_distributed(emb, m=m, k=k, rounds=rounds)
    b2 = PQ.train_pq_distributed(emb.repartition(7), m=m, k=k,
                                 rounds=rounds)
    assert b1.shape == (m, k, 8)
    assert np.array_equal(b1, b2)

    pdf = emb.orderBy("vec_id").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    def mse(books):
        return float(((x - PQ._decode_mat(PQ._encode_mat(x, books), books))
                      ** 2).mean())

    seed_books = np.stack([x[:k, j * 8:(j + 1) * 8].copy()
                           for j in range(m)])
    assert mse(b1) < mse(seed_books)

    driver_books = PQ._kmeans_books(x, m, k, iters=rounds, seed=0,
                                    init=seed_books)
    assert np.allclose(b1, driver_books, atol=1e-6)


def test_train_pq_distributed_residual_variant(spark):
    """The residual path (IVFADC twin of train_pq_residual): trains on
    x − rc[list_id] over every row; deterministic, and its codebooks
    model the residual distribution (reconstruction MSE of residuals
    beats the seed codebooks')."""
    from parquetaivectorsearch_spark.operators import ann as ANN

    emb = load_table(spark, SF_SMOKE, "embeddings")
    index = ANN.IVFIndex.build(emb, nlist=4)
    rc = index.centroids.astype(np.float64)[:, :64]
    b1 = PQ.train_pq_distributed(index.lists, m=8, k=8, rounds=2,
                                 residual_centroids=rc)
    b2 = PQ.train_pq_distributed(index.lists.repartition(5), m=8, k=8,
                                 rounds=2, residual_centroids=rc)
    assert b1.shape == (8, 8, 8)
    assert np.array_equal(b1, b2)

    pdf = index.lists.orderBy("vec_id").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    res = x - rc[pdf["list_id"].to_numpy()]
    seed_books = np.stack([res[:8, j * 8:(j + 1) * 8].copy()
                           for j in range(8)])

    def mse(books):
        return float(((res - PQ._decode_mat(PQ._encode_mat(res, books),
                                            books)) ** 2).mean())

    assert mse(b1) < mse(seed_books)
