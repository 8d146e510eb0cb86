"""Property-based checks (hypothesis): the Catalyst implementations of
fingerprint / jaccard / chunking must agree with plain-Python references on
arbitrary inputs — not just the fixture corpus. Example counts are small
(each example is a Spark job); the properties, not the volume, do the work."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from parquetaivectorsearch_spark.functions.text import (
    FP_BASE,
    FP_MOD,
    char_ngrams,
    jaccard_of_sets,
    polynomial_fingerprint,
)
from parquetaivectorsearch_spark.operators.chunking import chunk_documents

# printable-ascii texts keep the ascii() fingerprint reference simple
_texts = st.lists(
    st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=120),
    min_size=1, max_size=8,
)

_SETTINGS = dict(max_examples=10, deadline=None)


def _py_fingerprint(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    return h


@settings(**_SETTINGS)
@given(_texts)
def test_fingerprint_matches_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    ).select("doc_id", polynomial_fingerprint("text").alias("fp"))
    got = {r.doc_id: r.fp for r in df.collect()}
    assert got == {i: _py_fingerprint(t) for i, t in enumerate(texts)}


@settings(**_SETTINGS)
@given(_texts)
def test_ngram_jaccard_matches_python(spark, texts):
    n = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING"
    ).select("doc_id", char_ngrams("text", n).alias("g"))
    a = df.selectExpr("doc_id AS ia", "g AS ga")
    b = df.selectExpr("doc_id AS ib", "g AS gb")
    from pyspark.sql import functions as F

    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        "ia", "ib", jaccard_of_sets("ga", "gb").alias("j")
    )
    got = {(r.ia, r.ib): r.j for r in pairs.collect()}

    def py_grams(t):
        return {t[i:i + n] for i in range(len(t) - n + 1)} if len(t) >= n else set()

    for (i, j), v in got.items():
        ga, gb = py_grams(texts[i]), py_grams(texts[j])
        expect = len(ga & gb) / len(ga | gb) if ga | gb else 0.0
        assert abs(v - expect) < 1e-12, (texts[i], texts[j])


@settings(**_SETTINGS)
@given(
    st.text(st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1, max_size=400),
    st.integers(min_value=2, max_value=50),
    st.integers(min_value=0, max_value=40),
)
def test_chunking_reconstructs_text(spark, text, size, overlap):
    if overlap >= size:
        overlap = size - 1
    stride = size - overlap
    rows = sorted(
        chunk_documents(
            spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING"),
            size=size, overlap=overlap,
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    # every chunk starts where expected and is non-empty, ≤ size
    for r in rows:
        start = r.chunk_id * stride
        assert r.chunk_text == text[start:start + size]
        assert 1 <= len(r.chunk_text) <= size
    # full coverage: last chunk reaches the end of the text
    last = rows[-1]
    assert last.chunk_id * stride + len(last.chunk_text) == len(text)


def _driver_sampled() -> set:
    """Names with driver evidence from any committed CORRECTNESS_r*.json."""
    import glob
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    seen = set()
    for p in glob.glob(str(root / "CORRECTNESS_r*.json")):
        with open(p) as fh:
            seen.update(json.load(fh))
    return seen


def test_driver_window_covers_all_suites():
    """The first 50 registered queries are the driver's correctness-check
    window. Invariants: every _DRIVER_WINDOW name exists, the window is
    exactly 50 wide (the driver samples no more), every queries_* module
    has driver evidence — from a committed CORRECTNESS_r*.json round or
    scheduled in the current window — and at least one oracle-backed
    (hash-checked, not rows-only) member per module except the by-design
    rows-only suites."""
    import collections

    from parquetaivectorsearch_spark import queries as Q

    qs, ors = Q.all_queries(), Q.all_oracles()
    missing = [n for n in Q._DRIVER_WINDOW if n not in qs]
    assert not missing, f"_DRIVER_WINDOW names not registered: {missing}"
    assert len(Q._DRIVER_WINDOW) == 50, (
        f"window is {len(Q._DRIVER_WINDOW)} wide; the driver samples exactly "
        "the first 50 — fewer wastes slots, more silently drops the tail"
    )
    assert list(qs)[:50] == list(Q._DRIVER_WINDOW), (
        "registration order does not lead with _DRIVER_WINDOW — the driver "
        "would sample the wrong queries"
    )

    evidence = set(list(qs)[:50]) | (_driver_sampled() & set(qs))
    by_module = collections.defaultdict(list)
    for name in evidence:
        by_module[qs[name].__module__.split(".")[-1]].append(name)

    all_modules = {fn.__module__.split(".")[-1] for fn in qs.values()}
    uncovered = all_modules - set(by_module)
    # Carve-out: a module added mid-round necessarily waits for the next
    # window rotation (the window is frozen at round start — rotating it
    # later would orphan the current round's evidence). Such a module is
    # exempt only if it brings at least one oracle-backed query so the next
    # rotation can hash-check it. (A module with driver-sampled members is
    # never in `uncovered` — evidence includes every sampled name — so no
    # stale-window guard is needed here.)
    for m in sorted(uncovered):
        names = [n for n, fn in qs.items()
                 if fn.__module__.split(".")[-1] == m]
        assert any(n in ors for n in names), (
            f"new module {m} awaiting rotation has no oracle-backed query")

    # every module except the by-design rows-only ones has an oracle-backed
    # (hash-checkable) query in the evidence set
    rows_only_ok = {"queries_ann", "queries_streaming"}
    weak = {m for m, names in by_module.items()
            if m not in rows_only_ok and not any(n in ors for n in names)}
    assert not weak, f"suites with only rows-only driver evidence: {weak}"


_vecs = st.lists(
    st.lists(st.floats(min_value=-1.0, max_value=1.0,
                       allow_nan=False, width=32),
             min_size=64, max_size=64),
    min_size=1, max_size=6,
)


@settings(**_SETTINGS)
@given(_vecs)
def test_binary_quantize_hamming_properties(spark, vecs):
    """Sign-bit codes on arbitrary vectors: hamming(self) = 0, symmetry,
    and every code word equals the plain-Python bit loop."""
    from parquetaivectorsearch_spark.functions.vector import (
        binary_quantize,
        hamming_distance,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    bq = binary_quantize(df)
    got = {r.vec_id: list(r.bcode) for r in bq.collect()}
    import numpy as np
    for i, v in enumerate(vecs):
        f32 = np.array(v, dtype=np.float32)
        code = 0
        for j, x in enumerate(f32):
            if x > 0:
                code |= 1 << j
        code = code - (1 << 64) if code >= (1 << 63) else code
        assert got[i] == [code], i
    pairs = (bq.alias("a").join(bq.alias("b"))
             .select(F.col("a.vec_id").alias("ia"), F.col("b.vec_id").alias("ib"),
                     hamming_distance("a.bcode", "b.bcode").alias("h")))
    h = {(r.ia, r.ib): r.h for r in pairs.collect()}
    for i in range(len(vecs)):
        assert h[(i, i)] == 0
        for j in range(len(vecs)):
            assert h[(i, j)] == h[(j, i)]


def test_binary_quantize_empty_vector(spark):
    """An empty embedding must code to ONE zero word, not two garbage words
    (sequence(0, -1) is descending in Spark — ADVICE r6 #2): hamming against
    any 64-dim code stays defined instead of NULLing out via zip-pad."""
    from parquetaivectorsearch_spark.functions.vector import (
        binary_quantize,
        hamming_distance,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, []), (1, [1.0] * 64)], "vec_id BIGINT, embedding ARRAY<FLOAT>")
    bq = binary_quantize(df)
    got = {r.vec_id: list(r.bcode) for r in bq.collect()}
    assert got[0] == [0]
    h = (bq.alias("a").join(bq.alias("b"))
         .filter(F.col("a.vec_id") == 0)
         .select(hamming_distance("a.bcode", "b.bcode").alias("h"))
         .collect())
    assert all(r.h is not None for r in h)


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False,
                          width=32), min_size=4, max_size=64))
def test_int8_quantize_error_bound(spark, vec):
    """Dequantized int8 values must sit within scale/2 of the input (the
    round-half-up invariant) on arbitrary vectors, not just fixtures."""
    from parquetaivectorsearch_spark.functions.vector import int8_quantize

    df = spark.createDataFrame([(0, [float(x) for x in vec])],
                               "vec_id BIGINT, embedding ARRAY<FLOAT>")
    r = int8_quantize(df).first()
    import numpy as np
    f32 = np.array(vec, dtype=np.float32)
    if r.scale == 0:
        assert all(q == 0 for q in r.qvec)
    else:
        deq = np.array(r.qvec, dtype=np.float64) * r.scale
        assert np.all(np.abs(deq - f32) <= r.scale / 2 + 1e-12)


@settings(**_SETTINGS)
@given(_texts)
def test_bpe_encode_invariants(spark, texts):
    """Trained-BPE encoder on arbitrary printable corpora: tokens
    concatenate back to the pre-tokenizer pieces (lossless), counts are
    positive for non-empty text, and every token is either a single char
    or the concatenation of a learned merge."""
    from parquetaivectorsearch_spark.functions import bpe as B
    from parquetaivectorsearch_spark.functions.text import _BPE_ISH

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING")
    merges = B.train_merges(df, n_merges=20)
    products = {a + b for a, b in merges}
    rows = df.select(
        "doc_id", "text",
        B.bpe_encode("text", merges).alias("toks"),
        B.bpe_token_count("text", merges).alias("n"),
    ).collect()
    for r in rows:
        assert len(r.toks) == r.n
        assert "".join(r.toks) == "".join(_BPE_ISH.findall(r.text or ""))
        for tok in r.toks:
            assert len(tok) == 1 or tok in products, tok


@settings(**_SETTINGS)
@given(_texts)
def test_pretokenizer_matches_jvm_regex(spark, texts):
    """The Python `re` pre-tokenizer (BPE trainer/encoder side) and the JVM
    regexp_extract_all (pretokenize_pieces query side) must split
    identically on arbitrary printable text — the cross-engine contract
    behind hash-checking the pre-tokenization stage."""
    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.functions.text import _BPE_ISH

    pat = _BPE_ISH.pattern
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: list(r.pieces)
        for r in df.select(
            "doc_id",
            F.regexp_extract_all("text", F.lit(pat), 0).alias("pieces"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _BPE_ISH.findall(t), t


@settings(**_SETTINGS)
@given(st.lists(
    st.text(st.sampled_from("abcd "), min_size=0, max_size=120),
    min_size=2, max_size=8,
))
def test_substring_dup_pairs_matches_python(spark, texts):
    """Windowed substring dedup on arbitrary small-alphabet corpora (tiny
    alphabet forces real window collisions) must equal a pure-Python
    reference of the same definition: distinct 8-char stride-4 windows per
    doc, pairs sharing ≥1 kept window with shared-window counts."""
    from parquetaivectorsearch_spark.operators.dedup import substring_dup_pairs

    W, S, CAP = 8, 4, 10
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING")
    got = {(r.doc_a, r.doc_b): r.n_shared_windows
           for r in substring_dup_pairs(
               docs, window=W, stride=S, max_docs_per_window=CAP,
               hashed=False).collect()}

    def wins(t):
        if len(t) < W:
            return set()
        return {t[i:i + W] for i in range(0, len(t) - W + 1, S)}

    per_doc = {i: wins(t) for i, t in enumerate(texts)}
    from collections import Counter
    freq = Counter(w for ws in per_doc.values() for w in ws)
    keep = {w for w, c in freq.items() if 2 <= c <= CAP}
    want = {}
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            n = len(per_doc[a] & per_doc[b] & keep)
            if n:
                want[(a, b)] = n
    assert got == want, (texts, got, want)


@settings(**_SETTINGS)
@given(_vecs, _vecs)
def test_maxsim_score_matches_numpy(spark, docs, qs_):
    """maxsim_score on arbitrary 64-dim vectors (4×16 token views) equals
    the direct numpy Σ-max-dot recompute for every (doc, query) pair —
    the row-local expression grid implements the published MaxSim
    definition, not just the fixture's happy path."""
    import numpy as np

    from parquetaivectorsearch_spark.functions.vector import maxsim_score
    from pyspark.sql import functions as F

    q = [float(x) for x in qs_[0]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], q) for i, v in enumerate(docs)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, query_vec ARRAY<FLOAT>",
    )
    got = {r.vec_id: r.s for r in df.select(
        "vec_id", maxsim_score("embedding", "query_vec", 4, 16).alias("s")
    ).collect()}
    qv = np.asarray(q, dtype=np.float32).astype(np.float64).reshape(4, 16)
    for i, v in enumerate(docs):
        dv = np.asarray(v, dtype=np.float32).astype(np.float64).reshape(4, 16)
        want = float((dv @ qv.T).max(axis=0).sum())
        assert abs(got[i] - want) < 1e-9, (i, got[i], want)


def test_bench_headline_names_registered():
    """Every bench HEADLINE entry must resolve in the registry (a rename
    would make bench.py crash in the driver's hands) and be unique."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import HEADLINE

    from parquetaivectorsearch_spark import queries as Q

    qs = Q.all_queries()
    missing = [n for n in HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names not registered: {missing}"
    assert len(set(HEADLINE)) == len(HEADLINE), "duplicate HEADLINE entries"
