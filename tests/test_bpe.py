"""True-BPE trainer/encoder tests (VERDICT r6 next-round item 3).

The hand-computed example pins the exact Sennrich training semantics
(most-frequent pair, lexicographic tie-break, merge all occurrences), and
the corpus parity test pins the distributed Arrow-UDF encoder to an
independent pure-Python re-implementation run on the driver.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions import bpe as B
from tests.conftest import SF_CORRECT


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id BIGINT, text STRING")


def test_train_merges_hand_computed(spark):
    # corpus pieces: "abab" ×2, "abc" ×1 (single-token docs, no spaces)
    d = _docs(spark, ["abab", "abab", "abc"])
    merges = B.train_merges(d, n_merges=3)
    # pair counts round 1: (a,b)=5, (b,a)=2, (b,c)=1 → merge ('a','b')
    # round 2 over {(ab,ab):2, (ab,c):1}: (ab,ab)=2, (ab,c)=1 → ('ab','ab')
    # round 3: only (ab,c)=1 remains
    assert merges == [("a", "b"), ("ab", "ab"), ("ab", "c")]


def test_encode_and_count_hand_computed(spark):
    train = _docs(spark, ["abab", "abab", "abc"])
    merges = B.train_merges(train, n_merges=3)
    d = _docs(spark, ["ababc", "abab", "abc", "", "zzz"])
    rows = {
        r.doc_id: (r.toks, r.n)
        for r in d.select(
            "doc_id",
            B.bpe_encode("text", merges).alias("toks"),
            B.bpe_token_count("text", merges).alias("n"),
        ).collect()
    }
    # "ababc": a,b,a,b,c → rank0 merges all (a,b) → ab,ab,c → rank1 →
    # abab,c; no (abab,c) merge learned → 2 tokens
    assert rows[0] == (["abab", "c"], 2)
    assert rows[1] == (["abab"], 1)
    # "abc": ab,c → rank2 ('ab','c') → abc → 1 token
    assert rows[2] == (["abc"], 1)
    assert rows[3] == ([], 0)
    # unseen chars never merge
    assert rows[4] == (["z", "z", "z"], 3)


def test_tie_break_is_lexicographic(spark):
    # "ab" and "cd" both appear twice → counts tie at 2; ('a','b') < ('c','d')
    d = _docs(spark, ["ab", "ab", "cd", "cd"])
    merges = B.train_merges(d, n_merges=1)
    assert merges == [("a", "b")]


def test_corpus_parity_with_pure_python(spark):
    """The Arrow-UDF encoder must equal an independent driver-side
    re-implementation (regex → per-piece merge loop) on real fixture text."""
    from parquetaivectorsearch_spark.sources import load_table

    docs = load_table(spark, SF_CORRECT, "documents").limit(40).cache()
    merges = B.train_merges(docs, n_merges=120)
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", B.bpe_token_count("text", merges).alias("n")).collect()
    }

    ranks = {p: i for i, p in enumerate(merges)}
    pretok = re.compile(
        r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^\sA-Za-z0-9]+|\s+")

    def encode(piece):
        parts = list(piece)
        while len(parts) > 1:
            cands = [(ranks[(parts[i], parts[i + 1])], i)
                     for i in range(len(parts) - 1)
                     if (parts[i], parts[i + 1]) in ranks]
            if not cands:
                break
            a, b = merges[min(c[0] for c in cands)]
            out, i = [], 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        return parts

    for r in docs.select("doc_id", "text").collect():
        want = sum(len(encode(p)) for p in pretok.findall(r.text or ""))
        assert got[r.doc_id] == want, r.doc_id


def test_more_merges_never_increase_counts(spark):
    docs = _docs(spark, ["the cat sat on the mat", "the the the",
                         "a b c d e f g", "compression compresses"])
    m_small = B.train_merges(docs, n_merges=5)
    m_big = B.train_merges(docs, n_merges=50)
    assert m_big[:5] == m_small  # training is a deterministic prefix
    small = {r.doc_id: r.n for r in docs.select(
        "doc_id", B.bpe_token_count("text", m_small).alias("n")).collect()}
    big = {r.doc_id: r.n for r in docs.select(
        "doc_id", B.bpe_token_count("text", m_big).alias("n")).collect()}
    assert all(big[k] <= small[k] for k in small)


def test_token_count_query_registered(spark):
    """The upgraded token_count query: positive counts for non-empty docs,
    fewer tokens than characters (merges actually fire on natural text)."""
    from parquetaivectorsearch_spark.queries import all_queries
    from parquetaivectorsearch_spark.sources import load_table

    df = all_queries()["token_count"](spark, SF_CORRECT)
    rows = df.join(
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    ).collect()
    assert rows
    for r in rows:
        if r.n_chars and r.n_chars > 0:
            assert 0 < r.bpe_tokens <= r.n_chars
