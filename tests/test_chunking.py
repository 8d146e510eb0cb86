"""Chunking edge semantics: boundary math, overlap content, short docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.operators.chunking import chunk_documents, tf_idf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_documents(_docs(spark, [(1, "abc")]), size=10, overlap=3).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "abc" and out[0].chunk_id == 0


def test_chunk_exact_boundary(spark):
    # len == size → exactly one chunk, no empty trailing chunk
    out = chunk_documents(_docs(spark, [(1, "x" * 10)]), size=10, overlap=3).collect()
    assert len(out) == 1


def test_chunk_overlap_content(spark):
    text = "0123456789ABCDEF"  # 16 chars, size 10, overlap 4 → stride 6
    out = sorted(
        chunk_documents(_docs(spark, [(1, text)]), size=10, overlap=4).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.chunk_text for r in out] == ["0123456789", "6789ABCDEF"]
    # every character is covered and consecutive chunks share `overlap` chars
    assert out[0].chunk_text[-4:] == out[1].chunk_text[:4]


def test_chunk_empty_doc_dropped(spark):
    out = chunk_documents(_docs(spark, [(1, "")]), size=10, overlap=3).collect()
    assert out == []


def test_tfidf_known_corpus(spark):
    import math

    docs = _docs(spark, [(1, "a b a"), (2, "a c")])
    rows = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf) for r in tf_idf(docs).collect()}
    # 'a' appears in both docs: df=2, idf = ln(3/3)+1 = 1
    assert rows[(1, "a")] == (2, 2, 2.0)
    assert rows[(2, "a")] == (1, 2, 1.0)
    # 'b' df=1: idf = ln(3/2)+1
    expect_b = round(1 * (math.log(3 / 2) + 1), 6)
    assert rows[(1, "b")] == (1, 1, expect_b)
