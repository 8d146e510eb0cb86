"""Semantic checks for the dedup operators (beyond run-without-error):
MinHash-LSH recall against the exact jaccard θ-join, SimHash sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions.text import char_ngrams, jaccard_of_sets
from parquetaivectorsearch_spark.operators import dedup as DD
from parquetaivectorsearch_spark.sources import load_table
from tests.conftest import SF_SMOKE


def test_minhash_recall_vs_exact(spark):
    """Every pair the LSH pipeline reports must be a true near-dup (it
    verifies), and it must recover most true pairs at jaccard ≥ 0.8
    (40 hashes / 8 bands / r=5 → ~96% at s=0.8)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    got = {
        (r.doc_a, r.doc_b)
        for r in DD.minhash_dedup(docs, threshold=0.8, k=40, bands=8).collect()
    }
    d = docs.select("doc_id", char_ngrams("text", 5).alias("g"))
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb"))
    truth = {
        (r.doc_a, r.doc_b)
        for r in (
            a.join(b, F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", jaccard_of_sets("ga", "gb").alias("j"))
            .filter(F.col("j") >= 0.8)
        ).collect()
    }
    assert got <= truth, f"false positives: {got - truth}"
    if truth:
        recall = len(got & truth) / len(truth)
        assert recall >= 0.9, f"recall {recall:.2f} over {len(truth)} true pairs"


def test_exact_dedup_counts(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    groups = DD.exact_dedup(docs)
    assert groups.agg(F.sum("n_copies")).first()[0] == docs.count()


def test_simhash_self_consistency(spark):
    """Identical texts must land at hamming 0; the operator must not pair a
    doc with itself."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    doubled = docs.union(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    )
    pairs = DD.simhash_dedup(doubled, max_hamming=0).collect()
    clones = {(r.doc_a, r.doc_b) for r in pairs}
    expected = {(r.doc_id, r.doc_id + 1_000_000) for r in docs.collect()}
    assert expected <= clones
    assert all(r.doc_a != r.doc_b for r in pairs)
