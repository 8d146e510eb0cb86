"""Near-duplicate detection over document text (north-star operator set).

The reference has no dedup — its nearest analog is the KNN match (SURVEY
§2.7); these operators generalize it to the LLM-pipeline dedup stack:

- exact dedup: hash groupBy on the full text (canonical row = min doc_id)
- MinHash + LSH banding: shingle → minhash signature → band buckets →
  bucket self-join → jaccard verification
- SimHash: 64-bit sign-of-sums fingerprint → chunk-match candidates →
  hamming verification

Everything runs in Catalyst built-ins (higher-order functions + xxhash64),
no Python in the hot path. Scale posture (100 TB):

- The only shuffles are the band-key / chunk-key self-joins, keyed on
  short deterministic strings. Bucket sizes are bounded by construction
  (a band collision requires r equal minhashes), so the join is skew-safe;
  degenerate hot buckets (e.g. empty documents) are the one real skew risk
  — filter empties first.
- Signatures are O(k) ints per doc, tiny next to the text; candidate
  verification re-joins text for only the candidate pairs.
- MinHash permutations use h_i(x) = (a_i·x + b_i) mod p over pre-reduced
  x < p = 2^31 - 1, so a_i·x < 2^62 never overflows int64 (ANSI-safe).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions.text import char_ngrams, jaccard_of_sets, words

MERSENNE_P = 2_147_483_647  # 2^31 - 1


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: one row per distinct text with the canonical
    (minimum) id and the copy count. Single hash-aggregate shuffle."""
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


def _perm_seeds(k: int, seed: int = 42) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(k)]


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 32, shingle_n: int = 5, seed: int = 42) -> DataFrame:
    """(id, signature: array<bigint> of length k).

    Shingle hashes are computed once per doc (xxhash64 pre-reduced mod p),
    then each of the k affine permutations takes an array_min — all inside
    one whole-stage-codegen projection, no shuffle."""
    seeds = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in _perm_seeds(k, seed)
    ])
    shingle_hashes = F.transform(
        char_ngrams(text_col, shingle_n),
        lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)),
    )
    sig = F.transform(
        seeds,
        lambda ab: F.array_min(
            F.transform(shingle_hashes, lambda x: F.pmod(ab.a * x + ab.b, F.lit(MERSENNE_P)))
        ),
    )
    return docs.filter(F.length(text_col) >= shingle_n).select(
        F.col(id_col).alias("doc_id"), sig.alias("signature")
    )


def minhash_candidates(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """LSH banding: split each signature into `bands` rows, bucket by
    (band_id, band values), self-join buckets → candidate pairs (a < b)."""
    exploded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.concat_ws(
                    "_",
                    F.transform(
                        F.slice(
                            "signature",
                            j * (F.size("signature") / bands).cast("int") + 1,
                            (F.size("signature") / bands).cast("int"),
                        ),
                        lambda v: v.cast("string"),
                    ),
                ),
            )
        ).alias("band_id", "band_key"),
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 32, bands: int = 8, shingle_n: int = 5,
                  threshold: float = 0.6, seed: int = 42) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates from banding, then
    exact jaccard verification on candidate pairs only.

    Output: (doc_a, doc_b, jaccard) with jaccard ≥ threshold.
    """
    sigs = minhash_signatures(docs, text_col, id_col, k, shingle_n, seed)
    cands = minhash_candidates(sigs, bands)
    # shingle once per doc, join the gram arrays to the candidate pairs —
    # verification cost is O(candidates), shingling stays O(docs)
    grams = docs.select(
        F.col(id_col).alias("doc_id"), char_ngrams(text_col, shingle_n).alias("g")
    )
    verified = (
        cands.join(grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga")), "doc_a")
        .join(grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb")), "doc_b")
        .select("doc_a", "doc_b", jaccard_of_sets("ga", "gb").alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def simhash(text_col: str | Column, bits: int = 64) -> Column:
    """SimHash fingerprint as array<int> of `bits` 0/1 entries.

    For each bit position: sign of Σ over word-hashes of (2·bit − 1).
    Word hashes are computed once; the per-bit fold reuses them."""
    hs = F.transform(words(text_col), lambda w: F.xxhash64(w))
    # F.shiftright only takes a literal shift count; inside the HOF lambda the
    # bit index is a Column, so call the SQL function directly.
    shr = lambda h, i: F.call_function("shiftright", h, i.cast("int"))  # noqa: E731
    return F.transform(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        lambda i: F.when(
            F.aggregate(
                hs,
                F.lit(0).cast("bigint"),
                lambda acc, h: acc + (shr(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )


def simhash_chunks(bits_col: Column, n_chunks: int = 4) -> Column:
    """Pack the bit array into n_chunks integers (for LSH-style chunk
    matching: hamming ≤ d pairs must share ≥ 1 of d+1 chunks)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_chunks - 1)),
        lambda j: F.aggregate(
            F.slice(bits_col, j * (F.size(bits_col) / n_chunks).cast("int") + 1,
                    (F.size(bits_col) / n_chunks).cast("int")),
            F.lit(0).cast("bigint"),
            lambda acc, bit: acc * 2 + bit,
        ),
    )


def simhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, n_chunks: int = 4) -> DataFrame:
    """SimHash near-dup: chunk-equality candidates → exact hamming verify.

    With 4 chunks of 16 bits, any pair with hamming ≤ 3 shares at least one
    chunk (pigeonhole), so recall is exact for max_hamming ≤ 3.
    Output: (doc_a, doc_b, hamming).
    """
    fp = docs.select(
        F.col(id_col).alias("doc_id"),
        simhash(text_col).alias("bits"),
    ).select("doc_id", "bits", simhash_chunks(F.col("bits"), n_chunks).alias("chunks"))

    exploded = fp.select(
        "doc_id", "bits", F.posexplode("chunks").alias("chunk_id", "chunk_val")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.bits").alias("bits_a"),
            F.col("b.bits").alias("bits_b"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    return (
        cands.select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
