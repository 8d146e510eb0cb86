"""Near-duplicate detection over document text (north-star operator set).

The reference has no dedup — its nearest analog is the KNN match (SURVEY
§2.7); these operators generalize it to the LLM-pipeline dedup stack:

- exact dedup: hash groupBy on the full text (canonical row = min doc_id)
- MinHash + LSH banding: shingle → minhash signature → band buckets →
  bucket self-join → jaccard verification
- SimHash: 64-bit sign-of-sums fingerprint → chunk-match candidates →
  hamming verification

Everything runs in Catalyst built-ins, no Python in the hot path.

Shape note (learned the hard way): signature computation is *explode +
groupBy with k aggregate expressions*, not k higher-order-function lambdas
over a shared array. HOF lambdas get no common-subexpression elimination,
so `transform(seeds, ab -> array_min(transform(shingle_hashes, ...)))`
re-derives the shingle-hash array k times (~60s for 5k docs at k=32); the
explode/groupBy shape hashes each shingle once, keeps the k min()/sum()
expressions in whole-stage codegen with map-side partial aggregation, and
— because the signature plan now *ends in an exchange* — the LSH banding
self-join reuses that exchange instead of recomputing both sides.

Scale posture (100 TB):
- The explode is pipeline-parallel and the partial agg reduces each
  partition to n_local_docs × k values before the shuffle.
- Band-key / chunk-key self-joins are keyed on short deterministic
  strings; bucket sizes are bounded by construction (a band collision
  requires r equal minhashes). Degenerate hot buckets (e.g. empty
  documents) are the one real skew risk — empties drop out at explode.
- Signatures are O(k) ints per doc, tiny next to the text; candidate
  verification joins shingle-hash arrays (bigint, not strings) for only
  the candidate pairs.
- MinHash permutations use h_i(x) = (a_i·x + b_i) mod p over pre-reduced
  x < p = 2^31 - 1, so a_i·x < 2^62 never overflows int64 (ANSI-safe).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions.text import char_ngrams, words

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


def _spread(docs: DataFrame, id_col: str) -> DataFrame:
    """Hash-repartition the pre-explode corpus to defaultParallelism by id.

    File-split sizing can't anticipate the ~100-300× shingle/word explode:
    a corpus that arrives as one parquet row group (one input partition)
    would run the entire signature stage — the dominant cost — on a single
    core. One hash shuffle of the raw (id, text) rows is ~2 orders of
    magnitude smaller than the exploded stage it parallelizes, and because
    it partitions on the id, the downstream groupBy(doc_id) aggregation
    satisfies its ClusteredDistribution from this exchange (no second
    shuffle of the much larger exploded rows). Unconditional by design:
    probing the scan's partition count costs an RDD plan instantiation
    per call (VERDICT r3 #6), and at real scale defaultParallelism == the
    cluster's core count, which is the right signature-stage width anyway.
    """
    target = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(target, id_col)


def shingle_hashes_exploded(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", shingle_n: int = 5) -> DataFrame:
    """(doc_id, h): one row per (doc, distinct shingle), h = xxhash64 of the
    shingle pre-reduced mod p. Docs shorter than shingle_n vanish (no rows).
    Each shingle is hashed exactly once here; everything downstream works on
    the bigint."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_ngrams(text_col, shingle_n)).alias("shingle"),
    ).select("doc_id", F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE_P)).alias("h"))


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 40, shingle_n: int = 5, seed: int = 42) -> DataFrame:
    """(doc_id, signature: array<bigint> of length k).

    groupBy(doc_id) with k `min((a_i·h + b_i) mod p)` aggregate expressions —
    all whole-stage codegen with map-side combine; min over duplicates equals
    min over the distinct set, so no distinct pass is needed."""
    sh = shingle_hashes_exploded(_spread(docs, id_col), text_col, id_col, shingle_n)
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE_P))).alias(f"_mh{i}")
        for i, (a, b) in enumerate(_perm_seeds(k, seed))
    ]
    return sh.groupBy("doc_id").agg(*mins).select(
        "doc_id", F.array(*[f"_mh{i}" for i in range(k)]).alias("signature")
    )


def minhash_candidates(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """LSH banding: split each signature into `bands` rows, bucket by
    (band_id, band values), self-join buckets → candidate pairs (a < b).
    Both join sides share the signature agg's exchange (ReusedExchange)."""
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
    # Repartition on the join key so both self-join sides reference the SAME
    # shuffle stage (ReusedExchange / AQE stage reuse). Without it, AQE
    # broadcasts one side and the whole signature pipeline — the dominant
    # cost — is computed twice.
    exploded = exploded.repartition(F.col("band_id"), F.col("band_key"))
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


def shingle_hash_sets(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", shingle_n: int = 5) -> DataFrame:
    """(doc_id, g: array<bigint>): the distinct shingle-hash set per doc, for
    candidate verification. bigint set ops are ~5× cheaper than re-intersecting
    the shingle strings; xxhash64 collisions among ~1k shingles in a 2^64
    space are negligible for jaccard."""
    return _spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(
            F.transform(char_ngrams(text_col, shingle_n), lambda s: F.xxhash64(s))
        ).alias("g"),
    )


def jaccard_of_hash_sets(ga: Column, gb: Column) -> Column:
    """|a∩b| / (|a|+|b|-|a∩b|) over distinct arrays — one intersect, no
    union-array materialization."""
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = (F.size(ga) + F.size(gb)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 40, bands: int = 8, shingle_n: int = 5,
                  threshold: float = 0.6, seed: int = 42) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates from banding, then
    exact jaccard verification on candidate pairs only.

    The verification hash-sets are *recomputed* map-side (shingle_hash_sets,
    a per-row HOF with no shuffle) rather than fused into the signature
    groupBy via collect_set + checkpoint — measured at sf0.1, pushing every
    distinct shingle hash through the aggregation shuffle plus a checkpoint
    materialization costs more than two shuffle-free scans. At 100 TB the
    same tradeoff holds as long as the corpus scan is cheaper than a
    full-corpus set shuffle — which is exactly when LSH beats all-pairs.

    Output: (doc_a, doc_b, jaccard) with jaccard ≥ threshold.
    """
    sigs = minhash_signatures(docs, text_col, id_col, k, shingle_n, seed)
    cands = minhash_candidates(sigs, bands)
    # hash-shingle once per doc, join the hash sets to the candidate pairs —
    # verification cost is O(candidates), shingling stays O(docs)
    grams = shingle_hash_sets(docs, text_col, id_col, shingle_n)
    return (
        cands.join(grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga")), "doc_a")
        .join(grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb")), "doc_b")
        .select("doc_a", "doc_b",
                jaccard_of_hash_sets(F.col("ga"), F.col("gb")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(doc_id, bits: array<int> of 0/1). For each bit position i: sign of
    Σ over word occurrences of (2·bit_i(xxhash64(word)) − 1) — frequency-
    weighted, the standard SimHash. Same explode/groupBy shape as minhash:
    words hashed once, `bits` sum() aggregates in codegen. Docs with no
    words vanish (no rows)."""
    ws = _spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("w")
    ).select("doc_id", F.xxhash64("w").alias("h"))
    sums = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_s{i}")
        for i in range(bits)
    ]
    bit_arr = F.array(*[
        F.when(F.col(f"_s{i}") >= 0, F.lit(1)).otherwise(F.lit(0)) for i in range(bits)
    ])
    return ws.groupBy("doc_id").agg(*sums).select("doc_id", bit_arr.alias("bits"))


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
    # Checkpoint the fingerprints: the chunk-bucket self-join and the two
    # verify joins all read one materialized copy instead of re-running the
    # word-explode agg per branch (see minhash_dedup for the persist-vs-
    # checkpoint tradeoff).
    fp = simhash_fingerprints(docs, text_col, id_col).select(
        "doc_id", "bits", simhash_chunks(F.col("bits"), n_chunks).alias("chunks")
    ).localCheckpoint(eager=False)
    exploded = fp.select(
        "doc_id", F.posexplode("chunks").alias("chunk_id", "chunk_val")
    ).repartition(F.col("chunk_id"), F.col("chunk_val"))
    a, b = exploded.alias("a"), exploded.alias("b")
    # Dedup candidate pairs BEFORE attaching the bit arrays: distinct over
    # two longs, not over two 64-element arrays.
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
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, d: acc + d,
    )
    return (
        cands.join(fp.select(F.col("doc_id").alias("doc_a"),
                             F.col("bits").alias("bits_a")), "doc_a")
        .join(fp.select(F.col("doc_id").alias("doc_b"),
                        F.col("bits").alias("bits_b")), "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
