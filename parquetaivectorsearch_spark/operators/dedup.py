"""Near-duplicate detection over document text (north-star operator set).

The reference has no dedup — its nearest analog is the KNN match (SURVEY
§2.7); these operators generalize it to the LLM-pipeline dedup stack:

- exact dedup: hash groupBy on the full text (canonical row = min doc_id)
- MinHash + LSH banding: shingle → minhash signature → band buckets →
  bucket self-join → jaccard verification
- SimHash: 64-bit sign-of-sums fingerprint → chunk-match candidates →
  hamming verification

Shape note (two rounds of measurement): signature computation went
HOF-lambdas (r1, ~60s/5k docs — no CSE, the shingle-hash array re-derived
k times) → explode + groupBy with k aggregate expressions (r2-r4 — each
shingle hashed once, map-side combine) → a single Arrow-vectorized pandas
UDF over the per-doc shingle-hash array (r5). The explode/groupBy shape
was still ~120s of CPU at sf0.1: 5M exploded rows × k pmod-min aggregate
expressions is 200M interpreted expression evaluations (the generated
update method for 40 aggregates is too large for effective JIT), plus a
full shuffle of the exploded rows. Signatures are embarrassingly parallel
per document, so the right distributed shape is: hash shingles JVM-side
(xxhash64 in a transform — one pass), ship the bigint arrays to one
pandas UDF batch (Arrow), and do the k modular-min reductions as numpy
segmented reduceat over the flattened batch — no explode, no shuffle in
the signature stage at all, ~30× less CPU, identical values.

Scale posture (100 TB):
- The signature stage is a narrow map (shuffle-free); parallelism comes
  from the input partitioning (see _spread).
- Band-key / chunk-key self-joins are keyed on short deterministic
  strings; bucket sizes are bounded by construction (a band collision
  requires r equal minhashes). Degenerate hot buckets (e.g. empty
  documents) are the one real skew risk — empties are filtered out
  before the UDF.
- Signatures are O(k) ints per doc, tiny next to the text; candidate
  verification joins shingle-hash arrays (bigint, not strings) for only
  the candidate pairs.
- MinHash permutations use h_i(x) = (a_i·x + b_i) mod p over pre-reduced
  x < p = 2^31 - 1, so a_i·x < 2^62 never overflows int64 (ANSI-safe, and
  numpy int64 arithmetic matches Spark's pmod exactly).
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

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


def shingle_hash_arrays(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 5) -> DataFrame:
    """(doc_id, hashes: array<int>): pmod(xxhash64, 2^31-1) of each distinct
    shingle. Docs shorter than shingle_n are dropped (empty shingle set —
    they can't be near-dups of anything under jaccard).

    int32, not int64, ON PURPOSE: the minhash permutations reduce mod
    p = 2^31-1 anyway (so signatures are identical), and the hash arrays
    are the pipeline's dominant bytes — the checkpointed shared artifact
    AND both shuffled sides of the verification joins. Halving the element
    width measured ~1.4× on the full pipeline at sf0.1. Collision cost:
    ~1.2k shingles/doc in a 2^31 space ⇒ ~3e-4 expected extra collisions
    per doc — the same negligible-for-jaccard argument as xxhash64
    collisions, one power of two smaller.

    Shape note: this stays `transform(char_ngrams(...), xxhash64)` — HOF
    lambdas run interpreted per element (~20s CPU for 5M shingles at
    sf0.1), but spread over the cores that is 0.6s of wall. The
    "all-codegen" alternative (explode positions → substring → xxhash64 →
    collect_set) measured WORSE: collect_set is an ObjectHashAggregate,
    which is not codegen'd and falls back to sort-based aggregation above
    128 keys per partition — a 5M-row object sort per partition.

    The short-doc drop is a CHEAP pushable predicate (length >= n ⟺ the
    shingle set is non-empty), never size(transform(...)): an expensive
    filter expression gets pushed below the _spread exchange into the
    scan stage, re-shingling the whole corpus on the scan's (possibly
    single-task) parallelism."""
    t = F.col(text_col)
    return docs.filter(t.isNotNull() & (F.length(t) >= shingle_n)).select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            char_ngrams(text_col, shingle_n),
            lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)).cast("int"),
        ).alias("hashes"),
    )


def _minhash_sig_udf(seeds: list[tuple[int, int]]):
    """Arrow-batch minhash: for a batch of per-doc hash arrays, flatten to
    one int64 vector, apply each permutation vectorized, and take per-doc
    mins with np.minimum.reduceat (segmented min — one pass per
    permutation over the whole batch, no per-doc python loop)."""
    from pyspark.sql.functions import pandas_udf

    A = np.array([a for a, _ in seeds], dtype=np.int64)
    B = np.array([b for _, b in seeds], dtype=np.int64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        if n == 0:
            return pd.Series([], dtype=object)
        lengths = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n)
        # Input hashes arrive pre-reduced mod p (int32, shingle_hash_arrays);
        # promote to int64 so a·h < 2^62 never overflows. numpy floor-mod ==
        # Spark pmod for p > 0.
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes])
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        out = np.empty((len(A), n), dtype=np.int64)
        for i in range(len(A)):
            out[i] = np.minimum.reduceat((A[i] * flat + B[i]) % MERSENNE_P, offsets)
        return pd.Series(list(out.T))

    return sig


def minhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 40, shingle_n: int = 5, seed: int = 42) -> DataFrame:
    """(doc_id, signature: array<bigint> of length k), k permutation-mins
    min((a_i·h + b_i) mod p) over the doc's distinct shingle hashes —
    computed as a shuffle-free narrow map (see module docstring)."""
    sh = shingle_hash_arrays(_spread(docs, id_col), text_col, id_col, shingle_n)
    return sh.select(
        "doc_id", _minhash_sig_udf(_perm_seeds(k, seed))("hashes").alias("signature")
    )


def _band_explode(signatures: DataFrame, bands: int) -> DataFrame:
    """(doc_id, band_id, band_key): one row per signature band, keyed by
    xxhash64 of the slice (see minhash_candidates for why a hash key)."""
    return signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda j: F.xxhash64(
                    F.slice(
                        "signature",
                        j * (F.size("signature") / bands).cast("int") + 1,
                        (F.size("signature") / bands).cast("int"),
                    )
                ),
            )
        ).alias("band_id", "band_key"),
    )


def minhash_candidates(signatures: DataFrame, bands: int = 8) -> DataFrame:
    """LSH banding: split each signature into `bands` rows, bucket by
    (band_id, band_key), self-join buckets → candidate pairs (a < b). In
    minhash_dedup both sides derive from the same localCheckpoint'ed
    signature frame, so the banding pipeline is computed once (the
    explicit repartition below makes the self-join reuse one exchange).

    band_key is `xxhash64` of the signature slice — ONE bigint per band
    instead of a concat_ws string of k/bands decimal bigints (~8 bytes vs
    ~100: a ~5× smaller self-join shuffle, VERDICT r5 #5). A 2^64
    structural hash collision can only MERGE buckets (adding candidate
    pairs that exact-jaccard verification then rejects), never split one,
    so recall is unaffected."""
    exploded = _band_explode(signatures, bands)
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
    """(doc_id, g: array<int>): the distinct shingle-hash set per doc, for
    candidate verification. int set ops are ~10× cheaper than re-intersecting
    the shingle strings; mod-2^31 collisions among ~1k shingles are
    negligible for jaccard (see shingle_hash_arrays)."""
    return shingle_hash_arrays(
        _spread(docs, id_col), text_col, id_col, shingle_n
    ).select("doc_id", F.col("hashes").alias("g"))


def jaccard_of_hash_sets(ga: Column, gb: Column) -> Column:
    """|a∩b| / (|a|+|b|-|a∩b|) over distinct arrays — one intersect, no
    union-array materialization."""
    inter = F.size(F.array_intersect(ga, gb)).cast("double")
    union = (F.size(ga) + F.size(gb)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _jaccard_udf():
    """Arrow-batch jaccard over distinct hash arrays. A pandas UDF rather
    than the Column expression for the verify stage ON PURPOSE: a
    deterministic JVM filter like `jaccard_of_hash_sets(...) >= t` gets
    pushed into the verify JOIN as a residual condition, where the
    array_intersect is evaluated interpreted and re-derived again in the
    output projection (~4 evaluations per candidate pair, measured 37s CPU
    for 24k pairs at sf0.1). Python predicates cannot enter join
    conditions, so the UDF pins verification above the join — one
    intersect per pair, vectorized.

    The per-row loop is ALSO on purpose (VERDICT r5 #8 evaluated and
    rejected): a flattened segmented intersect (concatenate the batch,
    lexsort (pair, val, side), dedupe, count both-side adjacencies)
    measured 19.4s vs 0.74s for this loop on a 10k-pair × ~1.2k-hash
    batch — the O(N log N) lexsort over the 24M-element concatenation
    costs far more than the per-pair intersect1d calls it replaces."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def jac(ga: pd.Series, gb: pd.Series) -> pd.Series:
        n = len(ga)
        out = np.zeros(n, dtype=np.float64)
        for i in range(n):
            a = np.asarray(ga.iat[i])  # int32 arrays — keep native width
            b = np.asarray(gb.iat[i])
            inter = np.intersect1d(a, b).size  # sorts+uniques: robust to dup hashes
            union = a.size + b.size - inter
            if union > 0:
                out[i] = inter / union
        return pd.Series(out)

    return jac


def minhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 40, bands: int = 8, shingle_n: int = 5,
                  threshold: float = 0.6, seed: int = 42) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates from banding, then
    exact jaccard verification on candidate pairs only.

    Materialization strategy (measured at sf0.1, r5): signatures and the
    verification hash-sets are each localCheckpoint'ed once. Without the
    checkpoints the optimizer re-derives the full scan→shingle→hash chain
    in FOUR places (both sides of the banding self-join, both grams
    branches — and the grams copies land inside broadcast builds, i.e. on
    one thread). Both artifacts are O(corpus) rows of O(k) ints — tiny
    next to the text — which is exactly the DFS-persisted intermediate a
    100 TB run would write between stages anyway.

    The candidate pair set is explicitly repartitioned before verification:
    pairs are two longs, so AQE coalesces them into one partition and the
    array_intersect verification — the CPU-heavy step — would run on a
    single core. REPARTITION_BY_NUM pins the verify parallelism.

    Output: (doc_a, doc_b, jaccard) with jaccard ≥ threshold.
    """
    target = docs.sparkSession.sparkContext.defaultParallelism
    # ONE shingling pass feeds both the signatures and the verification
    # sets: the checkpointed (doc_id, hashes) arrays are the shared
    # artifact (signatures are k mins over them; jaccard intersects them).
    hashes = shingle_hash_arrays(_spread(docs, id_col), text_col, id_col,
                                 shingle_n).localCheckpoint(eager=False)
    sigs = hashes.select(
        "doc_id", _minhash_sig_udf(_perm_seeds(k, seed))("hashes").alias("signature")
    )
    cands = minhash_candidates(sigs, bands).repartition(target)
    grams = hashes.select("doc_id", F.col("hashes").alias("g"))  # collect_set: distinct
    return (
        cands.join(grams.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("ga")), "doc_a")
        .join(grams.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("gb")), "doc_b")
        .select("doc_a", "doc_b", _jaccard_udf()(F.col("ga"), F.col("gb")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _simhash_fp_udf():
    """Arrow-batch simhash: unpack each word-hash int64 into its 64 bits
    (little-endian uint8 view + np.unpackbits — bit i of the two's-
    complement value), map bits to ±1, sum per doc with np.add.reduceat,
    and re-pack the 64 sign bits into ONE int64 fingerprint (bit i set ⟺
    Σ_i ≥ 0). A packed fingerprint keeps everything downstream in codegen
    scalar ops — chunk extraction is shift+mask, hamming is
    bit_count(a XOR b) — instead of interpreted 64-element array HOFs."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def fp(hashes: pd.Series) -> pd.Series:
        n = len(hashes)
        if n == 0:
            return pd.Series([], dtype="int64")
        lengths = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=n)
        flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes])
        bits = np.unpackbits(
            flat.astype("<i8", copy=False).view(np.uint8).reshape(-1, 8),
            axis=1, bitorder="little",
        ).astype(np.int32)
        pm = bits * 2 - 1  # ±1 per (word, bit)
        offsets = np.zeros(n, dtype=np.int64)
        np.cumsum(lengths[:-1], out=offsets[1:])
        sums = np.add.reduceat(pm, offsets, axis=0)  # (n_docs, 64)
        packed = np.packbits(sums >= 0, axis=1, bitorder="little")  # (n, 8) u8
        return pd.Series(packed.view("<u8")[:, 0].view(np.int64))

    return fp


def simhash_fingerprints(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """(doc_id, fp: bigint). Bit i of fp = sign of Σ over word occurrences
    of (2·bit_i(xxhash64(word)) − 1) — frequency-weighted, the standard
    SimHash, as a shuffle-free narrow map (words hashed once JVM-side, bit
    sums vectorized in one pandas UDF — see module docstring). Docs with
    no words are dropped."""
    if bits != 64:
        raise ValueError("simhash_fingerprints packs an int64: bits must be 64")
    # Cheap pushable word-existence predicate (see shingle_hash_arrays).
    ws = _spread(
        docs.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")),
        id_col,
    ).select(
        F.col(id_col).alias("doc_id"),
        F.transform(words(text_col), lambda w: F.xxhash64(w)).alias("hashes"),
    )
    return ws.select("doc_id", _simhash_fp_udf()("hashes").alias("fp"))


def simhash_chunks(fp_col: Column, n_chunks: int = 4) -> Column:
    """The fingerprint's n_chunks disjoint 16·(4/n_chunks)-bit fields as an
    array (for LSH-style chunk matching: hamming ≤ d pairs must share ≥ 1
    of d+1 chunks). Shift+mask on the packed int64 — pure codegen."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return F.array(*[
        F.shiftrightunsigned(fp_col, width * j).bitwiseAND(F.lit(mask))
        for j in range(n_chunks)
    ])


def simhash_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, n_chunks: int = 4) -> DataFrame:
    """SimHash near-dup: chunk-equality candidates → exact hamming verify.

    With 4 chunks of 16 bits, any pair with hamming ≤ 3 shares at least one
    chunk (pigeonhole), so recall is exact for max_hamming ≤ 3.
    Output: (doc_a, doc_b, hamming).
    """
    # Checkpoint the fingerprints: the chunk-bucket self-join and the two
    # verify joins all read one materialized copy instead of re-running the
    # word-hash UDF per branch (see minhash_dedup for the persist-vs-
    # checkpoint tradeoff). Each row is two longs.
    fp = simhash_fingerprints(docs, text_col, id_col).localCheckpoint(eager=False)
    exploded = fp.select(
        "doc_id", F.posexplode(simhash_chunks(F.col("fp"), n_chunks))
        .alias("chunk_id", "chunk_val")
    ).repartition(F.col("chunk_id"), F.col("chunk_val"))
    a, b = exploded.alias("a"), exploded.alias("b")
    # Dedup candidate pairs BEFORE attaching the fingerprints: distinct
    # over two longs.
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
    # Exact hamming on the packed fingerprints: popcount of the XOR — one
    # codegen'd scalar expression per pair.
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int")
    return (
        cands.join(fp.select(F.col("doc_id").alias("doc_a"),
                             F.col("fp").alias("fp_a")), "doc_a")
        .join(fp.select(F.col("doc_id").alias("doc_b"),
                        F.col("fp").alias("fp_b")), "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def _winnow_exprs(text_col: str, window: int, stride: int) -> tuple[str, str]:
    """SQL expression pair implementing content-defined winnowing selection
    (Schleimer et al. 2003): ``keys`` builds the per-position sort keys —
    md5(window) ++ zero-padded position, so min = (min md5, then
    leftmost) — and ``sel`` keeps the winner of every length-``stride``
    run of consecutive windows (slice clips at the array end, which only
    ADDS fingerprints near the doc tail — recall-safe). Guarantee: any
    span shared by two docs of length ≥ window + stride − 1 selects at
    least one identical window in both, alignment-invariant."""
    n_w = f"(length({text_col}) - {window - 1})"
    keys = (
        f"transform(sequence(1, {n_w}), i ->"
        f" concat(md5(substring({text_col}, i, {window})),"
        f" lpad(cast(i as string), 10, '0')))")
    sel = (f"array_distinct(transform(sequence(1, {n_w}), q ->"
           f" array_min(slice(__sdp_keys, q, {stride}))))")
    return keys, sel


def substring_dup_pairs(docs: DataFrame, window: int = 32, stride: int = 16,
                        max_docs_per_window: int = 10,
                        text_col: str = "text", id_col: str = "doc_id",
                        hashed: bool = True) -> DataFrame:
    """Exact-substring dedup pairs (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better" — exact overlapping spans): winnowed
    windows per doc (Schleimer et al. 2003, "Winnowing: Local Algorithms
    for Document Fingerprinting"), grouped on window content, doc pairs
    with shared-window counts → (doc_a, doc_b, n_shared_windows), a < b.

    Selection is CONTENT-DEFINED, not stride-aligned: for every run of
    ``stride`` consecutive windows, keep the one whose md5 is minimal
    (ties on md5 — astronomically unlikely — break to the leftmost
    position). Because the winner depends only on window content, a span
    shared by two docs selects the same windows in both regardless of
    where the span starts — the winnowing theorem then gives the real
    guarantee: shared spans ≥ window + stride − 1 chars are ALWAYS
    caught, alignment-invariant. (The previous stride-aligned sampler
    only caught spans whose start offsets agreed mod stride — ~1/stride
    of random alignments.) Expected density is ~2/(stride+1) of
    positions, ≈2× the strided sampler — the price of the guarantee.
    The per-doc O(len × stride) key-comparison scan is a narrow
    codegen'd map; no shuffle is added.

    ``hashed=True`` (the 100 TB default) winnows directly on RAW xxhash64
    LONGS (VERDICT r11 #5 — the same numeric-key treatment the removal
    prefilter uses): keys, run-min selection, and the shuffled join key
    are all the same 8-byte hash, so the scan never computes an md5,
    never allocates a 42-char key string, and never re-extracts the
    selected window — the md5‖position string machinery exists ONLY so a
    SQL oracle can replay the selection, and ``hashed=False`` keeps it
    for the registered ``dedup_substring`` query. Both selections are
    content-defined, so the winnowing guarantee (shared spans ≥ window +
    stride − 1 caught at any alignment) holds for each — pinned for BOTH
    paths in tests/test_dedup.py — and the two paths select the same
    expected ~2/(stride+1) density; they just pick different
    representatives inside each run, so sub-guarantee incidental pairs
    may differ between twins (fixture pair sets are pinned equal).
    Measured (tools/removal_twophase.py A/B, min-of-3, sf0.1 / 10×): the
    md5-string selection was the dominant cost of the old hashed path,
    not the shuffle — see SCALING.md.

    Plan: ONE shuffle of the window table (explicit repartition on the key
    satisfies the distinct, the stop-window agg, and both self-join sides;
    lazily checkpointed so its three consumers reuse the materialization)
    plus the final pair agg. The ``max_docs_per_window`` stop-window cap
    bounds join fan-out on boilerplate windows — the skew guard."""
    d = docs.filter(F.length(text_col) >= window)
    if hashed:
        n_w = f"(length({text_col}) - {window - 1})"
        hkeys = (f"transform(sequence(1, {n_w}), i ->"
                 f" xxhash64(substring({text_col}, i, {window})))")
        hsel = (f"array_distinct(transform(sequence(1, {n_w}), q ->"
                f" array_min(slice(__sdp_keys, q, {stride}))))")
        wins = (d.withColumn("__sdp_keys", F.expr(hkeys))
                .select(F.col(id_col).alias("doc_id"),
                        F.explode(F.expr(hsel)).alias("win")))
    else:
        # Oracle path: selection stays md5‖position strings (DuckDB
        # replays it verbatim), but the JOIN KEY is the 60-bit md5
        # PREFIX of the winner key — the kmv family's conv trick — not
        # the re-extracted window string: identical grouping (same
        # window content ⇒ same md5 ⇒ same prefix; cross-content prefix
        # collisions are 2⁻⁶⁰ and REPLAYED IDENTICALLY by the oracle, so
        # parity is exact regardless), 8-byte shuffle keys instead of
        # 32-char strings, and no substring re-extraction. Measured
        # (SCALING.md r12 A/B): this was most of the string path's 10×
        # cost.
        keys, sel = _winnow_exprs(text_col, window, stride)
        win = (F.conv(F.substring(F.col("__sdp_wk"), 1, 15), 16, 10)
               .cast("bigint").alias("win"))
        wins = (d.withColumn("__sdp_keys", F.expr(keys))
                .withColumn("__sdp_wk", F.explode(F.expr(sel)))
                .select(F.col(id_col).alias("doc_id"), win))
    wins = wins.repartition("win")
    if not hashed:
        # md5-PREFIX keys can collide across the distinct md5‖position
        # winner strings of one doc (same content at two positions), so
        # the oracle path must dedup (doc_id, win) — exchange-free here:
        # hash(win) partitioning satisfies clustering on (doc_id, win)
        wins = wins.distinct()
    # else: raw-hash winners are array_distinct'd per doc already — a
    # distinct would be a no-op agg pass over the window table (r14)
    wins = wins.localCheckpoint(eager=False)
    keep = (wins.groupBy("win").agg(F.count("*").alias("n_docs"))
            .filter((F.col("n_docs") >= 2)
                    & (F.col("n_docs") <= max_docs_per_window))
            .select("win"))
    b = wins.select("win", F.col("doc_id").alias("doc_b"))
    return (
        wins.join(keep, "win")
        .join(b, "win")
        .filter(F.col("doc_id") < F.col("doc_b"))
        .groupBy(F.col("doc_id").alias("doc_a"), "doc_b")
        .agg(F.count("*").alias("n_shared_windows"))
    )


def substring_span_removal(docs: DataFrame, window: int = 32,
                           text_col: str = "text", id_col: str = "doc_id",
                           hashed: bool = True,
                           prefilter: bool = True) -> DataFrame:
    """The REMOVAL half of Lee et al. 2022 exact-substring dedup (the
    paper cuts duplicated spans out of the corpus; substring_dup_pairs
    only reports pairs): mark every position whose `window`-char
    substring also occurs in another doc, keep the copy in the smallest
    doc_id holding that window, and cut the merged marked spans from
    every other doc.

    DENSE windows (one per position), deliberately NOT winnowed: inside
    a shared span EVERY window is shared, so the union of marked
    [pos, pos+window-1] intervals covers the span exactly — removal gets
    full-span semantics with no alignment caveat at all. Cost is one row
    per character of the docs the dense stage sees: an O(bytes) shuffle,
    the same asymptotic bill the paper's suffix array pays, just
    distributed. No self-join anywhere — duplication is detected by a
    hash AGGREGATE on window content (min holder + distinct-holder
    count), so boilerplate windows shared by millions of docs cost one
    aggregate row, not a quadratic bucket join; `hashed=True` ships
    xxhash64 keys (8 bytes/char) for the scale run, `hashed=False` raw
    strings for the SQL oracle.

    TWO-PHASE (``prefilter=True``, the 100 TB default — VERDICT r8 #4):
    the dense stage was the repo's largest shuffle because it billed the
    WHOLE corpus one row per character even when almost nothing is
    duplicated. Phase 1 winnows at w1 = window − 4, s1 = 5, so the
    winnowing guarantee length is w1 + s1 − 1 = window EXACTLY: any
    cross-doc shared span of length ≥ window — i.e. ANY dense window the
    removal stage could mark — selects at least one identical w1-window
    in every holder, alignment-invariant. Docs holding a w1-window that
    ≥2 distinct docs hold are flagged by an AGGREGATE (count per window
    — no pair join, no stop-window cap, so boilerplate held by millions
    of docs still flags all holders), and the dense stage runs only on
    flagged docs. Every holder of every nd≥2 dense window is flagged, so
    the restricted min-holder/distinct-count aggregate — and therefore
    the output — is IDENTICAL to the single-phase computation (pinned in
    tests). Unlike the pairs operator's md5||position string keys (which
    exist so a SQL oracle can replay the selection), the prefilter is
    internal and selects on RAW xxhash64 longs — min over a numeric run,
    no md5, no substring re-extraction. w1 = window − 4 keeps the
    false-flag rate down (shorter w1 windows collide by chance: w1 = 16
    flagged 99.8% of the sf0.1 fixture vs 39% at w1 = 28, against 18%
    true holders) at winnow density 2/(s1+1) = 1/3. Shuffle-byte bill:
    (1/3 + flagged_frac) × corpus positions × 8 B vs the single-phase
    1.0 — a win whenever flagged_frac < 2/3, and the flagged-docs
    restriction also shrinks every stage after the scan (marks, islands,
    stitch).

    Windows repeated only WITHIN one doc are kept (cross-doc dedup, like
    the pairs operator). Span merging is gaps-and-islands over marked
    positions; adjacent/overlapping marks coalesce. Returns one row per
    doc that lost ≥1 span: (doc_id, n_spans, chars_removed, clean_len,
    clean_md5) — clean_md5 is md5 of the stitched remaining text, so an
    oracle hash-checks the RECONSTRUCTION, not just the counts."""
    d = docs.filter(F.length(text_col) >= window)
    if prefilter and window >= 8:
        w1 = window - 4
        s1 = window - w1 + 1  # guarantee length w1 + s1 - 1 == window
        n_w = f"(length({text_col}) - {w1 - 1})"
        keys = (f"transform(sequence(1, {n_w}), i ->"
                f" xxhash64(substring({text_col}, i, {w1})))")
        sel = (f"array_distinct(transform(sequence(1, {n_w}), q ->"
               f" array_min(slice(__spr_keys, q, {s1}))))")
        # (doc_id, w1h) is ALREADY distinct by construction —
        # array_distinct dedups winners within a doc and doc_id differs
        # across docs — so the old `.distinct()` here was a semantic
        # no-op costing a two-phase hash aggregation of the winnow
        # stream, the prefilter's biggest intermediate (removed r14,
        # guide §2.3/§2.4). The repartition STAYS: the checkpointed
        # LogicalRDD preserves outputPartitioning, so the w1h-keyed
        # exchange is what lets the `shared` groupBy and the `flagged`
        # join below run exchange-free.
        cand = (d.withColumn("__spr_keys", F.expr(keys))
                .select(F.col(id_col).alias("doc_id"),
                        F.explode(F.expr(sel)).alias("w1h"))
                .repartition("w1h").localCheckpoint(eager=False))
        shared = (cand.groupBy("w1h").agg(F.count("*").alias("nd"))
                  .filter(F.col("nd") >= 2).select("w1h"))
        # lazy checkpoint (r15, guide §5 — the before-plan showed this
        # subtree THREE times): flagged feeds the dense stage's
        # semi-join AND the final stitch join's doc restriction, and
        # without the checkpoint each consumer re-derived the
        # cand ⋈ shared aggregate from the cand checkpoint
        flagged = (cand.join(shared, "w1h")
                   .select(F.col("doc_id").alias(id_col)).distinct()
                   .localCheckpoint(eager=False))
        # left-semi restriction; AQE picks broadcast when flagged is small
        d = d.join(flagged, id_col, "left_semi")
    wins = d.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("len"),
        F.col(text_col).alias("__t"),
        F.explode(F.expr(
            f"sequence(1, length({text_col}) - {window - 1})")).alias("pos"),
    ).select("doc_id", "len", "pos",
             F.expr(f"substring(__t, pos, {window})").alias("win"))
    if hashed:
        wins = wins.withColumn("win", F.xxhash64("win"))
    # NB (r15 measured negative): checkpointing `wins` here to fuse its
    # two consumers (holders aggregate, marks join) ran SLOWER than
    # letting the narrow explode recompute — materializing the
    # one-row-per-character stream costs more than re-running a
    # codegen'd map over the flagged-restricted scan (min-of-4
    # alternating: 3.46s vs 3.21s with only the flagged checkpoint).
    holders = wins.groupBy("win").agg(
        F.min("doc_id").alias("keeper"),
        F.count_distinct("doc_id").alias("nd"))
    marks = (wins.join(holders.filter(F.col("nd") >= 2), "win")
             .filter(F.col("doc_id") > F.col("keeper"))
             .select("doc_id", "pos", "len"))
    w_prev = (Window.partitionBy("doc_id").orderBy("pos")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    isl = (marks
           .withColumn("pmax", F.max(F.col("pos") + window - 1).over(w_prev))
           .withColumn("new_isl", F.when(
               F.col("pmax").isNull()
               | (F.col("pos") > F.col("pmax") + 1), 1).otherwise(0))
           .withColumn("isl", F.sum("new_isl").over(w_run)))
    spans = isl.groupBy("doc_id", "isl").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + window - 1).alias("e"),
        F.first("len").alias("len"))
    w_doc = Window.partitionBy("doc_id").orderBy("s")
    pieces = (spans
              .withColumn("pe", F.coalesce(F.lag("e").over(w_doc), F.lit(0)))
              .join(d.select(F.col(id_col).alias("doc_id"), text_col), "doc_id")
              .withColumn("piece", F.expr(
                  f"substring({text_col}, pe + 1, s - pe - 1)")))
    return (pieces.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("chars_removed"),
        (F.first("len") - F.sum(F.col("e") - F.col("s") + 1)).alias("clean_len"),
        F.md5(F.concat(
            F.array_join(F.transform(
                F.array_sort(F.collect_list(F.struct("s", "piece"))),
                lambda x: x["piece"]), ""),
            F.expr(f"substring(any_value({text_col}), max(e) + 1)"),
        )).alias("clean_md5"),
    ))


def minhash_dedup_incremental(new_docs: DataFrame, store_path: str,
                              text_col: str = "text", id_col: str = "doc_id",
                              k: int = 40, bands: int = 8, shingle_n: int = 5,
                              threshold: float = 0.6,
                              seed: int = 42) -> DataFrame:
    """Incremental MinHash dedup: compare ONLY an arriving batch against the
    persisted corpus state (plus itself), then append the batch to the
    store — the dedup analog of streaming IVF ingestion. A 100 TB corpus
    is deduped ONCE; after that every arrival batch must not re-pair the
    world: here banding joins the (small) new side against the stored band
    keys — broadcastable when the batch is — so per-batch cost is
    O(batch × collisions), never O(corpus²) again.

    Store layout at ``store_path``: parquet (doc_id, hashes, signature) —
    the same shingle-hash/signature artifacts the batch pipeline
    checkpoints, made durable. Appends are additive files (same
    consistent-reader posture as streaming/vectors.py). Same seeds ⇒
    incremental runs compose EXACTLY to the batch result: pairs from
    (batch₁ ∪ batch₂ ∪ …) equal minhash_dedup over the union, pinned in
    tests/test_dedup.py.

    Returns (doc_a, doc_b, jaccard ≥ threshold) where ≥1 side is new.
    """
    spark = new_docs.sparkSession
    hashes = shingle_hash_arrays(_spread(new_docs, id_col), text_col, id_col,
                                 shingle_n).localCheckpoint(eager=False)
    sigs = hashes.select(
        "doc_id",
        _minhash_sig_udf(_perm_seeds(k, seed))("hashes").alias("signature"))
    new_state = hashes.join(sigs, "doc_id").localCheckpoint(eager=False)

    try:
        old_state = spark.read.parquet(store_path)
        have_old = True
    except Exception:  # first batch: no store yet
        old_state = None
        have_old = False

    new_bands = _band_explode(new_state.select("doc_id", "signature"), bands)
    # new-vs-new (small self-join, same shape as the batch pipeline)
    a, b = new_bands.alias("a"), new_bands.alias("b")
    cands = (
        a.join(b, (F.col("a.band_id") == F.col("b.band_id"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
    )
    grams_src = new_state.select("doc_id", F.col("hashes").alias("g"))
    if have_old:
        old_bands = _band_explode(old_state.select("doc_id", "signature"), bands)
        o, n = old_bands.alias("o"), F.broadcast(new_bands).alias("n")
        # the corpus-sized side streams; the batch-sized band table rides
        # the broadcast — no shuffle of the store
        cross = (
            o.join(n, (F.col("o.band_id") == F.col("n.band_id"))
                   & (F.col("o.band_key") == F.col("n.band_key"))
                   & (F.col("o.doc_id") != F.col("n.doc_id")))
            .select(F.least("o.doc_id", "n.doc_id").alias("doc_a"),
                    F.greatest("o.doc_id", "n.doc_id").alias("doc_b"))
        )
        cands = cands.union(cross)
        grams_src = grams_src.union(
            old_state.select("doc_id", F.col("hashes").alias("g")))
    cands = cands.distinct().repartition(
        spark.sparkContext.defaultParallelism)

    pairs = (
        cands.join(grams_src.select(F.col("doc_id").alias("doc_a"),
                                    F.col("g").alias("ga")), "doc_a")
        .join(grams_src.select(F.col("doc_id").alias("doc_b"),
                               F.col("g").alias("gb")), "doc_b")
        .select("doc_a", "doc_b",
                _jaccard_udf()(F.col("ga"), F.col("gb")).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
        .localCheckpoint(eager=True)  # materialize BEFORE the store mutates
    )
    new_state.write.mode("append").parquet(store_path)
    return pairs


def boilerplate_segment_removal(docs: DataFrame, seg_words: int = 8,
                                min_docs: int = 2, text_col: str = "text",
                                id_col: str = "doc_id",
                                hashed: bool = True) -> DataFrame:
    """C4-style LINE deduplication (Raffel et al. 2020 §2.2 discard
    three-sentence-repeats; Penedo et al. 2023 RefinedWeb line-level
    dedup): segment each document into units, count how many DISTINCT
    documents contain each normalized segment, and drop EVERY occurrence
    of any segment held by >= ``min_docs`` documents — the web-corpus
    boilerplate killer (nav bars, cookie banners, license footers repeat
    across thousands of pages; no holder keeps a copy, unlike
    substring_span_removal's min-holder rule, because boilerplate is
    noise, not content). The fixture corpus has no newlines, so the
    default segmentation is fixed ``seg_words``-word blocks; in a real
    web corpus the unit is the newline-split line — same plan either way.

    Scale shape (100 TB): segmentation is a narrow map over the words
    array (transform + slice — no explode until the segment rows, ~1/8th
    the word count). Frequency is ONE hash aggregate keyed on segment
    content — Spark plans count_distinct(doc_id) as a two-phase partial
    aggregate on (segment, doc_id), so a boilerplate segment shared by
    millions of docs costs one reduced row per doc, never a pair join.
    One shuffle of O(corpus bytes / seg_words) segment rows, then one
    groupBy doc_id for the stitch — strictly cheaper than the
    character-window removal's per-position bill. ``hashed=True`` keys
    the frequency aggregate on xxhash64(segment) (8-byte shuffle keys)
    and re-joins flags by hash; ``hashed=False`` ships raw segment
    strings so a SQL oracle can replay the count exactly.

    Returns one row per doc that lost >= 1 segment: (doc_id, n_segs,
    n_removed, clean_chars, clean_md5) where clean_md5 hashes the
    STITCHED remaining text (kept segments joined by ' ' in original
    order) — the reconstruction is oracle-checkable, not just counts."""
    d = docs.withColumn("__ws", words(text_col)).filter(F.size("__ws") > 0)
    segs = F.expr(
        f"transform(sequence(0, int(ceil(size(__ws) / {seg_words}.0)) - 1), "
        f"i -> array_join(slice(__ws, i * {seg_words} + 1, {seg_words}), ' '))"
    )
    e = d.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(segs).alias("seg_id", "seg"),
    )
    key = F.xxhash64("seg") if hashed else F.col("seg")
    e = e.withColumn("__k", key)
    freq = (e.groupBy("__k")
            .agg(F.count_distinct("doc_id").alias("nd")))
    j = (e.join(freq, "__k")
         .withColumn("dup", F.col("nd") >= min_docs))
    kept = F.when(~F.col("dup"), F.struct("seg_id", "seg"))
    stitched = F.array_join(
        F.transform(F.array_sort(F.collect_list(kept)), lambda x: x["seg"]),
        " ")
    return (j.groupBy("doc_id").agg(
        F.count("*").alias("n_segs"),
        F.sum(F.col("dup").cast("long")).alias("n_removed"),
        F.length(stitched).alias("clean_chars"),
        F.md5(stitched).alias("clean_md5"),
    ).filter(F.col("n_removed") >= 1))
