"""Content-defined chunking (CDC) dedup: gear-hash chunk boundaries +
cross-doc chunk-hash dedup — the storage-dedup mechanism (LBFS/FastCDC
lineage) applied to corpus text.

Why a THIRD dedup mechanism next to MinHash and exact-substring: CDC
boundaries move WITH the content, so an insertion near the top of a doc
re-chunks only the edited neighborhood — every chunk after the edit
re-synchronizes and hashes identically to the original's chunks. That
makes chunk-hash equality catch shifted verbatim reuse (web re-crawls,
boilerplate-wrapped mirrors) at sub-document granularity with a plain
hash AGGREGATE: no shingling, no banding, no window self-join. The cost
model is the scan itself — one narrow Arrow pass computes boundaries and
chunk hashes, then ONE shuffle groups chunk hashes for the dedup
accounting, with rows = chunks (≈ bytes / avg_size), not characters.

Rolling hash: gear (Xia et al., FastCDC 2016 — the public algorithm):
h_i = Σ_{j=0..63} GEAR[b_{i-j}] << j (mod 2^64); a byte leaves the state
after 64 shifts, so the boundary decision depends only on the last 64
bytes — the locality that gives shift-invariance. The naive recurrence
is sequential, but the closed form above is a 64-term shifted SUM, so
the whole doc's rolling hash vectorizes as 64 numpy adds (no per-byte
Python). Boundaries: h & (avg_size-1) == 0, subject to [min_size,
max_size] enforced by a walk over CANDIDATE positions only (the ~1/avg
density survivors, not every byte).

Chunk identity: md5 of the chunk bytes (hashlib, per chunk — chunks are
hundreds of bytes, a few dozen per fixture doc).
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_rs = np.random.RandomState(0x9E3779B9 % (2**32))
GEAR = ((_rs.randint(0, 2**32, 256).astype(np.uint64) << np.uint64(32))
        | _rs.randint(0, 2**32, 256).astype(np.uint64))
del _rs


def gear_hashes(data: bytes) -> np.ndarray:
    """Per-position rolling gear hash, vectorized: out[i] =
    Σ_{j=0..63} GEAR[data[i-j]] << j (terms with i-j < 0 omitted — the
    warm-up prefix simply has fewer terms, as if preceded by zeros)."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = GEAR[b]
    h = np.zeros(len(b), dtype=np.uint64)
    for j in range(64):
        if j >= len(b):
            break
        h[j:] += g[:len(b) - j] << np.uint64(j)
    return h


def cdc_boundaries(data: bytes, avg_size: int = 64, min_size: int = 16,
                   max_size: int = 256) -> "list[int]":
    """Chunk END positions (exclusive), always terminating at len(data).
    A position i (1-based end = i+1) is a candidate cut when
    hash[i] & (avg_size-1) == 0; cuts closer than min_size to the
    previous cut are skipped, and a cut is forced at max_size."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64(avg_size - 1)
    cand = np.nonzero((gear_hashes(data) & mask) == 0)[0] + 1
    cuts, prev = [], 0
    while n - prev > max_size:
        # next candidate in (prev+min_size, prev+max_size]; else force a
        # cut at max_size (the FastCDC normal/forced split)
        ci = int(np.searchsorted(cand, prev + min_size + 1))
        if ci < len(cand) and cand[ci] <= prev + max_size:
            prev = int(cand[ci])
        else:
            prev += max_size
        cuts.append(prev)
    cuts.append(n)
    return cuts


def cdc_chunk_table(docs: DataFrame, avg_size: int = 64, min_size: int = 16,
                    max_size: int = 256, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """One narrow Arrow pass: (doc_id, chunk_idx, start, length,
    chunk_md5) per CDC chunk. The per-doc Python walk touches only
    boundary CANDIDATES (~len/avg_size survivors of the vectorized mask),
    not bytes; hashing is stdlib md5 over the chunk slices."""
    import pandas as pd

    def chunker(batches):
        for pdf in batches:
            ids, idxs, starts, lens, hashes = [], [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                data = str(text).encode("utf-8", "surrogatepass")
                prev = 0
                for k, end in enumerate(cdc_boundaries(
                        data, avg_size, min_size, max_size)):
                    ids.append(did)
                    idxs.append(k)
                    starts.append(prev)
                    lens.append(end - prev)
                    hashes.append(hashlib.md5(data[prev:end]).hexdigest())
                    prev = end
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "chunk_idx": pd.Series(idxs, dtype="int32"),
                "start": pd.Series(starts, dtype="int64"),
                "length": pd.Series(lens, dtype="int64"),
                "chunk_md5": pd.Series(hashes, dtype="object"),
            })

    return docs.select(id_col, text_col).mapInPandas(
        chunker, f"{id_col} BIGINT, chunk_idx INT, start BIGINT, "
                 "length BIGINT, chunk_md5 STRING")


def cdc_dedup_stats(docs: DataFrame, avg_size: int = 64, min_size: int = 16,
                    max_size: int = 256, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-doc CDC dedup accounting: bytes belonging to chunks that also
    occur in ANOTHER doc (cross-doc reuse — within-doc repeats don't
    count, matching the other dedup operators' semantics). ONE shuffle on
    chunk_md5 for the holder aggregate, then one on doc_id for the
    rollup. Output: (doc_id, n_chunks, n_dup_chunks, dup_bytes,
    total_bytes) for docs with ≥1 duplicated chunk."""
    chunks = cdc_chunk_table(docs, avg_size, min_size, max_size,
                             text_col, id_col).localCheckpoint(eager=False)
    holders = chunks.groupBy("chunk_md5").agg(
        F.count_distinct(id_col).alias("nd"))
    return (
        chunks.join(holders, "chunk_md5")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_chunks"),
             F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
             .alias("n_dup_chunks"),
             F.sum(F.when(F.col("nd") >= 2, F.col("length")).otherwise(0))
             .alias("dup_bytes"),
             F.sum("length").alias("total_bytes"))
        .filter(F.col("n_dup_chunks") >= 1)
    )
