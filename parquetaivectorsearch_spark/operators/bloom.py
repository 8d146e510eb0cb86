"""Broadcast Bloom-filter membership ops: the zero-join scale path for
eval-set decontamination (and any "does this row contain a banned
n-gram" pass).

The join-based ``decontaminate`` query (queries_traindata.py) is the
oracle-checkable shape: explode 5-word shingles, broadcast-semi-join the
benchmark shingle set. Correct, but at 100 TB the explode materializes
~one row per corpus word through the join operator. The production
posture (what pretraining pipelines actually run — conservative removal
where a false positive just drops one extra doc) is a Bloom filter:

- build ONE bit array from the benchmark shingle set driver-side
  (eval suites are bounded: ~1e5-1e7 n-grams, and at 10 bits/key even
  1e7 keys is a 12 MB array);
- broadcast it inside an Arrow-batched UDF closure;
- one narrow scan of the corpus — shingling, hashing, and membership all
  happen vectorized inside the batch, NO explode, NO join, NO shuffle.
  The output is (doc_id, n_hits); any n_hits ≥ 1 is contaminated.

False-positive rate is the standard (1 - e^{-kn/m})^k; ``fpp`` sizes the
array (m = -n ln fpp / ln²2, k = m/n ln2). False positives only ever
REMOVE extra training docs (never leak eval data into training), which
is the safe direction — the parity test pins that bloom hits ⊇ exact
join hits on the fixtures and that the surplus is within the fpp budget.

Hashing: xxhash-free, numpy-only double hashing h1 + i*h2 (Kirsch &
Mitzenmacher 2006) over blake2b-derived 64-bit digests of the shingle
bytes — deterministic across driver (build) and executors (probe).
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import DataFrame


def _hash64_pair(shingles: "list[bytes]") -> np.ndarray:
    """(n, 2) uint64 array of (h1, h2) per shingle. blake2b(8-byte
    digests, two salts) — stdlib, stable across processes (unlike
    Python's salted hash())."""
    out = np.empty((len(shingles), 2), dtype=np.uint64)
    for i, s in enumerate(shingles):
        out[i, 0] = int.from_bytes(
            hashlib.blake2b(s, digest_size=8, salt=b"bloom-h1").digest(),
            "little")
        out[i, 1] = int.from_bytes(
            hashlib.blake2b(s, digest_size=8, salt=b"bloom-h2").digest(),
            "little")
    return out


class BloomFilter:
    """Plain m-bit / k-hash Bloom filter over byte-string keys, packed in
    a numpy uint64 array so the whole structure broadcasts as one ndarray
    and probes vectorize."""

    def __init__(self, n_keys: int, fpp: float = 1e-4) -> None:
        n = max(1, n_keys)
        m = int(np.ceil(-n * np.log(fpp) / (np.log(2) ** 2)))
        self.m = max(64, m)
        self.k = max(1, int(round(self.m / n * np.log(2))))
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)

    def _positions(self, hp: np.ndarray) -> np.ndarray:
        """(n, k) bit positions via double hashing h1 + i*h2 mod m."""
        i = np.arange(self.k, dtype=np.uint64)
        return (hp[:, 0:1] + i[None, :] * hp[:, 1:2]) % np.uint64(self.m)

    def add(self, keys: "list[bytes]") -> None:
        pos = self._positions(_hash64_pair(keys)).ravel()
        np.bitwise_or.at(self.bits, (pos // 64).astype(np.int64),
                         np.uint64(1) << (pos % np.uint64(64)))

    def contains(self, keys: "list[bytes]") -> np.ndarray:
        """Boolean array: True = possibly present (never false negatives)."""
        if not keys:
            return np.zeros(0, dtype=bool)
        pos = self._positions(_hash64_pair(keys))
        word = self.bits[(pos // np.uint64(64)).astype(np.int64)]
        hit = (word >> (pos % np.uint64(64))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)


def _shingles(text: str, n: int) -> "list[bytes]":
    words = text.split()
    return [" ".join(words[i:i + n]).encode()
            for i in range(len(words) - n + 1)]


def build_bench_bloom(bench_docs: DataFrame, text_col: str = "text",
                      n: int = 5, fpp: float = 1e-4) -> BloomFilter:
    """Driver-side build from the (small, bounded) benchmark set: collect
    its texts, shingle, insert. Eval suites are the one side of
    decontamination that genuinely fits the driver — this is the analog
    of broadcasting a dimension table, not a data-path collect."""
    texts = [r[0] for r in bench_docs.select(text_col).collect()]
    keys = sorted({s for t in texts for s in _shingles(t, n)})
    bf = BloomFilter(len(keys), fpp=fpp)
    if keys:
        bf.add(keys)
    return bf


def bloom_decontaminate(docs: DataFrame, bloom: BloomFilter,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 5) -> DataFrame:
    """One narrow pass: per Arrow batch, shingle each doc and count Bloom
    hits. Returns (doc_id, n_hits) for docs with ≥1 hit — the
    contaminated set (superset of the exact join's, by ≤ fpp per probed
    shingle). No explode, no join, no shuffle; the filter rides the UDF
    closure (cf. the broadcast-variable route — same bytes on the wire,
    fewer moving parts for a read-only ndarray)."""
    import pandas as pd

    bits, m, k = bloom.bits, bloom.m, bloom.k

    def probe(batches):
        bf = BloomFilter.__new__(BloomFilter)
        bf.bits, bf.m, bf.k = bits, m, k
        for pdf in batches:
            ids, hits = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                sh = _shingles(text, n)
                c = int(bf.contains(sh).sum()) if sh else 0
                if c:
                    ids.append(did)
                    hits.append(c)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "n_hits": pd.Series(hits, dtype="int64")})

    return docs.select(id_col, text_col).mapInPandas(
        probe, f"{id_col} BIGINT, n_hits BIGINT")
