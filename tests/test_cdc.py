"""Content-defined chunking (operators/cdc.py): gear-hash correctness
against the closed form, boundary bounds, the shift-invariance property
that IS the point of CDC, and the cross-doc dedup accounting."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from parquetaivectorsearch_spark.operators.cdc import (
    GEAR,
    cdc_boundaries,
    cdc_chunk_table,
    cdc_dedup_stats,
    gear_hashes,
)


def _chunk_hashes(data: bytes) -> "list[str]":
    prev, out = 0, []
    for end in cdc_boundaries(data):
        out.append(hashlib.md5(data[prev:end]).hexdigest())
        prev = end
    return out


def test_gear_hash_matches_sequential_recurrence():
    """The vectorized 64-term shifted sum must equal the textbook
    sequential recurrence h = (h << 1) + GEAR[b] (mod 2^64) — same
    values, every position."""
    rng = np.random.RandomState(0)
    data = bytes(rng.randint(0, 256, 300, dtype=np.uint8))
    got = gear_hashes(data)
    h = np.uint64(0)
    for i, byte in enumerate(data):
        h = (h << np.uint64(1)) + GEAR[byte]  # uint64 wraps mod 2^64
        assert got[i] == h, i


def test_cdc_boundary_bounds_and_determinism():
    rng = np.random.RandomState(1)
    data = bytes(rng.randint(32, 127, 8000, dtype=np.uint8))
    cuts = cdc_boundaries(data, avg_size=64, min_size=16, max_size=256)
    assert cuts == cdc_boundaries(data, avg_size=64, min_size=16,
                                  max_size=256)
    lens = np.diff([0] + cuts)
    assert cuts[-1] == len(data)
    assert lens.max() <= 256
    assert (lens[:-1] > 16).all()  # the final fragment may be short
    # average in the designed ballpark (mask density 1/64 + clamps)
    assert 32 <= lens.mean() <= 160, lens.mean()
    with pytest.raises(ValueError, match="power of two"):
        cdc_boundaries(data, avg_size=100)
    assert cdc_boundaries(b"") == []


def test_cdc_resynchronizes_after_misalignment():
    """THE CDC property: prepending an arbitrary-length prefix shifts
    every byte offset, yet ≥80% of the original chunks reappear with
    identical hashes — fixed-stride chunking would share ~none. Checked
    at several prefix lengths including 1 (worst alignment)."""
    rng = np.random.RandomState(2)
    data = bytes(rng.randint(32, 127, 6000, dtype=np.uint8))
    base = _chunk_hashes(data)
    for plen in (1, 37, 137, 500):
        shifted = _chunk_hashes(
            bytes(rng.randint(32, 127, plen, dtype=np.uint8)) + data)
        frac = len(set(base) & set(shifted)) / len(base)
        assert frac >= 0.8, (plen, frac)


def test_cdc_chunk_table_covers_text_exactly(spark):
    """Chunks tile each doc: starts/lengths are contiguous from 0 to the
    byte length, chunk_idx is dense, and each chunk_md5 matches a
    driver-side md5 of the same slice."""
    docs = spark.createDataFrame(
        [(1, "x" * 50), (2, "the quick brown fox " * 40), (3, "")],
        "doc_id long, text string")
    rows = sorted(cdc_chunk_table(docs).collect(),
                  key=lambda r: (r.doc_id, r.chunk_idx))
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # empty doc -> no chunks
    texts = {1: b"x" * 50, 2: b"the quick brown fox " * 40}
    for did, rs in by_doc.items():
        pos = 0
        for k, r in enumerate(rs):
            assert r.chunk_idx == k
            assert r.start == pos
            want = hashlib.md5(texts[did][pos:pos + r.length]).hexdigest()
            assert r.chunk_md5 == want
            pos += r.length
        assert pos == len(texts[did])


def test_cdc_dedup_stats_flags_shifted_reuse(spark):
    """Two docs embedding the SAME 2 KB span at different offsets must
    both report duplicated bytes covering most of the span; a clean doc
    reports nothing. This is shifted reuse — the case exact-window dedup
    needs one row per character to catch and fixed-stride chunking
    misses entirely."""
    rng = np.random.RandomState(3)
    span = "".join(chr(c) for c in rng.randint(97, 123, 2000))
    pada = "".join(chr(c) for c in rng.randint(97, 123, 301))
    padb = "".join(chr(c) for c in rng.randint(97, 123, 543))
    clean = "".join(chr(c) for c in rng.randint(97, 123, 2500))
    docs = spark.createDataFrame(
        [(1, pada + span), (2, padb + span + pada), (3, clean)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in cdc_dedup_stats(docs).collect()}
    assert set(out) == {1, 2}
    want_len = {1: len(pada + span), 2: len(padb + span + pada)}
    for did in (1, 2):
        assert out[did].dup_bytes >= 1200, (did, out[did])
        assert out[did].n_dup_chunks >= 5
        assert out[did].total_bytes == want_len[did]
