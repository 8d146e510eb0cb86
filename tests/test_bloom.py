"""Bloom-filter decontamination (operators/bloom.py): filter-theoretic
invariants (no false negatives, fpp within budget), superset parity with
the exact join-based `decontaminate` oracle query, and the zero-join
plan shape that is the operator's whole point."""

from __future__ import annotations

import re

import numpy as np
import pytest

from parquetaivectorsearch_spark.operators.bloom import (
    BloomFilter,
    bloom_decontaminate,
    build_bench_bloom,
)
from tests.conftest import SF_CORRECT


def test_bloom_no_false_negatives_and_fpp_budget():
    """Every inserted key probes positive (the structural guarantee), and
    the measured false-positive rate on 20k absent keys stays within 5×
    the configured fpp (generous: m,k rounding and double-hashing shave
    the theoretical bound)."""
    rng = np.random.RandomState(7)
    present = [f"shingle {i} {rng.randint(1 << 30)}".encode()
               for i in range(5_000)]
    absent = [f"absent {i} {rng.randint(1 << 30)}".encode()
              for i in range(20_000)]
    bf = BloomFilter(len(present), fpp=1e-3)
    bf.add(present)
    assert bf.contains(present).all()
    fp = bf.contains(absent).mean()
    assert fp <= 5e-3, fp


def test_bloom_empty_and_tiny():
    bf = BloomFilter(0, fpp=1e-4)
    assert bf.contains([]).shape == (0,)
    assert not bf.contains([b"anything"]).any()
    bf2 = BloomFilter(1, fpp=1e-4)
    bf2.add([b"only"])
    assert bf2.contains([b"only"]).all()


def test_bloom_decontaminate_superset_of_exact(spark, duck):
    """Bloom hits must be a SUPERSET of the exact join's contaminated set
    (no false negatives — a missed contamination leaks eval data into
    training) and the surplus must be tiny (fpp budget: at 1e-4 per
    shingle over the fixture corpus, expected surplus ≈ 0 docs)."""
    from parquetaivectorsearch_spark.queries import all_queries

    qs = all_queries()
    exact = {r.contaminated_doc_id
             for r in qs["decontaminate"](spark, SF_CORRECT).collect()}
    got = {r.contaminated_doc_id: r.n_hits
           for r in qs["decontaminate_bloom"](spark, SF_CORRECT).collect()}
    assert exact <= set(got), sorted(exact - set(got))
    surplus = set(got) - exact
    assert len(surplus) <= 2, sorted(surplus)
    assert all(got[d] <= 2 for d in surplus), {d: got[d] for d in surplus}
    assert all(h >= 1 for h in got.values())


def test_bloom_decontaminate_plan_has_no_join(spark):
    """The scale story, pinned: the corpus pass is one mapInPandas over a
    scan — no Join node anywhere, and the only Exchange is the final
    presentation sort (the semi-join variant pays a BroadcastHashJoin and
    a per-shingle explode)."""
    from parquetaivectorsearch_spark.plans import formatted_plan
    from parquetaivectorsearch_spark.queries import all_queries

    plan = formatted_plan(
        all_queries()["decontaminate_bloom"](spark, SF_CORRECT))
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) <= 1, plan  # the orderBy only


def test_build_bench_bloom_counts_multiplicity(spark):
    """n_hits counts probing shingles, not booleans: a doc repeating a
    bench shingle 3 times reports ≥3 hits."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (20, " ".join(["alpha beta gamma delta epsilon"] * 3) + " omega")],
        "doc_id long, text string")
    bloom = build_bench_bloom(docs.filter("doc_id < 10"), n=5)
    out = {r.doc_id: r.n_hits
           for r in bloom_decontaminate(
               docs.filter("doc_id >= 10"), bloom, n=5).collect()}
    assert out[20] >= 3, out
