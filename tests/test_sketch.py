"""Misra-Gries sketch + two-pass exact heavy hitters (operators/sketch.py).

Pins the three claims the operator's guarantee rests on:
- the shrink rule caps summary size and only ever UNDER-counts;
- a term absent from a fold's summary has true count ≤ n/(k+1)
  (the miss bound the candidate-superset argument needs);
- the distributed two-pass answer equals the naive exact groupBy on
  skewed data, for several thresholds — i.e. the sketch never costs
  correctness, only shuffle width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from parquetaivectorsearch_spark.operators.sketch import (
    heavy_hitters_exact,
    mg_fold,
    mg_shrink,
    partition_summaries,
)


def _zipf_terms(n: int, vocab: int, seed: int) -> pd.Series:
    rng = np.random.RandomState(seed)
    ranks = rng.zipf(1.3, size=n * 3) % vocab  # heavy-tailed, bounded
    return pd.Series([f"t{r}" for r in ranks[:n]], name="term")


def test_mg_shrink_caps_size_and_undercounts():
    s = pd.Series({f"t{i}": 100 - i for i in range(40)})
    out = mg_shrink(s, 8)
    assert len(out) <= 8
    # every retained count is the original minus the same decrement
    m = sorted(s.to_numpy())[-9]  # (k+1)-th largest
    for term, cnt in out.items():
        assert cnt == s[term] - m
        assert cnt > 0
    assert mg_shrink(s, 100) is s  # no-op when under capacity


@pytest.mark.parametrize("k", [4, 16, 64])
def test_mg_fold_miss_bound(k):
    terms = _zipf_terms(20_000, 500, seed=7)
    batches = [terms[i : i + 1000].value_counts() for i in range(0, len(terms), 1000)]
    summary, n = mg_fold(iter(batches), k)
    assert n == len(terms)
    assert len(summary) <= k
    exact = terms.value_counts()
    absent = exact[~exact.index.isin(summary.index)]
    if len(absent):
        assert absent.max() <= n / (k + 1)
    # retained counts are lower bounds on the truth
    for term, cnt in summary.items():
        assert cnt <= exact[term]


def test_partition_summary_rows_bounded(spark):
    pdf = pd.DataFrame({"term": _zipf_terms(30_000, 2000, seed=3)})
    items = spark.createDataFrame(pdf).repartition(8)
    k = 50
    rows = partition_summaries(items, "term", k).toPandas()
    per_part_totals = rows[rows["term"].isnull()]
    assert per_part_totals["cnt"].sum() == 30_000
    # ≤ k candidate rows + 1 total row per partition
    assert len(rows) <= 8 * (k + 1)


@pytest.mark.parametrize("phi_denom", [50, 200, 1000])
def test_heavy_hitters_exact_matches_naive(spark, phi_denom):
    pdf = pd.DataFrame({"term": _zipf_terms(25_000, 800, seed=11)})
    items = spark.createDataFrame(pdf).repartition(8)
    got = {
        r["term"]: (r["cnt"], r["total"])
        for r in heavy_hitters_exact(items, "term", phi_denom).collect()
    }
    exact = pdf["term"].value_counts()
    n = int(exact.sum())
    want = {t: int(c) for t, c in exact.items() if c * phi_denom >= n}
    assert set(got) == set(want)
    for t, c in want.items():
        assert got[t] == (c, n)


def test_cms_overestimates_and_merges(spark):
    """Count-Min invariants on a vocab dense enough to force collisions
    (2000 ids into d=2 x w=16): (a) one-sided error — est >= true for
    EVERY probe, with at least one genuine collision overestimate at
    this density; (b) mergeability — cell-wise ADDITION of two sketches
    built from disjoint halves equals the sketch of the whole."""
    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.operators.sketch import (
        cms_build, cms_estimate)

    counted = spark.createDataFrame(
        [(i, (i % 7) + 1) for i in range(1, 2001)], "vid BIGINT, cnt BIGINT")
    cells = cms_build(counted, d=2, w=16)
    est = cms_estimate(cells, counted.select("vid", "cnt"), d=2, w=16)
    rows = est.collect()
    assert len(rows) == 2000
    assert all(r.cms_est >= r.cnt for r in rows)
    assert any(r.cms_est > r.cnt for r in rows)  # collisions happen at w=16

    lo = counted.filter(F.col("vid") <= 1000)
    hi = counted.filter(F.col("vid") > 1000)
    merged = (cms_build(lo, d=2, w=16)
              .unionByName(cms_build(hi, d=2, w=16))
              .groupBy("j", "col").agg(F.sum("cell").alias("cell")))
    whole = {(r.j, r.col): r.cell for r in cells.collect()}
    got = {(r.j, r.col): r.cell for r in merged.collect()}
    assert got == whole
