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


def test_bottomk_merge_equals_single_build(spark):
    """The quantile summary's merge rule: bottom-k over the UNION of two
    disjoint shards' summaries is row-for-row the summary built from the
    whole — the property that makes it a sketch rather than a sample.
    Shards are split by key parity so neither side alone contains the
    whole answer."""
    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.operators.sketch import (
        bottomk_merge, bottomk_summary)

    rng = np.random.RandomState(5)
    pdf = pd.DataFrame({"key": np.arange(1, 20_001, dtype=np.int64),
                        "value": rng.randint(0, 10**6, 20_000)})
    rows = spark.createDataFrame(pdf).repartition(8)
    k = 256
    whole = bottomk_summary(rows, "key", "value", k=k)
    shards = [bottomk_summary(rows.filter(F.col("key") % 2 == p),
                              "key", "value", k=k) for p in (0, 1)]
    merged = bottomk_merge(shards, k=k)
    canon = lambda df: sorted((r.key, r.value, r.h) for r in df.collect())
    assert canon(merged) == canon(whole)
    assert len(canon(whole)) == k


def test_bottomk_quantile_rank_error_bound(spark):
    """Rank-error guarantee: with k = 1024 the estimate's exact rank is
    within 3·sqrt(q(1-q)/k)·n of the target rank for every probed q on a
    heavy-tailed value distribution (a >3-sigma bound for the uniform
    sample the hash selects; sampling WITHOUT replacement only tightens
    it)."""
    from parquetaivectorsearch_spark.operators.sketch import (
        bottomk_quantiles, bottomk_summary)

    rng = np.random.RandomState(9)
    n, k = 50_000, 1024
    vals = (rng.lognormal(4.0, 1.5, n) * 100).astype(np.int64)
    pdf = pd.DataFrame({"key": np.arange(1, n + 1, dtype=np.int64),
                        "value": vals})
    rows = spark.createDataFrame(pdf).repartition(8)
    summary = bottomk_summary(rows, "key", "value", k=k)
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    est = {r.q: r.est for r in bottomk_quantiles(summary, qs, k=k).collect()}
    svals = np.sort(vals)
    for q in qs:
        exact_rank = int(np.searchsorted(svals, est[q], side="left"))
        target = int(np.floor(q * (n - 1)))
        bound = 3.0 * np.sqrt(q * (1 - q) / k) * n + 1
        assert abs(exact_rank - target) <= bound, (
            f"q={q}: rank {exact_rank} vs target {target}, bound {bound:.0f}")


def test_kmv_set_ops_accuracy_bounds(spark):
    """KMV estimates against the query's own exact audit columns: with
    k = 256 the union estimator's relative error is ~1/sqrt(k-2) ≈ 6.3%
    per pair, so 25% is a >3-sigma per-pair bound; the Jaccard match
    fraction is a Binomial(k, J) mean, bounded the same way in absolute
    terms. Also pins the estimator's structural invariants: matches ≤ k
    and inter_est ≤ union_est."""
    from parquetaivectorsearch_spark.queries import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["kmv_set_ops"](spark, SF_SMOKE).collect()
    assert rows, "no source pairs produced"
    rel_errs, jac_errs = [], []
    for r in rows:
        rel = abs(r.union_est - r.exact_union) / r.exact_union
        rel_errs.append(rel)
        assert rel <= 0.25, (r.src_a, r.src_b, r.union_est, r.exact_union)
        jac_true = r.exact_inter / r.exact_union
        jac_errs.append(abs(r.jaccard_est - jac_true))
        assert abs(r.jaccard_est - jac_true) <= 0.15, (r.src_a, r.src_b)
        assert 0.0 <= r.jaccard_est <= 1.0
        assert r.inter_est <= r.union_est + 1e-9
    assert sum(rel_errs) / len(rel_errs) <= 0.10, "mean union error > 10%"
    assert sum(jac_errs) / len(jac_errs) <= 0.08, "mean jaccard error > 8%"


@pytest.mark.parametrize("rank_frac", [0.0, 0.1, 0.5, 0.9, 1.0])
def test_exact_order_statistic_matches_numpy(spark, rank_frac):
    """Distributed selection equals np.sort for arbitrary ranks,
    including both extremes (the min/max sentinel candidates must carry
    those) and on a TIE-HEAVY distribution (values drawn from only 50
    distincts — the bracket pass must count duplicates, not distincts)."""
    from parquetaivectorsearch_spark.operators.sketch import (
        exact_order_statistic)

    rng = np.random.RandomState(13)
    n = 30_000
    vals = rng.randint(0, 50, n) * 100  # heavy ties
    pdf = pd.DataFrame({"key": np.arange(1, n + 1, dtype=np.int64),
                        "value": vals})
    rows = spark.createDataFrame(pdf).repartition(8)
    rank = int(rank_frac * (n - 1))
    got = exact_order_statistic(rows, "key", "value", rank=rank).first()
    assert got["n"] == n and got["target_rank"] == rank
    assert got["value"] == int(np.sort(vals)[rank])


def test_exact_order_statistic_default_is_median(spark):
    from parquetaivectorsearch_spark.operators.sketch import (
        exact_order_statistic)

    rng = np.random.RandomState(21)
    n = 9_999
    vals = (rng.lognormal(3.0, 1.0, n) * 100).astype(np.int64)
    pdf = pd.DataFrame({"key": np.arange(1, n + 1, dtype=np.int64),
                        "value": vals})
    got = exact_order_statistic(
        spark.createDataFrame(pdf).repartition(4), "key", "value").first()
    assert got["target_rank"] == (n - 1) // 2
    assert got["value"] == int(np.sort(vals)[(n - 1) // 2])


def test_bottomk_quantiles_short_summary_degrades_to_exact(spark):
    """ADVICE r11: when the table has fewer rows than k the summary IS
    the table, and probing ranks against the caller-declared k would
    find no row for most q (those q values silently vanished from the
    output). The fix derives k_eff from the summary's actual size, so a
    short summary degrades to EXACT quantiles — every probed q present,
    every estimate equal to numpy's discrete quantile."""
    from parquetaivectorsearch_spark.operators.sketch import (
        bottomk_quantiles, bottomk_summary)

    n, k = 100, 1024  # table far smaller than the declared sketch size
    vals = np.arange(n, dtype=np.int64) * 7
    pdf = pd.DataFrame({"key": np.arange(1, n + 1, dtype=np.int64),
                        "value": vals})
    summary = bottomk_summary(spark.createDataFrame(pdf).repartition(4),
                              "key", "value", k=k)
    qs = [0.0, 0.25, 0.5, 0.75, 1.0]
    est = {r.q: r.est for r in bottomk_quantiles(summary, qs, k=k).collect()}
    assert sorted(est) == qs, f"missing q values: {sorted(set(qs) - set(est))}"
    for q in qs:
        assert est[q] == int(vals[int(np.floor(q * (n - 1)))])


def test_exact_order_statistic_rejects_empty_and_bad_rank(spark):
    """ADVICE r11: empty input raised an opaque int(None) TypeError and
    an out-of-range rank silently produced a wrong bracket. Both now
    raise a clear ValueError before any distributed pass runs."""
    from parquetaivectorsearch_spark.operators.sketch import (
        exact_order_statistic)

    pdf = pd.DataFrame({"key": np.arange(1, 11, dtype=np.int64),
                        "value": np.arange(10, dtype=np.int64)})
    rows = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="no rows"):
        exact_order_statistic(rows.filter("value < 0"), "key", "value")
    for bad in (-1, 10, 11):
        with pytest.raises(ValueError, match="out of range"):
            exact_order_statistic(rows, "key", "value", rank=bad)
