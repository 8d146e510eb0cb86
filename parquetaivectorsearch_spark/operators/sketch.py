"""Mergeable sketches: Misra-Gries partition summaries (with the two-pass
EXACT heavy-hitters operator built on them), the Count-Min frequency tier,
and the bottom-k quantile summary.

The reference counts tokens exactly per document (Program.cs:80-116);
a corpus-curation pipeline additionally needs corpus-WIDE frequent-item
answers ("which n-grams dominate the corpus?") where the naive plan —
groupBy over every exploded item — shuffles one row per corpus token.
At 100 TB that is the single biggest shuffle a frequency question can
cost, and it is unnecessary: frequent-item candidates are obtainable
from a bounded per-partition sketch, and EXACTNESS is recoverable with
a second pass restricted to those candidates (the classic two-pass
scheme; Misra & Gries 1982, "Finding repeated elements"; merge rule
from Agarwal et al. 2012, "Mergeable summaries").

Shape:

- **Phase 1 (no shuffle):** each input partition folds its items into a
  Misra-Gries summary of capacity ``k`` inside one ``mapInPandas`` pass
  — per Arrow batch a vectorized ``value_counts`` (never per-row
  Python), merged into the running summary, shrunk whenever it exceeds
  ``2k`` by the standard decrement rule (subtract the (k+1)-th largest
  count, drop non-positives). Output per partition: ≤ k candidate rows
  + one NULL-term row carrying the partition's item count. Total
  output ≤ partitions × (k+1) rows regardless of corpus size.
- **Guarantee:** every shrink event subtracts its decrement ``m`` from
  > k surviving entries, so Σm ≤ n_p/(k+1); a term absent from the
  final summary therefore has partition count ≤ n_p/(k+1). Union over
  partitions: a term absent from EVERY summary has global count
  ≤ N/(k+1). With ``k = phi_denom`` the threshold count N/phi_denom is
  strictly above that bound, so the candidate union is a SUPERSET of
  the true heavy hitters — no false negatives, ever.
- **Phase 2 (shuffle only the candidates):** broadcast-semi-join the
  item stream against the candidate set, exact groupBy count on the
  survivors, keep ``cnt * phi_denom >= N``. The answer is EXACT and
  equals the naive full groupBy — which is precisely what the DuckDB
  oracle runs.

On the uniform word-soup fixture the candidate set prunes little (a
uniform distribution is the heavy-hitter worst case — documented, not
hidden); on Zipfian corpora the phase-2 shuffle carries ~k distinct
keys instead of the full vocabulary.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_shrink(summary: pd.Series, k: int) -> pd.Series:
    """One Misra-Gries shrink: if more than ``k`` entries, subtract the
    (k+1)-th largest count from every entry and drop non-positives.
    Pure + vectorized so the guarantee is unit-testable off-Spark."""
    if len(summary) <= k:
        return summary
    vals = summary.to_numpy()
    m = vals[vals.argpartition(len(vals) - (k + 1))[len(vals) - (k + 1)]]
    out = summary[summary > m] - m
    return out


def mg_fold(batches: Iterator[pd.Series], k: int) -> tuple[pd.Series, int]:
    """Fold pre-counted batches into a capacity-``k`` Misra-Gries summary;
    returns (summary lower-bound counts, total item count folded)."""
    acc: pd.Series | None = None
    n = 0
    for counts in batches:
        n += int(counts.sum())
        acc = counts if acc is None else acc.add(counts, fill_value=0)
        if len(acc) > 2 * k:
            acc = mg_shrink(acc, k)
    if acc is None:
        acc = pd.Series(dtype="float64")
    return mg_shrink(acc, k), n


def partition_summaries(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ≤ k (term, lower-bound count)
    rows per partition plus one (NULL, partition item count) row. One
    narrow map stage — no shuffle, no Python per-row loop (batch counts
    come from pandas ``value_counts``)."""

    def summarize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary, n = mg_fold(
            (pdf[item_col].value_counts() for pdf in pdfs), k
        )
        out = pd.DataFrame(
            {"term": summary.index.astype(object), "cnt": summary.to_numpy("int64")}
        )
        yield pd.concat(
            [out, pd.DataFrame({"term": [None], "cnt": [n]})], ignore_index=True
        )

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        summarize, f"{item_col} string, cnt long"
    )


def heavy_hitters_exact(
    items: DataFrame, item_col: str, phi_denom: int
) -> DataFrame:
    """EXACT heavy hitters: every item with count*phi_denom >= N (i.e.
    frequency ≥ 1/phi_denom of the stream), computed with the two-pass
    Misra-Gries scheme documented in the module docstring. Output:
    (term, cnt, total) — integers end-to-end, hash-stable.

    The summary table is localCheckpoint'ed (≤ partitions × (k+1) rows)
    because both the candidate set and the stream total N derive from
    it; without the checkpoint phase 1 would re-scan the input twice.
    """
    summaries = partition_summaries(items, item_col, phi_denom).localCheckpoint(
        eager=False
    )
    cands = (
        summaries.filter(F.col("term").isNotNull()).select("term").distinct()
    )
    total = summaries.filter(F.col("term").isNull()).agg(
        F.sum("cnt").alias("total")
    )
    exact = (
        items.select(F.col(item_col).alias("term"))
        .join(F.broadcast(cands), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * phi_denom >= F.col("total"))
        .select("term", "cnt", "total")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable, oracle-exact
# ---------------------------------------------------------------------------

CMS_P = 2147483647  # Mersenne prime 2^31 - 1
CMS_A = (131071, 524287, 2147483647 % 999983, 6700417)
CMS_B = (12289, 786433, 40503, 69857)


def _cms_hashes(spark, d: int):
    return spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(zip(CMS_A[:d], CMS_B[:d]))],
        "j INT, a BIGINT, b BIGINT")


def _cms_col(w: int):
    # Reduce vid mod P BEFORE the multiply, and use pmod, not %:
    # (a·vid + b) mod P == (a·(vid mod P) + b) mod P, and with
    # vid mod P < 2³¹ and a < 2²³ the product stays < 2⁵⁴ — no int64
    # overflow in any engine (Spark's ANSI mode THROWS on long overflow,
    # so snowflake-scale uids previously aborted the build outright).
    # pmod (non-negative, Python/numpy semantics) rather than Spark's
    # dividend-sign %, so negative vids land in the same cells as the
    # numpy streaming twin (streaming/events.type_cms_cells, ADVICE
    # r12). For small positive vids (e.g. row_number vids in the
    # registered cms_frequency query) this is bit-identical to the old
    # formula, so oracles and pinned fixtures are unchanged.
    return F.pmod(F.pmod(F.col("vid"), F.lit(CMS_P)) * F.col("a")
                  + F.col("b"), F.lit(CMS_P)) % F.lit(w)


def cms_build(counted: DataFrame, d: int = 4, w: int = 256) -> DataFrame:
    """Build the d×w Count-Min cell table from a pre-counted
    (vid BIGINT, cnt) frame — equivalent to per-item inserts but one
    groupBy on (j, col). Cells are plain sums, so two sketches built
    from disjoint data MERGE by cell-wise addition (pinned in tests) —
    the property that makes CMS the streaming/shard-parallel frequency
    tier. Hash family pmod(a·vid + b, P) mod w, P = 2³¹−1: integer-only,
    replayable in any engine (non-negative pmod semantics so the numpy
    streaming twin agrees for negative / int64-wrapping vids)."""
    spark = counted.sparkSession
    return (counted.crossJoin(F.broadcast(_cms_hashes(spark, d)))
            .groupBy("j", _cms_col(w).alias("col"))
            .agg(F.sum("cnt").cast("bigint").alias("cell")))


def cms_estimate(cells: DataFrame, probes: DataFrame,
                 d: int = 4, w: int = 256) -> DataFrame:
    """Point estimates for a (vid[, …]) probe frame: est = min over the
    d rows of the probed cells — one-sided (est ≥ true; est ≤ true + εN
    w.h.p., ε = e/w). Returns the probe columns + ``cms_est``."""
    spark = probes.sparkSession
    keys = [c for c in probes.columns]
    return (probes.crossJoin(F.broadcast(_cms_hashes(spark, d)))
            .withColumn("col", _cms_col(w))
            .join(F.broadcast(cells), ["j", "col"])
            .groupBy(*keys)
            .agg(F.min("cell").alias("cms_est")))


# ---------------------------------------------------------------------------
# Bottom-k quantile summary (Cohen & Kaplan 2007) — mergeable, oracle-exact
# ---------------------------------------------------------------------------
#
# The quantile tier of the sketch family (CMS = frequency, HLL = distinct,
# Misra-Gries = heavy hitters, Bloom = membership). Of the published
# mergeable quantile summaries, KLL/GK/t-digest all make data-dependent
# compaction decisions that no SQL oracle can replay; the bottom-k-by-hash
# summary (the fixed-size uniform sample under a shared deterministic hash;
# Cohen & Kaplan 2007, "Summarizing data using bottom-k sketches") gives the
# same O(1/sqrt(k)) rank-error guarantee while every byte of the summary —
# and therefore every estimate — is replayable by any engine that can sort.
# Merge rule: bottom-k of the union of summaries, because the k smallest
# hashes of A ∪ B are a subset of (k smallest of A) ∪ (k smallest of B).

BK_A, BK_B = 524287, 12289  # shared with the CMS family; P = CMS_P


def bottomk_hash(key):
    """The summary's deterministic hash: (a·key + b) mod P, P = 2³¹−1,
    computed as pmod(pmod(key, P)·a + b, P) — key reduced first so the
    product stays < 2⁵⁰ (ANSI Spark throws on int64 overflow), pmod
    (non-negative, Python/numpy semantics) rather than Spark's
    dividend-sign % so negative keys hash identically in the numpy
    streaming twin (streaming/events.type_quantile_bottomk).
    Bit-identical to the old formula for the small non-negative keys
    every registered query feeds it, so oracles are unchanged."""
    return F.pmod(F.pmod(F.col(key), F.lit(CMS_P)) * F.lit(BK_A)
                  + F.lit(BK_B), F.lit(CMS_P))


def bottomk_summary(rows: DataFrame, key_col: str, value_col: str,
                    k: int = 1024) -> DataFrame:
    """The k rows with the smallest hash(key) — a fixed-size uniform sample
    that IS the sketch. Compiles to TakeOrderedAndProject: each task ships
    at most k rows to the driver-side merge, so the summary costs one
    narrow pass at any corpus size. Output: (key, value, h)."""
    return (rows.select(F.col(key_col).alias("key"),
                        F.col(value_col).alias("value"))
            .withColumn("h", bottomk_hash("key"))
            .orderBy("h", "key").limit(k))


def bottomk_summary_grouped(rows: DataFrame, group_col: str, key_col: str,
                            value_col: str, k: int = 64) -> DataFrame:
    """Independent bottom-k summary per group, from ONE static-rank
    window: rn ≤ k over (hash, key) within each group compiles to a
    MAP-SIDE WindowGroupLimit below the exchange (plan-pinned in
    tests/test_plans.py), so a mega-group ships at most k rows per input
    partition instead of full-sorting on one reducer. Output:
    (group, key, value) — under-k groups keep all their rows (their
    quantiles degrade to exact)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy("h", key_col)
    return (rows.select(F.col(group_col).alias(group_col),
                        F.col(key_col).alias(key_col),
                        F.col(value_col).alias(value_col))
            .withColumn("h", bottomk_hash(key_col))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(group_col, key_col, value_col))


def bottomk_merge(summaries: list[DataFrame], k: int = 1024) -> DataFrame:
    """Merge by union + re-take: hashes are a shared function of the key,
    so the k smallest of the union are exactly the k smallest of the
    concatenated summaries (pinned in tests against a single build)."""
    acc = summaries[0]
    for s in summaries[1:]:
        acc = acc.unionByName(s)
    return acc.orderBy("h", "key").limit(k)


def bottomk_quantiles(summary: DataFrame, qs: list[float],
                      k: int) -> DataFrame:
    """Quantile estimates from the summary: for each q, the value at
    row_number floor(q·(k_eff−1)) + 1 of the summary ordered by
    (value, key) — the discrete quantile of the sample, deterministic
    under ties. k_eff is the summary's ACTUAL row count (computed in the
    same plan, no extra action), not the caller-declared k: a table
    smaller than k, or a merge of short shards, yields a summary of
    fewer rows, and probing ranks against the declared k would silently
    drop those q values instead of degrading to exact quantiles (the
    grouped variant already handles this via k_g). `k` is kept as a
    documented upper bound for API compatibility. Returns (q, est); the
    summary is ≤ k rows so this is driver-light."""
    from pyspark.sql.window import Window

    spark = summary.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q DOUBLE")
    ranked = (summary
              .withColumn("rn",
                          F.row_number().over(Window.orderBy("value", "key")))
              .withColumn("k_eff",
                          F.count("*").over(Window.partitionBy(F.lit(1)))))
    return (qdf.join(ranked,
                     F.col("rn")
                     == F.floor(F.col("q") * (F.col("k_eff") - 1)) + 1)
            .select("q", F.col("value").alias("est")))


def exact_order_statistic(rows: DataFrame, key_col: str, value_col: str,
                          rank: int | None = None,
                          sample_k: int = 1024,
                          margin: int = 64) -> DataFrame:
    """EXACT r-th order statistic (0-based, ascending) of an integer
    value column WITHOUT a global sort — distributed selection in three
    fixed passes (the Munro-Paterson/BFPRT posture, steered by the
    bottom-k sample):

    1. one agg pass: n, global min/max (rank defaults to the median
       (n−1)//2 when not given);
    2. one count pass: the bottom-k summary's values around the expected
       sample position ±margin become ≤ 2·margin+3 candidate pivots
       (global min/max always included, so a bracket ALWAYS exists —
       no retry loop); count(v < c) for all candidates in ONE shared
       scan (broadcast candidates, conditional sums); the true statistic
       lies in [c_lo, c_hi] = the adjacent candidates bracketing the
       target rank. The sample quantile's rank error is
       ~sqrt(k)/2 sample positions, so margin=64 ≈ 8 sigma at k=1024;
       min/max sentinels make an escape mathematically irrelevant but
       still safe;
    3. one bracket pass: groupBy the values INSIDE the bracket (≈ n·
       (2·margin/k) of the data — never collected; stays a DataFrame),
       running-count window over the bounded distinct-value set, pick
       the smallest value whose cumulative count passes the target.

    Driver pulls are the k-row sample, ~130 candidate counts, and the
    final scalar — all bounded at any corpus size. Returns a 1-row
    (n, target_rank, value) frame."""
    from pyspark.sql.window import Window

    spark = rows.sparkSession
    li = rows.select(F.col(key_col).alias("key"),
                     F.col(value_col).alias("value")) \
        .localCheckpoint(eager=False)  # reused by all passes
    if rank is None:
        # MEDIAN (the registered query's case): the sample position for
        # q = 0.5 is the middle of the sample — no n needed up front —
        # and ±2⁶³ sentinel candidates make the bracket unconditional
        # (lt(MIN) = 0 ≤ target always brackets below; lt(MAX) = n
        # always brackets above AND delivers n itself), so the r13
        # n/min/max agg pass FUSES into the candidate-count pass: two
        # full passes over the data instead of three, two driver
        # actions instead of three (r14, guide §1.2). The candidate
        # window only shifts by ≤ 1 sample position vs the n-aware
        # form; any bracket containing the target rank yields the same
        # exact value, so the output is unchanged.
        samp = sorted(r["value"] for r in
                      bottomk_summary(li, "key", "value",
                                      k=sample_k).collect())
        if not samp:
            raise ValueError("exact_order_statistic: input has no rows")
        lo_sent, hi_sent = -(1 << 63), (1 << 63) - 1
        mid = (len(samp) - 1) // 2
        lo_i, hi_i = max(0, mid - margin), min(len(samp), mid + margin + 1)
        cands = sorted({lo_sent, hi_sent, *samp[lo_i:hi_i]})
    else:
        stats = li.agg(F.count("*").alias("n"), F.min("value").alias("vmin"),
                       F.max("value").alias("vmax")).first()
        n = int(stats["n"])
        if n == 0:
            raise ValueError("exact_order_statistic: input has no rows")
        vmin, vmax = int(stats["vmin"]), int(stats["vmax"])
        target = int(rank)
        if not 0 <= target < n:
            raise ValueError(
                f"exact_order_statistic: rank {target} out of range [0, {n})")
        samp = sorted(r["value"] for r in
                      bottomk_summary(li, "key", "value",
                                      k=sample_k).collect())
        mid = int(round(target / max(n - 1, 1) * (len(samp) - 1)))
        lo_i, hi_i = max(0, mid - margin), min(len(samp), mid + margin + 1)
        cands = sorted({vmin, vmax, *samp[lo_i:hi_i]})
    cdf = spark.createDataFrame([(int(c),) for c in cands], "c BIGINT")
    crows = (li.crossJoin(F.broadcast(cdf))
             .groupBy("c")
             .agg(F.sum(F.when(F.col("value") < F.col("c"), 1).otherwise(0))
                  .alias("lt"),
                  F.count("*").alias("tot"))).collect()
    lt = {int(r["c"]): int(r["lt"]) for r in crows}
    if rank is None:
        # every candidate group sees every row (cross join), so any
        # group's count IS n — no separate count pass
        n = int(crows[0]["tot"])
        target = (n - 1) // 2
    c_lo = max(c for c in cands if lt[c] <= target)
    above = [c for c in cands if lt[c] > target]
    c_hi = min(above) if above else max(cands)
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    return (li.filter((F.col("value") >= c_lo) & (F.col("value") <= c_hi))
            .groupBy("value").agg(F.count("*").alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(w))
            .filter(F.lit(lt[c_lo]) + F.col("cum") > target)
            .orderBy("value").limit(1)
            .select(F.lit(n).cast("bigint").alias("n"),
                    F.lit(target).cast("bigint").alias("target_rank"),
                    F.col("value").cast("bigint").alias("value")))
