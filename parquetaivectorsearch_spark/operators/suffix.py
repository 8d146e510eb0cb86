"""Distributed suffix array via prefix doubling (Manber & Myers 1990,
the sort-based formulation used by every distributed SA construction —
e.g. Flick & Aluru, "Parallel distributed memory construction of suffix
and LCP arrays", SC'15).

The suffix array is THE exact-substring-dedup index (Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" builds one
over the whole corpus); the engine's winnowing path (operators/dedup.py)
is the probabilistic scale tier, this is the exact tier.

Algorithm: rank every suffix by its first character, then repeatedly
re-rank by the pair (rank[i], rank[i+h]) with h doubling — after
⌈log₂ n⌉ rounds ranks are the suffix array. Everything is data-parallel:

- each re-rank is ONE range-partitioned sort of (k1, k2) pairs plus a
  two-phase dense rank (per-partition local dense ranks + the
  partition-offset prefix sum — the same pattern pack_sequences and the
  knn partials use: P scalars to the driver, never rows);
- the (rank[i], rank[i+h]) pairing is ONE equi-join on position;
- convergence is max(rank) == n (all ranks distinct), one scalar agg.

Cost: O(log n) sort-class shuffle rounds — the Spark terasort shape. At
100 TB the corpus is processed as document-boundary-respecting shards
(a suffix never crosses a document boundary past the separator, so
shards are independent after a global alphabet rank); the fixture query
builds one shard end-to-end.

Range-partition correctness: repartitionByRange puts EQUAL keys in the
same partition, so per-partition dense ranks + offsets compose to the
exact global dense rank; partition ids follow range order by
construction.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dense_rank_2key(df: DataFrame, parts: int,
                     k1_max: int | None = None
                     ) -> tuple[DataFrame, int, int]:
    """Exact global dense rank of (k1, k2) → ((pos, rank), n_distinct,
    n_rows), distributed: order-partition on the key, locally dense-rank
    each partition, then add the prefix sum of per-partition distinct
    counts (P scalars via the driver, broadcast back as a literal map
    join). ``n_distinct`` — the grand total of those SAME P scalars — is
    max(rank), returned for free so the prefix-doubling convergence
    check never pays a separate agg job per round (r11: one fewer
    action per round × ⌈log₂ n⌉ rounds on every SA query); ``n_rows``
    rides the same P-row collect (r14) so the caller never pays a
    df.count() job either.

    Partitioning (r14, guide §2.4 "remove shuffles outright"): when the
    caller knows k1 is dense in [0, k1_max] — every prefix-doubling
    round ≥ 2, where k1 = the previous round's rank ∈ [1, nd_prev] —
    the partition id is COMPUTED as a monotone equi-width bucket of k1,
    so the one shuffle this operator needs is the groupBy(pid) below.
    The old form range-partitioned first (a sampling pass + an exchange)
    and then groupBy(pid)-shuffled AGAIN — two exchanges + one extra job
    per round, ~log₂(n) rounds per SA query. Correctness needs exactly
    (a) all rows of one k1 in one pid (pid is a function of k1) and
    (b) pid order = key order (the bucket fn is monotone); balance
    follows from k1 being dense. ``k1_max=None`` (round 1: raw code
    points, distribution unknown) keeps the range-partitioner path."""
    if k1_max is not None:
        width = max(1, (int(k1_max) + parts) // parts)  # ceil((max+1)/parts)
        rp = df.withColumn(
            "pid", F.floor(F.col("k1") / F.lit(width)).cast("int"))
    else:
        rp = (df.repartitionByRange(parts, "k1", "k2")
              .withColumn("pid", F.spark_partition_id()))

    def local(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["k1", "k2"], kind="mergesort")
        new = (pdf["k1"].ne(pdf["k1"].shift()) |
               pdf["k2"].ne(pdf["k2"].shift()))
        lrank = new.cumsum()
        return pd.DataFrame({"pos": pdf["pos"].to_numpy(),
                             "pid": pdf["pid"].to_numpy(),
                             "lrank": lrank.to_numpy()})

    # lazy checkpoint: the counts collect right below is the FIRST action
    # and materializes it (one job, not an eager-checkpoint job + a
    # counts job); `ranked` then reuses the materialized partitions
    loc = rp.groupBy("pid").applyInPandas(
        local, "pos BIGINT, pid INT, lrank BIGINT").localCheckpoint(
        eager=False)
    agg = loc.groupBy("pid").agg(F.max("lrank").alias("nd"),
                                 F.count("*").alias("nr")).collect()
    counts = {r.pid: r.nd for r in agg}
    n_rows = sum(int(r.nr) for r in agg)
    offset, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = offset
        offset += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in offsets.items() for v in kv]),
        F.col("pid"))
    ranked = loc.select("pos", (F.col("lrank") + off_expr).alias("rank"))
    return ranked, int(offset), n_rows


def suffix_array_rounds(
        chars: DataFrame, pos_col: str = "pos", char_col: str = "ch",
        parts: int = 8) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Prefix doubling that also returns every intermediate rank level:
    (final_sa, [(span, ranks_df), …]) where ranks_df ranks all suffixes
    by their first `span` characters — the classic SPARSE TABLE, built
    as a by-product (no extra passes; at 100 TB each level persists as
    parquet, the standard n·log n storage cost). ``lcp_adjacent`` walks
    the levels to compute longest-common-prefix lengths in O(log n)
    joins instead of character-at-a-time comparison."""
    # First-round key is the INTEGER code point (F.ascii returns the
    # full code point, not just 7-bit ASCII), never the raw 1-char
    # string: three sorters touch these keys — repartitionByRange
    # boundaries (UTF8String binary), the pandas/Python local sort
    # (code-point), and the DuckDB oracle (UTF-8 binary) — and while
    # UTF-8-binary == code-point order, ranking on one integer makes all
    # three THE SAME integer order by construction (ADVICE r10), and
    # int keys range-partition/sort cheaper than strings anyway.
    # Supplementary-plane pin: test_suffix_array_astral_characters.
    df, n_distinct, n = _dense_rank_2key(
        chars.select(F.col(pos_col).alias("pos"),
                     F.ascii(F.col(char_col)).alias("k1"),
                     F.lit(0).alias("k2")),
        parts)
    rounds = [(1, df)]
    h = 1
    # convergence = all ranks distinct; max(rank) == the distinct-key
    # total _dense_rank_2key already summed on the driver — no per-round
    # agg job
    while n_distinct < n:
        nxt = df.select((F.col("pos") - h).alias("pos"),
                        F.col("rank").alias("k2"))
        paired = (df.select("pos", F.col("rank").alias("k1"))
                  .join(nxt, "pos", "left")
                  .fillna(0, subset=["k2"]))
        # localCheckpoint inside _dense_rank_2key already cut the lineage;
        # each round starts from materialized (pos, rank) rows.
        # k1 here is the previous round's dense rank ∈ [1, n_distinct],
        # so the bucketed (single-shuffle) dense-rank path applies.
        df, n_distinct, _ = _dense_rank_2key(paired, parts,
                                             k1_max=n_distinct)
        h *= 2
        rounds.append((h, df))
    return df, rounds


def suffix_array(chars: DataFrame, pos_col: str = "pos",
                 char_col: str = "ch", parts: int = 8) -> DataFrame:
    """(pos, ch) single-character rows → (pos, rank): rank r means the
    suffix starting at pos is the r-th smallest of all n suffixes
    (1-based; ranks are a permutation of 1..n — suffixes of one string
    are always distinct). Positions must be contiguous 1..n.

    Binary/code-point character ordering (matches Spark's and DuckDB's
    default VARCHAR collation on UTF-8); a missing pos+h (suffix shorter
    than 2h) ranks as 0 < every real rank, which is exactly the
    shorter-string-is-a-prefix-sorts-first rule of lexicographic
    comparison."""
    sa, _rounds = suffix_array_rounds(chars, pos_col, char_col, parts)
    return sa


def lcp_adjacent(sa: DataFrame, rounds: list[tuple[int, DataFrame]],
                 ) -> DataFrame:
    """LCP between rank-adjacent suffixes — the LCP array, from which
    the longest repeated substring is max(lcp) (it always occurs at
    adjacent ranks). Sparse-table walk: process the rank levels in
    DESCENDING span order; if the two suffixes' rank at offset `lcp`
    agrees on a span-s level, the common prefix extends by s. Any LCP
    value < max span is a sum of distinct available spans (binary
    representation), so the greedy walk is exact. O(log n) equi-joins
    over the (n−1)-row pair table — never a per-character loop.

    Output: (pos_a, pos_b, lcp) for consecutive ranks (n−1 rows)."""
    b = sa.select(F.col("pos").alias("pos_b"),
                  (F.col("rank") - 1).alias("rank"))
    pairs = (sa.select(F.col("pos").alias("pos_a"), "rank")
             .join(b, "rank").drop("rank")
             .withColumn("lcp", F.lit(0)))
    for span, rdf in sorted(rounds, key=lambda t: -t[0]):
        ra = rdf.select(F.col("pos").alias("_pa"),
                        F.col("rank").alias("_ra"))
        rb = rdf.select(F.col("pos").alias("_pb"),
                        F.col("rank").alias("_rb"))
        pairs = (pairs
                 .withColumn("_pa", F.col("pos_a") + F.col("lcp"))
                 .withColumn("_pb", F.col("pos_b") + F.col("lcp"))
                 .join(ra, "_pa", "left").join(rb, "_pb", "left")
                 .withColumn(
                     "lcp",
                     F.when(F.col("_ra").isNotNull()
                            & F.col("_rb").isNotNull()
                            & (F.col("_ra") == F.col("_rb")),
                            F.col("lcp") + span).otherwise(F.col("lcp")))
                 .drop("_pa", "_pb", "_ra", "_rb"))
    # lazy: every registered consumer reads the LCP table exactly once
    # (top-k, or the attribution joins), so the checkpoint can
    # materialize inside that consumer's job instead of being its own
    # blocking job; lineage is still truncated for the O(log n) joins
    return pairs.localCheckpoint(eager=False)
