"""Distributed suffix array via prefix doubling (Manber & Myers 1990,
the sort-based formulation used by every distributed SA construction —
e.g. Flick & Aluru, "Parallel distributed memory construction of suffix
and LCP arrays", SC'15).

The suffix array is THE exact-substring-dedup index (Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" builds one
over the whole corpus); the engine's winnowing path (operators/dedup.py)
is the probabilistic scale tier, this is the exact tier.

Algorithm: rank every suffix by its first character, then repeatedly
re-rank by the tuple (rank[i], rank[i+h], rank[i+2h], rank[i+3h]) with
h QUADRUPLING — radix-4 prefix doubling (the standard generalization of
Manber-Myers pair doubling: a k-tuple of span-h ranks orders suffixes by
their first k·h characters, so each round multiplies the span by k
instead of 2). ⌈log₄ n⌉ re-rank rounds instead of ⌈log₂ n⌉ — half the
sort-class shuffle rounds AND half the per-round driver actions of the
r13 binary form, for ~the same bytes per remaining round (r14, guide
§2.2/§2.4: each round still shuffles O(n) skinny integer rows).
Everything is data-parallel:

- the 4-tuple pairing is ONE tagged union of four shifted copies of the
  (pos, rank) frame + ONE groupBy(pos) pivot — a single exchange, no
  join chain;
- each re-rank is a two-phase dense rank: partition on the leading key,
  per-partition JVM ``dense_rank`` window (whole-stage codegen — the
  r13 form crossed the whole table into a pandas worker and back every
  round, r14 guide §4.1: built-ins over Python), plus the
  partition-offset prefix sum (P scalars to the driver, never rows);
- round 1 never shuffles the char table at all: the alphabet is tiny by
  definition, so the span-1 rank is a dense rank over the DISTINCT code
  points (≤ |Σ| rows) broadcast-joined back onto the chars (r14, guide
  §2.4 "remove shuffles outright" — the r13 form range-partitioned and
  sorted all n rows to rank ≤ a few hundred distinct values);
- convergence is max(rank) == n (all ranks distinct), riding the same
  P-scalar collect.

Cost: O(log₄ n) sort-class shuffle rounds — the Spark terasort shape. At
100 TB the corpus is processed as document-boundary-respecting shards
(a suffix never crosses a document boundary past the separator, so
shards are independent after a global alphabet rank); the fixture query
builds one shard end-to-end.

Bucket-partition correctness (rounds ≥ 2): the previous round's rank is
dense in [1, nd], so the partition id is a computed monotone equi-width
bucket of it — equal keys share a partition and partition order equals
key order, hence per-partition dense ranks + offsets compose to the
exact global dense rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# radix of the prefix-doubling re-rank: each round ranks on RADIX
# consecutive span-h ranks, multiplying the span by RADIX. 4 halves the
# round count vs classic pair doubling while the per-round union stays
# a skinny (pos, tag, rank) shuffle; the LCP walk below consumes the
# base-RADIX digit structure (≤ RADIX−1 probes per level).
_RADIX = 4


def _dense_rank_keys(df: DataFrame, parts: int, keys: list[str],
                     k1_max: int | None = None
                     ) -> tuple[DataFrame, int, int]:
    """Exact global dense rank of the key tuple → ((pos, rank),
    n_distinct, n_rows), distributed: order-partition on the leading
    key, JVM ``dense_rank`` window per partition (codegen — no Python
    boundary; r14, guide §4.1), then add the prefix sum of per-partition
    distinct counts (P scalars via the driver, broadcast back as a
    literal map join). ``n_distinct`` — the grand total of those SAME P
    scalars — is max(rank), returned for free so the prefix-doubling
    convergence check never pays a separate agg job per round;
    ``n_rows`` rides the same P-row collect so the caller never pays a
    df.count() job either.

    Partitioning (guide §2.4): when the caller knows the leading key is
    dense in [0, k1_max] — every re-rank round, where k1 = the previous
    round's rank ∈ [1, nd_prev] — the partition id is COMPUTED as a
    monotone equi-width bucket, so the one exchange this operator needs
    is the window's hash-by-pid. ``k1_max=None`` (distribution unknown)
    keeps the range-partitioner path."""
    if k1_max is not None:
        width = max(1, (int(k1_max) + parts) // parts)  # ceil((max+1)/parts)
        rp = df.withColumn(
            "pid", F.floor(F.col(keys[0]) / F.lit(width)).cast("int"))
    else:
        rp = (df.repartitionByRange(parts, *keys)
              .withColumn("pid", F.spark_partition_id()))

    w = Window.partitionBy("pid").orderBy(*keys)
    # lazy checkpoint: the counts collect right below is the FIRST action
    # and materializes it (one job); `ranked` then reuses the
    # materialized partitions
    loc = rp.select(
        "pos", "pid",
        F.dense_rank().over(w).cast("bigint").alias("lrank"),
    ).localCheckpoint(eager=False)
    agg = loc.groupBy("pid").agg(F.max("lrank").alias("nd"),
                                 F.count("*").alias("nr")).collect()
    counts = {r.pid: int(r.nd) for r in agg}
    n_rows = sum(int(r.nr) for r in agg)
    offset, offsets = 0, {}
    for pid in sorted(counts):
        offsets[pid] = offset
        offset += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(v).cast("bigint") if i else F.lit(v)
                       for kv in offsets.items()
                       for i, v in enumerate(kv)]),
        F.col("pid"))
    ranked = loc.select("pos", (F.col("lrank") + off_expr).alias("rank"))
    return ranked, int(offset), n_rows


def _rank_round1(chars: DataFrame, pos_col: str, char_col: str
                 ) -> tuple[DataFrame, int, int]:
    """Span-1 rank WITHOUT shuffling the char table (r14, guide §2.4):
    dense rank of each character = its rank among the DISTINCT code
    points, a ≤ |Σ|-row table — computed with one single-partition
    window over the distinct values and broadcast-joined back. The
    first-round key is the INTEGER code point (F.ascii returns the full
    code point), never the raw 1-char string: every sorter that touches
    suffix keys — this rank, the bucketed re-rank rounds, and the DuckDB
    oracle (UTF-8 binary) — then shares THE SAME integer order by
    construction (ADVICE r10; UTF-8-binary == code-point order).
    Supplementary-plane pin: test_suffix_array_astral_characters.
    Returns ((pos, rank), n_distinct, n_rows) — one agg job; the
    broadcast join materializes inside the next consumer's action."""
    c = chars.select(F.col(pos_col).alias("pos"),
                     F.ascii(F.col(char_col)).alias("k1"))
    st = c.agg(F.count("*").alias("n"),
               F.countDistinct("k1").alias("nd")).first()
    n, nd = int(st["n"]), int(st["nd"])
    alpha = (c.select("k1").distinct()
             .select("k1", F.dense_rank().over(Window.orderBy("k1"))
                     .cast("bigint").alias("rank")))
    df = (c.join(F.broadcast(alpha), "k1").select("pos", "rank")
          .localCheckpoint(eager=False))
    return df, nd, n


def suffix_array_rounds(
        chars: DataFrame, pos_col: str = "pos", char_col: str = "ch",
        parts: int = 8) -> tuple[DataFrame, list[tuple[int, DataFrame]]]:
    """Radix-4 prefix doubling that also returns every intermediate rank
    level: (final_sa, [(span, ranks_df), …]) where ranks_df ranks all
    suffixes by their first `span` characters — the classic SPARSE
    TABLE, built as a by-product (no extra passes; at 100 TB each level
    persists as parquet, the standard n·log n storage cost). Spans are
    1, 4, 16, … (powers of _RADIX); ``lcp_adjacent`` walks the levels by
    base-4 digits to compute longest-common-prefix lengths in O(log n)
    joins instead of character-at-a-time comparison."""
    df, n_distinct, n = _rank_round1(chars, pos_col, char_col)
    rounds = [(1, df)]
    h = 1
    # convergence = all ranks distinct; max(rank) == the distinct-key
    # total already summed on the driver — no per-round agg job
    while n_distinct < n:
        # 4-tuple pairing as ONE tagged union + ONE groupBy(pos) pivot:
        # stream i contributes rank(pos + i·h) to output row pos, so the
        # pivot row is (rank[pos], rank[pos+h], rank[pos+2h],
        # rank[pos+3h]) — a missing pos+i·h (suffix shorter than (i+1)·h
        # from this start) pivots to 0 < every real rank, which is
        # exactly the shorter-string-is-a-prefix-sorts-first rule.
        u = None
        for i in range(_RADIX):
            s = df.select((F.col("pos") - F.lit(i * h)).alias("pos"),
                          F.lit(i).alias("tag"), "rank")
            u = s if u is None else u.unionAll(s)
        paired = (u.filter(F.col("pos") >= 1)
                  .groupBy("pos")
                  .agg(*[F.coalesce(
                          F.max(F.when(F.col("tag") == i, F.col("rank"))),
                          F.lit(0).cast("bigint")).alias(f"k{i + 1}")
                         for i in range(_RADIX)]))
        # k1 here is the previous round's dense rank ∈ [1, n_distinct],
        # so the bucketed (single-shuffle) dense-rank path applies.
        df, n_distinct, _ = _dense_rank_keys(
            paired, parts, [f"k{i + 1}" for i in range(_RADIX)],
            k1_max=n_distinct)
        h *= _RADIX
        rounds.append((h, df))
    return df, rounds


def suffix_array(chars: DataFrame, pos_col: str = "pos",
                 char_col: str = "ch", parts: int = 8) -> DataFrame:
    """(pos, ch) single-character rows → (pos, rank): rank r means the
    suffix starting at pos is the r-th smallest of all n suffixes
    (1-based; ranks are a permutation of 1..n — suffixes of one string
    are always distinct). Positions must be contiguous 1..n.

    Binary/code-point character ordering (matches Spark's and DuckDB's
    default VARCHAR collation on UTF-8); a missing pos+i·h (suffix
    shorter than the probed offset) ranks as 0 < every real rank, which
    is exactly the shorter-string-is-a-prefix-sorts-first rule of
    lexicographic comparison."""
    sa, _rounds = suffix_array_rounds(chars, pos_col, char_col, parts)
    return sa


def lcp_adjacent(sa: DataFrame, rounds: list[tuple[int, DataFrame]],
                 max_lcp: int | None = None) -> DataFrame:
    """LCP between rank-adjacent suffixes — the LCP array, from which
    the longest repeated substring is max(lcp) (it always occurs at
    adjacent ranks). Sparse-table walk: process the rank levels in
    DESCENDING span order; if the two suffixes' rank at offset `lcp`
    agrees on a span-s level, the common prefix extends by s. Spans are
    powers of _RADIX, so a level may extend up to _RADIX−1 times (the
    base-4 digit of the LCP at that level) — the walk probes each level
    ≤ 3 times sequentially; every LCP value < the largest span is a sum
    of available spans with base-4 digits, so the greedy walk is exact.
    O(log n) equi-joins over the (n−1)-row pair table — never a
    per-character loop.

    The LARGEST span never extends — the final round's ranks are all
    distinct, so rank-adjacent suffixes agree on strictly fewer than
    max-span characters (lcp ≤ max_span − 1 = Σ 3·4^i over the lower
    levels) — so the walk skips it outright (r14: the r13 walk paid two
    vacuous joins per pair on its top level).

    ``max_lcp``: when the CALLER caps reported LCPs (every registered
    consumer applies least(lcp, 512)), levels with span > max_lcp are
    unnecessary — the kept levels (spans ≤ max_lcp, each used ≤ 3×)
    represent every value < 4·S − 1 ≥ max_lcp, so the walk is exact for
    true LCP < max_lcp and returns ≥ max_lcp (saturating at Σ 3·span ≥
    max_lcp) above it; the caller's cap then yields IDENTICAL output
    with fewer probe joins per pair.

    Output: (pos_a, pos_b, lcp) for consecutive ranks (n−1 rows)."""
    b = sa.select(F.col("pos").alias("pos_b"),
                  (F.col("rank") - 1).alias("rank"))
    pairs = (sa.select(F.col("pos").alias("pos_a"), "rank")
             .join(b, "rank").drop("rank")
             .withColumn("lcp", F.lit(0)))
    levels = sorted(rounds, key=lambda t: -t[0])[1:]  # skip vacuous max
    if max_lcp is not None:
        levels = [(s, r) for s, r in levels if s <= max_lcp]
    for span, rdf in levels:
        ra = rdf.select(F.col("pos").alias("_pa"),
                        F.col("rank").alias("_ra"))
        rb = rdf.select(F.col("pos").alias("_pb"),
                        F.col("rank").alias("_rb"))
        for _ in range(_RADIX - 1):
            # join ON the offset expression + one select: 3 DataFrame
            # ops per probe instead of 6 — the walk is all CONSTRUCTION
            # (no action), and the py4j plan-building chatter of ~15
            # probes was itself measurable (r14)
            pairs = (pairs
                     .join(ra, F.col("pos_a") + F.col("lcp")
                           == F.col("_pa"), "left")
                     .join(rb, F.col("pos_b") + F.col("lcp")
                           == F.col("_pb"), "left")
                     .select(
                         "pos_a", "pos_b",
                         F.when(F.col("_ra").isNotNull()
                                & F.col("_rb").isNotNull()
                                & (F.col("_ra") == F.col("_rb")),
                                F.col("lcp") + span)
                         .otherwise(F.col("lcp")).alias("lcp")))
    # lazy: every registered consumer reads the LCP table exactly once
    # (top-k, or the attribution joins), so the checkpoint can
    # materialize inside that consumer's job instead of being its own
    # blocking job; lineage is still truncated for the O(log n) joins
    return pairs.localCheckpoint(eager=False)
