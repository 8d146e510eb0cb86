"""Warehouse-ingestion operator coverage: CDC latest-record resolution,
SCD2 validity intervals, grouped collection aggregates, distribution
windows, and mergeable distinct sketches.

These are the ops that sit between raw ingest and the analytics layer in a
100 TB warehouse: collapse change streams to current state, historize
dimensions, and keep distinct counts mergeable across partitions.

Determinism: collected lists are sort_array'd on both sides (collection
order is never deterministic in a distributed agg); percent_rank is
ROUND(6); interval endpoints leave as epoch-µs ints; HLL sketches are
engine-specific → rows-only with a tolerance test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquetaivectorsearch_spark.queries import _t, register

_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"


@register("latest_by_key", """
    SELECT user_id,
           event_type AS last_event_type,
           value AS last_value,
           epoch_us(ts) AS last_ts_us
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
""")
def q_latest_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC 'current state' resolution: one row per key carrying the most
    recent record's fields (ties broken by event_id). max_by with a struct
    ordering key is a single partial+final hash agg — the shuffle moves one
    row per key per map task, not the history. This is how a change stream
    collapses to a snapshot without a window sort at 100 TB."""
    tie = F.struct("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max_by("event_type", tie).alias("last_event_type"),
            F.max_by("value", tie).alias("last_value"),
            F.expr(_EPOCH_US.format(c="max(ts)")).alias("last_ts_us"),
        )
    )


@register("scd2_intervals", """
    SELECT user_id,
           epoch_us(ts) AS valid_from_us,
           epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
             AS valid_to_us,
           event_type, value
    FROM events
    WHERE event_type IN ('signup', 'purchase')
""")
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 historization: each state-changing record becomes a
    validity interval [ts, next-change ts), the open current row ending
    NULL. One window shuffle on the key builds the whole dimension history —
    no self-join (the naive SCD2 build is a t1.ts < t2.ts θ-join that
    explodes quadratically)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            F.expr(_EPOCH_US.format(c="ts")).alias("valid_from_us"),
            F.expr(_EPOCH_US.format(c="next_ts")).alias("valid_to_us"),
            "event_type", "value",
        )
    )


@register("collect_agg", """
    SELECT source,
           array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
           coalesce(array_to_string(
               list_sort(list(doc_id) FILTER (WHERE n_chars > 400)), ','), '')
             AS long_doc_ids
    FROM documents
    GROUP BY source
""")
def q_collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped collection aggregates (collect_set / filtered collect_list).
    Collection order is nondeterministic in any distributed agg, so both
    engines sort the arrays; results leave as joined strings — scalar
    outputs keep the driver's value-hash engine-agnostic (array cell
    hashing is engine-specific)."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.array_join(F.sort_array(F.collect_set("lang")), ",").alias("langs"),
            F.array_join(
                F.sort_array(
                    F.collect_list(F.when(F.col("n_chars") > 400, F.col("doc_id")))
                ).cast("array<string>"),
                ",",
            ).alias("long_doc_ids"),
        )
    )


@register("window_percent_rank", """
    SELECT c_custkey,
           ROUND(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 6)
             AS pct_rank,
           ROUND(cume_dist() OVER (ORDER BY c_acctbal, c_custkey), 6)
             AS cum_dist
    FROM customer
""")
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (percent_rank / cume_dist) with a unique
    tiebreaker — identical rank definitions in both engines."""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
    )


@register("hll_distinct")  # rows-only: HLL sketch implementations differ
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL): per-source
    sketch, union across groups, global estimate. At 100 TB this is the only
    way distinct counts compose across partitions/days without a re-scan —
    sketches merge; exact distincts don't. Tolerance vs exact is asserted in
    tests (DuckDB's HLL differs bit-wise → no hash oracle)."""
    d = _t(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.hll_sketch_agg("doc_id").alias("sk"),
        F.count_distinct("doc_id").alias("exact_distinct"),
    )
    return (
        per_source.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
            F.sum("exact_distinct").alias("exact_total"),
        )
        .select("est_total", "exact_total")
    )


@register("merge_upsert", """
    WITH upd AS (
      SELECT o_orderkey AS key,
             CAST(o_totalprice + 1000 AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 100 = 0
      UNION ALL
      SELECT o_orderkey + 10000000 AS key,
             CAST(500 AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 500 = 0
    ),
    base AS (
      SELECT o_orderkey AS key, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
    )
    SELECT COALESCE(b.key, u.key) AS o_orderkey,
           COALESCE(u.new_price, b.price) AS price,
           CASE WHEN b.key IS NULL THEN 'insert'
                WHEN u.key IS NOT NULL THEN 'update'
                ELSE 'keep' END AS action
    FROM base b FULL OUTER JOIN upd u ON b.key = u.key
""")
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO semantics (matched → update, not-matched → insert)
    as a full-outer join + coalesce — the lakehouse upsert primitive,
    expressed engine-natively (no table-format dependency). The updates
    batch is derived deterministically from the base so the oracle can
    reconstruct it. At scale both sides hash-partition on the merge key —
    one exchange each, and AQE handles the skewed-key case; the streaming
    twin is run_latest_state_upsert (foreachBatch CDC)."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").cast("double").alias("price"),
    )
    upd = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("key"),
            (F.col("o_totalprice") + 1000).cast("double").alias("new_price"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 500 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("key"),
                F.lit(500).cast("double").alias("new_price"),
            )
        )
    )
    j = base.alias("b").join(upd.alias("u"), "key", "full_outer")
    return j.select(
        F.col("key").alias("o_orderkey"),
        F.coalesce("u.new_price", "b.price").alias("price"),
        F.when(F.col("b.price").isNull(), "insert")
        .when(F.col("u.new_price").isNotNull(), "update")
        .otherwise("keep").alias("action"),
    )


@register("window_first_last", """
    SELECT o_orderkey, o_custkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER w AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""")
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation windows over the full partition frame: each order sees its
    customer's first / last / second order key (unique (date, key) ordering
    → deterministic). One shuffle on o_custkey serves all three functions."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.first_value("o_orderkey").over(w).alias("first_key"),
        F.last_value("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@register("window_range_frame", """
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
      FROM orders
    )
    SELECT o_orderkey, o_custkey, price_cents,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY price_cents
                          RANGE BETWEEN 500000 PRECEDING AND CURRENT ROW)
             AS n_within_5k
    FROM t
""")
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per customer, how many of their orders fall
    within $5,000 below each order's price. Prices are keyed as integer
    cents so the frame boundary arithmetic is exact in both engines (RANGE
    over doubles would compare engine-rounded boundaries)."""
    t = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("price_cents"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("price_cents")
        .rangeBetween(-500000, Window.currentRow)
    )
    return t.select(
        "o_orderkey", "o_custkey", "price_cents",
        F.count("*").over(w).alias("n_within_5k"),
    )


@register("seasonal_decompose", """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM events GROUP BY 1
    ),
    w AS (
      SELECT day,
             CAST(date_diff('day', DATE '2024-01-01', day) % 7
                  AS INTEGER) AS dow,
             total_cents,
             SUM(total_cents) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wsum,
             COUNT(*) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
      FROM daily
    ),
    t AS (SELECT day, dow, total_cents, wsum,
                 7 * total_cents - wsum AS dt7
          FROM w WHERE wn = 7),
    s AS (SELECT dow,
                 CAST(SUM(dt7) AS DOUBLE) / (7.0 * COUNT(*)) AS seasonal
          FROM t GROUP BY dow)
    SELECT t.day, t.dow, t.total_cents,
           CAST(t.wsum AS DOUBLE) / 7.0 AS trend,
           s.seasonal,
           CAST(t.dt7 AS DOUBLE) / 7.0 - s.seasonal AS remainder
    FROM t JOIN s USING (dow)
""")
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily event-value
    series (the moving-average construction STL generalizes): trend =
    centered 7-day moving average, weekly seasonal = per-slot mean of
    the detrended series, remainder = the rest. Hash-exact BY
    CONSTRUCTION: daily totals are integer cents, the 7·c − Σwindow
    numerator stays integral through every aggregate, and each double
    is produced by ONE correctly-rounded division (never a float sum —
    the usual decomposition accumulates detrended doubles in
    group-order, which no cross-engine hash survives). Day-of-week is
    days-since-epoch-anchor mod 7, dodging the Spark(1=Sun..7) vs
    DuckDB(0=Sun..6) dayofweek mismatch. One scan, one day-keyed agg,
    one 7-row broadcast seasonal join — trivially 100 TB-shaped (the
    daily series is |days| rows regardless of event volume)."""
    daily = (_t(spark, sf_dir, "events")
             .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .cast("bigint").alias("total_cents")))
    win = Window.orderBy("day").rowsBetween(-3, 3)
    w = daily.select(
        "day",
        (F.datediff("day", F.lit("2024-01-01").cast("date")) % 7)
        .cast("int").alias("dow"),
        "total_cents",
        F.sum("total_cents").over(win).alias("wsum"),
        F.count("*").over(win).alias("wn"))
    t = (w.filter(F.col("wn") == 7)
         .withColumn("dt7", 7 * F.col("total_cents") - F.col("wsum")))
    s = (t.groupBy("dow")
         .agg((F.sum("dt7").cast("double")
               / (7.0 * F.count("*"))).alias("seasonal")))
    return (t.join(F.broadcast(s), "dow")
            .select("day", "dow", "total_cents",
                    (F.col("wsum").cast("double") / 7.0).alias("trend"),
                    "seasonal",
                    (F.col("dt7").cast("double") / 7.0
                     - F.col("seasonal")).alias("remainder")))


@register("rolling_distinct_users", """
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    e AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS eday, user_id
      FROM events
    )
    SELECT d.day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users_7d
    FROM days d JOIN e
      ON e.eday BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
""")
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day DISTINCT active users per day — the ops metric a
    sliding COUNT(DISTINCT) window cannot express (distinct does not
    decompose across window slides; Spark rejects DISTINCT aggregates
    over window frames outright). Exact construction: pre-reduce events
    to DISTINCT (day, user) pairs — the only volume-dependent pass,
    one shuffle — then a |days|-row broadcast grid joins each day to
    its trailing week and a (day, user)-keyed distinct count finishes.
    Work after the pre-reduce is |days| × active-users-per-week rows,
    independent of raw event volume — the 100 TB shape (the naive
    grid ⋈ raw-events join re-ships every event 7×)."""
    ev = (_t(spark, sf_dir, "events")
          .select(F.date_trunc("day", "ts").cast("date").alias("eday"),
                  "user_id")
          .distinct())
    days = ev.select(F.col("eday").alias("day")).distinct()
    return (ev.join(F.broadcast(days),
                    (F.col("eday") >= F.date_sub(F.col("day"), 6))
                    & (F.col("eday") <= F.col("day")))
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("bigint")
                 .alias("active_users_7d")))


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable approximate frequencies, fully oracle-replayed
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 256
_CMS_A = (131071, 524287, 2147483647 % 999983, 6700417)
_CMS_B = (12289, 786433, 40503, 69857)
_CMS_P = 2147483647  # Mersenne prime 2^31-1


@register("cms_frequency", f"""
    WITH w AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (ORDER BY word) AS vid
      FROM w GROUP BY word
    ),
    hs AS (
      SELECT j, a, b FROM (VALUES
        {", ".join(f"({j}, {a}, {b})"
                   for j, (a, b) in enumerate(zip(_CMS_A, _CMS_B)))}
      ) t(j, a, b)
    ),
    cells AS (
      SELECT hs.j,
             ((vocab.vid * hs.a + hs.b) % {_CMS_P}) % {_CMS_W} AS col,
             CAST(SUM(vocab.cnt) AS BIGINT) AS cell
      FROM vocab CROSS JOIN hs
      GROUP BY hs.j, col
    ),
    top AS (
      SELECT word, cnt, vid FROM vocab
      ORDER BY cnt DESC, word LIMIT 50
    ),
    est AS (
      SELECT top.word, top.cnt, MIN(cells.cell) AS cms_est
      FROM top
      JOIN hs ON TRUE
      JOIN cells ON cells.j = hs.j
              AND cells.col = ((top.vid * hs.a + hs.b) % {_CMS_P}) % {_CMS_W}
      GROUP BY top.word, top.cnt
    )
    SELECT word, CAST(cnt AS BIGINT) AS true_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - cnt AS BIGINT) AS overestimate
    FROM est
""")
def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005): d=4 × w=256
    bounded-memory frequency summary with the one-sided guarantee
    est ≥ true and est ≤ true + εN (ε = e/w) w.h.p. — the mergeable
    approximate tier completing the sketch family (exact Misra-Gries
    heavy hitters, HLL distinct, Bloom membership). Everything is
    engine-portable: word ids from a row_number over the word-ordered
    vocab, hashes (a·vid + b) mod P mod w with P = 2³¹−1 and fixed
    (a, b) — integer arithmetic only, so the DuckDB oracle rebuilds the
    ENTIRE sketch and every estimate bit-for-bit. Build shape: the cell
    table aggregates from the vocab counts (equivalent to per-token
    inserts, one groupBy on (j, col) — d·w = 1024 cells at ANY corpus
    size, the whole point); cell-wise sums make two sketches merge by
    addition (pinned in tests). Output: top-50 words with true count,
    estimate, and the (always ≥ 0) overestimate."""
    from parquetaivectorsearch_spark.functions import text as TX
    from parquetaivectorsearch_spark.operators.sketch import (
        cms_build, cms_estimate)
    from pyspark.sql.window import Window as _W

    d = _t(spark, sf_dir, "documents")
    words = d.select(F.explode(TX.words("text")).alias("word"))
    vocab = (words.groupBy("word").agg(F.count("*").alias("cnt"))
             .withColumn("vid", F.row_number().over(_W.orderBy("word")))
             .localCheckpoint(eager=False))  # reused: cells + top-50 probe
    cells = cms_build(vocab.select("vid", "cnt"), d=_CMS_D, w=_CMS_W)
    top = vocab.orderBy(F.desc("cnt"), "word").limit(50)
    est = cms_estimate(cells, top.select("word", "cnt", "vid"),
                       d=_CMS_D, w=_CMS_W)
    return est.select(
        "word", F.col("cnt").cast("bigint").alias("true_cnt"),
        F.col("cms_est").cast("bigint").alias("cms_est"),
        (F.col("cms_est") - F.col("cnt")).cast("bigint")
        .alias("overestimate"))


# ---------------------------------------------------------------------------
# Bottom-k quantile summary — the mergeable quantile tier, fully replayed
# ---------------------------------------------------------------------------

_BK_K = 1024
_BK_QS = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)


@register("quantile_sketch", f"""
    WITH li AS (
      SELECT l_orderkey * 8 + l_linenumber AS key,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    samp AS (
      SELECT key, cents,
             ((key * 524287 + 12289) % 2147483647
              + 2147483647) % 2147483647 AS h
      FROM li ORDER BY h, key LIMIT {_BK_K}
    ),
    ranked AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, key) AS rn
      FROM samp
    ),
    qs AS (SELECT * FROM (VALUES {", ".join(f"({q})" for q in _BK_QS)}) t(q)),
    est AS (
      SELECT qs.q, ranked.cents AS est_cents
      FROM qs JOIN ranked
        ON ranked.rn = CAST(FLOOR(qs.q * {_BK_K - 1}) AS BIGINT) + 1
    ),
    audit AS (
      SELECT est.q, est.est_cents,
             SUM(CASE WHEN li.cents < est.est_cents THEN 1 ELSE 0 END) AS lt,
             COUNT(*) AS n
      FROM li CROSS JOIN est
      GROUP BY est.q, est.est_cents
    )
    SELECT q, est_cents,
           CAST(lt AS BIGINT) AS sample_rank,
           CAST(FLOOR(q * (n - 1)) AS BIGINT) AS target_rank,
           CAST(ABS(lt - FLOOR(q * (n - 1))) AS BIGINT) AS rank_err,
           CAST(n AS BIGINT) AS n
    FROM audit
""")
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k mergeable quantile summary (Cohen & Kaplan 2007) over
    l_extendedprice in integer cents — the quantile tier completing the
    sketch family (CMS frequency, HLL distinct, Misra-Gries heavy hitters,
    Bloom membership). KLL/GK/t-digest make data-dependent compaction
    choices no SQL engine can replay; the bottom-k-by-hash summary has the
    same mergeability and an O(1/√k) rank-error guarantee while staying
    integer-deterministic, so the DuckDB oracle rebuilds the ENTIRE
    summary and every estimate bit-for-bit. Build shape: one
    TakeOrderedAndProject pass (≤ k rows per task to the driver merge — at
    100 TB the summary is still {_BK_K} rows); estimates are a row_number
    probe of the ≤ k-row summary; the output self-certifies by auditing
    each estimate's EXACT rank in one more pass (map-side partial sum of a
    broadcast 7-row probe — no second shuffle of the fact table). Columns:
    (q, est_cents, sample_rank = exact #rows below est, target_rank,
    rank_err, n). Merge rule (two shards' summaries union + re-take ≡ one
    build) is pinned in tests/test_sketch.py."""
    from parquetaivectorsearch_spark.operators.sketch import (
        bottomk_quantiles, bottomk_summary)

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("key"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"))
    summary = bottomk_summary(li, "key", "cents", k=_BK_K).localCheckpoint(
        eager=False)  # ≤ k rows; reused by every probe below
    est = bottomk_quantiles(summary, list(_BK_QS), k=_BK_K).select(
        "q", F.col("est").alias("est_cents"))
    audit = (
        li.crossJoin(F.broadcast(est))
        .groupBy("q", "est_cents")
        .agg(F.sum(F.when(F.col("cents") < F.col("est_cents"), 1)
                   .otherwise(0)).alias("lt"),
             F.count("*").alias("n"))
    )
    target = F.floor(F.col("q") * (F.col("n") - 1))
    return audit.select(
        "q", "est_cents",
        F.col("lt").cast("bigint").alias("sample_rank"),
        target.cast("bigint").alias("target_rank"),
        F.abs(F.col("lt") - target).cast("bigint").alias("rank_err"),
        F.col("n").cast("bigint").alias("n"))


_BKG_K = 64
_BKG_QS = (0.1, 0.5, 0.9)


@register("quantile_sketch_grouped", f"""
    WITH hv AS (
      SELECT lang, doc_id, n_chars,
             ((doc_id * 524287 + 12289) % 2147483647
              + 2147483647) % 2147483647 AS h
      FROM documents
    ),
    sk AS (
      SELECT lang, doc_id, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY h, doc_id) AS rn
        FROM hv) t WHERE rn <= {_BKG_K}
    ),
    kg AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS k_g FROM sk GROUP BY lang),
    ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS rn
      FROM sk
    ),
    qs AS (SELECT * FROM (VALUES {", ".join(f"({q})" for q in _BKG_QS)}) t(q)),
    est AS (
      SELECT ranked.lang, qs.q, ranked.n_chars AS est_chars
      FROM qs JOIN kg ON TRUE
              JOIN ranked ON ranked.lang = kg.lang
                         AND ranked.rn = CAST(FLOOR(qs.q * (kg.k_g - 1))
                                              AS BIGINT) + 1
    ),
    audit AS (
      SELECT est.lang, est.q, est.est_chars,
             SUM(CASE WHEN d.n_chars < est.est_chars THEN 1 ELSE 0 END) AS lt,
             COUNT(*) AS n
      FROM documents d JOIN est ON est.lang = d.lang
      GROUP BY est.lang, est.q, est.est_chars
    )
    SELECT lang, q, CAST(est_chars AS BIGINT) AS est_chars,
           CAST(lt AS BIGINT) AS sample_rank,
           CAST(FLOOR(q * (n - 1)) AS BIGINT) AS target_rank,
           CAST(ABS(lt - FLOOR(q * (n - 1))) AS BIGINT) AS rank_err,
           CAST(n AS BIGINT) AS n
    FROM audit
""")
def q_quantile_sketch_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP bottom-k quantile summaries — `quantile_sketch`'s
    stratified twin (per-language document-length profiles, the corpus
    report a mixture scheduler reads): an independent k={_BKG_K} summary
    per language from ONE static-rank window (rn ≤ k over (hash, id) ⇒
    Catalyst's map-side WindowGroupLimit prunes a mega-language before
    the shuffle, the same plan shape priority_sample_grouped pins), then
    per-group rank probes with k_g = |group summary| so under-k groups
    degrade to exact quantiles. Output self-certifies exact ranks per
    (lang, q) in one broadcast audit pass. Same integer hash family as
    the global summary; the oracle rebuilds everything."""
    from pyspark.sql.window import Window as _W

    from parquetaivectorsearch_spark.operators.sketch import (
        bottomk_summary_grouped)

    d = _t(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    sk = bottomk_summary_grouped(d, "lang", "doc_id", "n_chars",
                                 k=_BKG_K).localCheckpoint(
        eager=False)  # ≤ |langs|·k rows; reused below
    kg = sk.groupBy("lang").agg(F.count("*").cast("bigint").alias("k_g"))
    ranked = sk.withColumn("rn", F.row_number().over(
        _W.partitionBy("lang").orderBy("n_chars", "doc_id")))
    qdf = spark.createDataFrame([(float(q),) for q in _BKG_QS], "q DOUBLE")
    # probe table = qdf × kg carries (q, lang, k_g); the rank probe joins
    # it against the per-group (value, key)-ordered summary
    probe = qdf.crossJoin(F.broadcast(kg))
    est = (probe.join(ranked,
                      (probe["lang"] == ranked["lang"])
                      & (ranked["rn"]
                         == F.floor(probe["q"] * (probe["k_g"] - 1)) + 1))
           .select(probe["lang"], "q", F.col("n_chars").alias("est_chars")))
    audit = (d.join(F.broadcast(est), "lang")
             .groupBy("lang", "q", "est_chars")
             .agg(F.sum(F.when(F.col("n_chars") < F.col("est_chars"), 1)
                        .otherwise(0)).alias("lt"),
                  F.count("*").alias("n")))
    target = F.floor(F.col("q") * (F.col("n") - 1))
    return audit.select(
        "lang", "q", F.col("est_chars").cast("bigint").alias("est_chars"),
        F.col("lt").cast("bigint").alias("sample_rank"),
        target.cast("bigint").alias("target_rank"),
        F.abs(F.col("lt") - target).cast("bigint").alias("rank_err"),
        F.col("n").cast("bigint").alias("n"))


@register("exact_median_selection", """
    WITH li AS (
      SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST((COUNT(*) - 1) // 2 AS BIGINT) AS target_rank,
           (SELECT cents FROM li ORDER BY cents
            LIMIT 1 OFFSET (SELECT (COUNT(*) - 1) // 2 FROM li)) AS value
    FROM li
""")
def q_exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT global median by distributed selection, no global sort —
    the exact tier the bottom-k quantile SKETCH (`quantile_sketch`)
    steers: operators/sketch.exact_order_statistic runs three fixed
    passes (n/min/max agg; ~130 sample-bracketing candidate pivots
    counted in one shared scan; a running-count window over the bounded
    distinct-value set INSIDE the bracket — ≈ (2·margin/k) ≈ 12% of
    rows here, 1-2 orders less on longer-tailed data) where the naive
    plan is a full ORDER BY of the fact table. Every driver pull is
    bounded (k-row sample, candidate counts, one scalar); the oracle is
    the definitional ORDER BY … OFFSET (n−1)/2."""
    from parquetaivectorsearch_spark.operators.sketch import (
        exact_order_statistic)

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("key"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"))
    return exact_order_statistic(li, "key", "cents")
