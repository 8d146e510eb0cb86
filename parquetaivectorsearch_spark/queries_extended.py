"""Extended relational coverage: temporal joins (as-of, range), pivot,
explode, statistical and percentile aggregates (SURVEY.md §2.3-2.5, 2.8).

All oracle-checked. Determinism notes:
- as-of: the right side is pre-deduped to one row per (user, ts) via
  max_by(event_id), making "most recent click" unique; both engines then
  agree exactly (values pass through untouched — no float arithmetic).
- stats: stddev/var/corr/covar reduce doubles in engine-specific orders;
  results are rounded (4-6 dp) far above the ~1e-10 order drift.
- percentiles: identical linear-interpolation definition in both engines
  (Spark percentile ≡ DuckDB quantile_cont), exact inputs → rounded 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions import text as TX
from parquetaivectorsearch_spark.operators import joins as J
from parquetaivectorsearch_spark.queries import register, _t

_TS_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"


@register("asof_join", """
    WITH clicks AS (
      SELECT user_id, ts, arg_max(value, event_id) AS click_value
      FROM events WHERE event_type = 'click'
      GROUP BY user_id, ts
    ),
    p AS (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, p.value,
           c.click_value AS asof_click_value
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
""")
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the most recent prior click's
    value per user (union + carry-forward window — one shuffle, see
    operators/joins.py). Oracle: DuckDB's native ASOF LEFT JOIN."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    out = J.asof_join(purchases, clicks, on="user_id", ts="ts",
                      payload=["click_value"])
    return out.select(
        "event_id", "user_id",
        F.expr(_TS_US.format(c="ts")).alias("ts_us"),
        "value", "asof_click_value",
    )


@register("range_join", """
    SELECT a.user_id,
           a.event_id AS a_event_id, b.event_id AS b_event_id,
           (epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0 AS gap_seconds
    FROM events a JOIN events b
      ON a.user_id = b.user_id AND a.ts < b.ts
     AND epoch_us(b.ts) - epoch_us(a.ts) <= 86400000000::BIGINT
""")
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range-join: same-user event pairs within 1 day, via time-cell
    bucketing (candidates O(true pairs), not |A|×|B| — operators/joins.py).
    The oracle states the same predicate naively."""
    e = _t(spark, sf_dir, "events")
    return J.range_join_bucketed(e, key="user_id", ts="ts",
                                 max_gap_seconds=86400, payload=["event_id"])


@register("pivot_event_types", """
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events GROUP BY user_id
""")
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per user). The value list is explicit — at scale
    an unpinned pivot would first run a distinct scan to discover it."""
    kinds = ["click", "view", "purchase", "signup", "error"]
    out = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id").pivot("event_type", kinds).count().na.fill(0)
    )
    return out.select("user_id", *[F.col(k).alias(f"n_{k}") for k in kinds])


@register("explode_words", """
    WITH d AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '') AS ws
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos, ws[t.i] AS word
    FROM d, unnest(generate_series(1, len(ws))) AS t(i)
""")
def q_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the tokenized text (bounded id range keeps the driver
    compare small)."""
    from parquetaivectorsearch_spark.functions.text import words

    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", F.posexplode(words("text")).alias("pos", "word"))
    )


@register("stats_agg", """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
           ROUND(var_samp(l_quantity), 4) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
""")
def q_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per group; rounded above engine reduction-order
    drift (~1e-10)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
    )


@register("percentile_agg", """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
           ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
    FROM lineitem GROUP BY l_returnflag
""")
def q_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark percentile ≡ DuckDB
    quantile_cont). The approximate twin for 100 TB is approx_percentile
    (rows-only `approx_percentile_agg`)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.50)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("p75"),
    )


@register("join_salted", """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
""")
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join (operators/skew.py): build side replicated
    over 8 salts, probe side scattered by a deterministic row salt — the
    explicit hot-key defense when AQE's runtime skew split isn't enough.
    Result is identical to the plain join, so the oracle is the plain
    join."""
    from parquetaivectorsearch_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, o, key="l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
         .cast("double").alias("total_qty"),
    )


@register("approx_percentile_agg")  # rows-only: t-digest sketch, engine-specific
def q_approx_percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based percentile for 100 TB (single pass, bounded memory,
    mergeable partials) — approximate, so no value oracle. The quartiles are
    projected as scalar columns (p25/p50/p75), not an array: the driver's
    canonicalizer cannot hash array cells (CORRECTNESS_r06 ERR trio)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)")
             .alias("approx_pcts"))
        .select(
            "l_returnflag",
            F.col("approx_pcts")[0].alias("p25"),
            F.col("approx_pcts")[1].alias("p50"),
            F.col("approx_pcts")[2].alias("p75"),
        )
    )


@register("gap_fill", """
    WITH p AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ),
    u AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM u
    ),
    j AS (
      SELECT s.user_id, s.day, p.day_value
      FROM spine s LEFT JOIN p ON p.user_id = s.user_id AND p.day = s.day
    )
    SELECT user_id, day, day_value,
           last_value(day_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           day_value IS NULL AS is_gap
    FROM j
""")
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: build each user's full daily calendar spine
    (users × exploded day sequence — the dimension side broadcasts), left
    join the observed daily purchase totals, and forward-fill gaps with
    last-observation-carried-forward (`last(..., ignorenulls)` over a
    running frame). Days before a user's first purchase stay NULL. One
    shuffle on user_id serves both the join and the fill window — the
    standard sensor/feature-store densification shape."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("day_value"))
    )
    users = e.select("user_id").distinct()
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"), F.lit("2024-01-30").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    spine = users.join(F.broadcast(days))
    j = spine.join(daily, ["user_id", "day"], "left")
    from pyspark.sql.window import Window as W

    w = (W.partitionBy("user_id").orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return j.select(
        "user_id", "day", "day_value",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("day_value").isNull().alias("is_gap"),
    )


@register("regression_agg", """
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
""")
def q_regression_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (price vs quantity per return flag):
    regr_slope/intercept/r2 as single-pass mergeable moments — the
    descriptive-modeling agg family beyond plain corr (stats_agg). Rounded
    past the ~1e-10 cross-engine moment-accumulation drift."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.count("*").alias("n"),
    )


@register("join_bucketed", """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
""")
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join (operators/skew.write_bucketed): both fact
    tables pre-shuffled once into the same 8-bucket layout on the join key,
    so the repeated join itself plans with ZERO Exchange — the 100 TB
    answer for fact-to-fact joins that recur across a pipeline (pay the
    shuffle once at ingest, amortize it over every downstream join).
    The merge hint pins SortMergeJoin so the bucket layout, not a
    broadcast, carries the join; tests/test_plans.py asserts the no-
    Exchange-below-join invariant. Result is identical to the plain join,
    so the oracle is the plain join.

    The bucketed tables are built AT MOST ONCE per session: the database
    location is keyed off the db name (stable path, reused by CREATE
    DATABASE IF NOT EXISTS — no mkdtemp leak per call) and the ingest
    shuffle is skipped when the catalog tables already exist, which is the
    pay-the-shuffle-once-at-ingest contract the query demonstrates."""
    import os
    import tempfile
    import zlib

    from parquetaivectorsearch_spark.operators.skew import write_bucketed

    db = f"bucketq_{zlib.crc32(sf_dir.encode()):08x}"
    loc = os.path.join(tempfile.gettempdir(), "pavs_bucket_dbs", db)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
    if not (spark.catalog.tableExists(f"{db}.lineitem_b")
            and spark.catalog.tableExists(f"{db}.orders_b")):
        # A fresh process has a fresh in-memory catalog but may inherit a
        # previous process's table dirs at this stable location; saveAsTable
        # refuses to CREATE a managed table over an existing path, so clear
        # the stale dirs before the (once-per-session) rebuild.
        import shutil

        for t in ("lineitem_b", "orders_b"):
            shutil.rmtree(os.path.join(loc, t), ignore_errors=True)
        li = _t(spark, sf_dir, "lineitem").select("l_orderkey",
                                                  "l_extendedprice")
        o = _t(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
        )
        write_bucketed(li, f"{db}.lineitem_b", "l_orderkey", 8)
        write_bucketed(o, f"{db}.orders_b", "l_orderkey", 8)
    j = spark.table(f"{db}.lineitem_b").hint("merge").join(
        spark.table(f"{db}.orders_b"), "l_orderkey"
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
         .cast("double").alias("total_price"),
    )


@register("sessionize_lag", """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ),
    m AS (
      SELECT user_id, event_id, ts_us,
             CASE WHEN ts_us - LAG(ts_us) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id)
                  > 1800000000 THEN 1
                  WHEN LAG(ts_us) OVER
                    (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ),
    s AS (
      SELECT user_id, ts_us,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM m
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
    FROM s GROUP BY user_id, session_id
""")
def q_sessionize_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by lag-gap (30-minute inactivity): the classic
    window-function formulation — gap flag via LAG, session id via running
    sum of flags, then a per-session rollup. The session_window-native twin
    is `session_window_agg`; this shape is what warehouses without native
    session windows run, and it doubles as the batch oracle for the
    streaming path. All arithmetic in integer epoch-micros (ties broken by
    event_id), so both engines agree bit-exactly."""
    from pyspark.sql.window import Window as W

    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr(_TS_US.format(c="ts")).alias("ts_us"))
    ow = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    prev = F.lag("ts_us").over(ow)
    new_s = F.when(prev.isNull() | (F.col("ts_us") - prev > 1_800_000_000), 1) \
        .otherwise(0)
    s = e.withColumn("new_s", new_s).withColumn(
        "session_id",
        F.sum("new_s").over(ow.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint"))
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


@register("ewma_revenue", """
    WITH s AS (
      SELECT o_custkey,
             list(o_totalprice ORDER BY o_orderdate, o_orderkey) AS xs
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, CAST(len(xs) AS BIGINT) AS n_orders,
           floor(list_reduce(xs, (acc, x) -> 0.25 * x + 0.75 * acc)
                 * 1000000 + 0.5) / 1000000 AS ewma_price
    FROM s
""")
def q_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of order totals per customer
    (α = 0.25, s₀ = x₀): the canonical RECURSIVE per-key statistic that no
    window frame can express (each state depends on the previous state,
    not a fixed row range) — implemented as an ordered collect + one
    ``aggregate`` fold per key. Bounded state: the collected list is one
    customer's order history (a per-key skew guard at 100 TB would cap or
    pre-aggregate per day). Both engines fold the identical double
    sequence left-to-right; α = 0.25 so both smoothing constants are EXACT
    binary fractions (0.3/0.7 decimal literals convert through different
    literal types per engine and flipped a 6-dp rounding boundary by one
    ulp). Presentation rounding is an EXPLICIT floor(x·1e6 + 0.5)/1e6 on
    both sides, not each engine's ROUND: with α = 1/4 a 4-order history
    lands the true value exactly on a .5 boundary at the 7th digit, where
    Spark (BigDecimal on the shortest repr) and DuckDB (C round on the
    binary double) disagree by one ulp — the sf0.1 replica sweep caught
    two such rows that sf0.01 never exposed. Identical IEEE multiply/add/
    floor on the identical double is bit-stable by construction."""
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sort_array(
            F.collect_list(F.struct("o_orderdate", "o_orderkey", "o_totalprice"))
        ).alias("rows"))
    xs = F.transform(F.col("rows"), lambda r: r["o_totalprice"])
    ewma = F.aggregate(
        F.slice(xs, 2, F.greatest(F.size(xs) - 1, F.lit(0))),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(0.25) * x + F.lit(0.75) * acc,
    )
    return s.select(
        "o_custkey",
        F.size(xs).cast("bigint").alias("n_orders"),
        (F.floor(ewma * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6))
        .alias("ewma_price"),
    )


@register("typo_pairs", """
    WITH w AS (
      SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS word
      FROM documents
    ),
    vocab AS (
      SELECT word, COUNT(*) AS c,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rn
      FROM w GROUP BY word
    ),
    top AS (SELECT word, c FROM vocab WHERE rn <= 200)
    SELECT a.word AS w1, b.word AS w2, a.c AS c1, b.c AS c2
    FROM top a JOIN top b ON a.word < b.word
    WHERE levenshtein(a.word, b.word) <= 2
""")
def q_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo/variant candidate mining: edit-distance-≤2 pairs within the
    frequency-top-200 vocabulary (the fixture dictionary is ~31 words of
    4-6 chars with no distance-1 neighbors, so the demo threshold is 2;
    real corpora run distance 1) — the spelling-normalization probe of a
    corpus-cleaning pipeline (real pipelines weight by frequency ratio:
    a rare word one edit from a frequent one is the typo). Vocabulary via
    explode + hash-agg + TakeOrdered; the candidate join is a bounded
    200×200 broadcast self-join, never corpus-sized. Identical levenshtein
    definition in both engines; ties in the top-200 cut break on the
    word."""
    from pyspark.sql.window import Window as W

    d = _t(spark, sf_dir, "documents", spread=True)
    vocab = (
        d.select(F.explode(TX.words("text")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("c"))
        .withColumn("rn", F.row_number().over(W.orderBy(F.desc("c"), "word")))
        .filter(F.col("rn") <= 200).drop("rn")
    )
    a = vocab.select(F.col("word").alias("w1"), F.col("c").alias("c1"))
    b = vocab.select(F.col("word").alias("w2"), F.col("c").alias("c2"))
    return (
        a.join(F.broadcast(b), F.col("w1") < F.col("w2"))
        .filter(F.levenshtein("w1", "w2") <= 2)
        .select("w1", "w2", "c1", "c2")
    )
