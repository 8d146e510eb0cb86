"""Relational operator inventory (SURVEY.md §2.3-2.6, 2.9, parts of 2.8/2.10).

All north-star extensions (**X**) — the reference performs no joins, grouped
aggregations, windows, or set ops (SURVEY §2.3). Implemented over the TPC-H-ish
fixtures with DuckDB oracles.

Float-determinism conventions (see tests/test_oracle_parity.py):
- Money doubles in the fixtures are exact 2-decimal values → per-row cast to
  DECIMAL(18,2) is identical in both engines, and decimal SUMs are exact.
- Derived per-row expressions run in double (same IEEE ops both engines),
  then cast to a decimal wide enough for the exact result before summing.
- No DECIMAL in final output schemas (driver value hash is representation-
  sensitive): exact decimal sums are ROUND(…, 2)-ed where scale > 2 and cast
  to DOUBLE on both engines — bit-identical since the scale-2 int fits 2^53.
- Every ORDER BY ... LIMIT and window ORDER BY carries a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquetaivectorsearch_spark.queries import register, _t


def _dec(c, p: int = 18, s: int = 2):
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({p},{s})")


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

@register("join_orders_customer", """
    SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
""")
def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join + grouped agg. Catalyst picks the physical join
    (customer is small → broadcast-hash under AQE)."""
    o, c = _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_revenue"),
        )
    )


@register("join_broadcast_nation", """
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
""")
def q_join_broadcast_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension joins with explicit broadcast hints — at 100 TB the fact
    side never shuffles for a 25-row dim (SURVEY §2.3)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


@register("join_semi_anti", """
    SELECT 'with_orders' AS kind, c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT 'without_orders' AS kind, c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
""")
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti joins, tagged and unioned."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("with_orders").alias("kind"), "c_mktsegment", "n_customers")
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("without_orders").alias("kind"), "c_mktsegment", "n_customers")
    )
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# §2.4 grouped aggregation (TPC-H Q1 shape — the headline relational agg)
# ---------------------------------------------------------------------------

@register("groupby_agg", """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
""")
def q_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: partial (map-side) + final agg, no
    join, filter pushed to the scan. Revenue math runs per-row in double
    (bit-identical across engines), then exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem", spread=True).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc_price.cast("decimal(18,4)")), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge.cast("decimal(18,6)")), 2).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


@register("count_distinct", """
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
""")
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    return _t(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count("*").alias("n_orders"),
    )


@register("approx_count_distinct")  # rows-only: HLL estimate is engine-specific
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate — the 100 TB path where exact
    distinct's shuffle is the bottleneck."""
    return _t(spark, sf_dir, "orders").agg(
        F.approx_count_distinct("o_custkey").alias("approx_custs"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    )


@register("rollup_agg", """
    SELECT c_mktsegment, n_name,
           CAST(GROUPING(c_mktsegment) AS INTEGER) AS g_seg,
           CAST(GROUPING(n_name) AS INTEGER) AS g_nat,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (c_mktsegment, n_name)
""")
def q_rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets with GROUPING flags (SURVEY §2.4 X)."""
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .rollup("c_mktsegment", "n_name")
        .agg(
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
            F.grouping("n_name").cast("int").alias("g_nat"),
            F.count("*").alias("n_customers"),
        )
    )


@register("cube_agg", """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def q_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "lineitem")
    return c.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count("*").alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------

@register("window_rank", """
    SELECT o_custkey, o_orderkey, o_totalprice, rank_n FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rank_n
      FROM orders
    ) WHERE rank_n <= 3
""")
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — ranking window (SURVEY §2.5 X)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rank_n"),
        )
        .filter(F.col("rank_n") <= 3)
    )


@register("window_lag_lead", """
    SELECT event_id, user_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over an event stream per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register("window_running_sum", """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
""")
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running total (rowsBetween) — exact decimal arithmetic so
    the prefix sums hash-match."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.sum(_dec("value")).over(w).cast("double").alias("running_value"),
    )


# ---------------------------------------------------------------------------
# §2.9 set operations
# ---------------------------------------------------------------------------

@register("set_ops", """
    WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         with_orders AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'union' AS op, c_custkey FROM (SELECT * FROM building UNION SELECT * FROM with_orders)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM building INTERSECT SELECT * FROM with_orders)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT * FROM building EXCEPT SELECT * FROM with_orders)
""")
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/intersect/except (distinct semantics), tagged (SURVEY §2.9 X)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "c_custkey")  # noqa: E731
    return (
        tag(building.union(with_orders).distinct(), "union")
        .unionByName(tag(building.intersect(with_orders), "intersect"))
        .unionByName(tag(building.subtract(with_orders), "except"))
    )


# ---------------------------------------------------------------------------
# §2.8 date/time + JSON scalar functions
# ---------------------------------------------------------------------------

@register("date_trunc_agg", """
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
""")
def q_date_trunc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup (SURVEY §2.8 X)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


@register("json_extract", """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
""")
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string field extraction (events.props, SURVEY §2.8 X)."""
    return _t(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


# ---------------------------------------------------------------------------
# §2.10 windowed event aggregation (batch mode — streaming twin in
# parquetaivectorsearch_spark/streaming/, tested in tests/test_streaming.py)
# ---------------------------------------------------------------------------

@register("tumbling_window_agg", """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS window_day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
""")
def q_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day windows via F.window — the Structured Streaming
    operator run in batch mode (oracle: date_trunc)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("window_day"),
            "event_type", "n_events", "total_value",
        )
    )


@register("sliding_window_agg", """
    WITH exploded AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start, value FROM events
      UNION ALL
      SELECT CAST(date_trunc('day', ts) AS DATE) - 1 AS window_start, value FROM events
    )
    SELECT window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM exploded
    GROUP BY window_start
""")
def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-day windows, 1-day slide: every event lands in two windows
    (oracle: explicit two-window explode)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("window_start"),
            "n_events", "total_value",
        )
    )


@register("session_window_agg", """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM flagged
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, sess_no
""")
def q_session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user — F.session_window in batch;
    oracle rebuilds sessions via gaps-and-islands. A new event at exactly
    start+gap falls outside the [start, start+gap) session (end-exclusive),
    hence `>=` in the oracle's gap test."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            # timestampdiff against an NTZ epoch base: timezone-independent
            # (unix_micros would implicitly convert NTZ→LTZ via session TZ)
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', w.start)"
            ).alias("session_start_us"),
            "n_events", "total_value",
        )
    )
