"""Remaining TPC-H query shapes: Q6 (selective scan-agg), Q14 (conditional
aggregation), Q4 (correlated-EXISTS agg), Q16 (distinct-count by attrs), plus
the argmax / median / full-outer relational fill-ins.

Together with pricing_summary (Q1), top_revenue_orders (Q3), regional_revenue
(Q5) and big_orders (Q18) these cover the classic warehouse access patterns a
user of the reference's corpus-analytics phase would run at 100 TB: every one
is a scan → (join) → aggregate with pushed-down filters, no driver-side loop.

Determinism notes (recipe in queries.py docstring): money through per-row
DECIMAL(12,2) casts; ratios via double division of bit-exact decimal sums,
rounded; argmax through a unique integer sort key (price-cents ⧺ orderkey)
so ties cannot exist; medians are linear-interpolated identically in Spark
and DuckDB, rounded 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.queries import _t, register


def _d12(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(12,2)")


@register("forecast_revenue", """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 25
""")
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective multi-predicate scan feeding a global
    sum — the canonical predicate-pushdown showcase (all three filters reach
    the parquet row-group stats; no shuffle at all, one partial+final agg).
    The reference has no filters anywhere (SURVEY §2.2), so this is the
    purest 'Catalyst does it for free' win."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 25)
    )
    return li.agg(
        F.round(F.sum(_d12("l_extendedprice") * _d12("l_discount")), 2)
        .cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register("promo_revenue", """
    WITH j AS (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l_discount AS DECIMAL(12,2)) AS rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
    )
    SELECT CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END), 2)
                AS DOUBLE) AS promo_revenue,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS total_revenue,
           ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
                              AS DOUBLE)
                       / CAST(SUM(rev) AS DOUBLE), 6) AS promo_pct
    FROM j
""")
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (sum of CASE) over a
    broadcast fact⋈dim join — `part` is the small side, so the only wide
    plan node is the final single-row agg. The percentage divides the two
    bit-exact decimal sums in double and rounds."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    part = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = _d12("l_extendedprice") * _d12(F.lit(1) - F.col("l_discount"))
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_type"), rev.alias("rev")
    )
    promo_sum = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(F.lit(0))).cast("decimal(38,4)")
    total_sum = F.sum("rev").cast("decimal(38,4)")
    return j.agg(
        F.round(promo_sum, 2).cast("double").alias("promo_revenue"),
        F.round(total_sum, 2).cast("double").alias("total_revenue"),
        F.round(100.0 * promo_sum.cast("double") / total_sum.cast("double"), 6).alias("promo_pct"),
    )


@register("late_orders_priority", """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    )
    GROUP BY o_orderpriority
""")
def q_late_orders_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: count orders per priority having at least one item
    shipped >90 days after ordering. Spark plans the correlated EXISTS as a
    left-semi sort-merge join with the date predicate evaluated join-side;
    the semi join ships each order at most once regardless of item fan-out."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


@register("brand_supplier_count", """
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#10' AND p_size IN (1, 5, 9, 13, 17)
    GROUP BY p_brand, p_type
""")
def q_brand_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count of suppliers per part attribute after
    an anti-filter on brand. COUNT(DISTINCT) expands to a two-phase agg
    (partial distinct per partition, then exchange on the group keys) —
    Catalyst's expand-based rewrite, no driver involvement."""
    part = F.broadcast(
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#10") & F.col("p_size").isin(1, 5, 9, 13, 17))
        .select("p_partkey", "p_brand", "p_type")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register("argmax_agg", """
    WITH keyed AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey AS sort_key,
             CAST(o_totalprice AS DOUBLE) AS price
      FROM orders
    )
    SELECT o_custkey,
           arg_max(o_orderkey, sort_key) AS top_orderkey,
           MAX(price) AS max_price,
           COUNT(*) AS n_orders
    FROM keyed GROUP BY o_custkey
""")
def q_argmax_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax per group via max_by (SURVEY §2.4 X): each customer's highest-
    value order. The sort key packs (price-cents, orderkey) into one BIGINT
    so the argmax is total-ordered — max_by/arg_max on ties is otherwise
    engine-nondeterministic. One hash agg, no window, no shuffle beyond the
    group-by exchange (cheaper than the row_number() alternative at scale)."""
    o = _t(spark, sf_dir, "orders")
    key = (F.round(F.col("o_totalprice") * 100).cast("bigint") * F.lit(10000000)
           + F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", key.alias("sort_key"),
                 F.col("o_totalprice").cast("double").alias("price"))
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", "sort_key").alias("top_orderkey"),
            F.max("price").alias("max_price"),
            F.count("*").alias("n_orders"),
        )
    )


@register("median_agg", """
    SELECT l_returnflag,
           ROUND(MEDIAN(l_quantity), 6) AS med_qty,
           ROUND(MEDIAN(l_extendedprice), 6) AS med_price,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_returnflag
""")
def q_median_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per group (SURVEY §2.4 X). Spark's median ≡ DuckDB's
    MEDIAN (linear interpolation at even counts; the interpolated midpoint of
    two doubles is bit-exact in both). At 100 TB the exact median needs a
    full sort per group — approx_percentile_agg is the sketch-based scale
    path; this is the canonical-result twin."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.median("l_quantity"), 6).alias("med_qty"),
            F.round(F.median("l_extendedprice"), 6).alias("med_price"),
            F.count("*").alias("n_items"),
        )
    )


@register("full_outer_join", """
    WITH e AS (
      SELECT user_id, COUNT(*) AS n_error FROM events
      WHERE event_type = 'error' AND value > 300 GROUP BY user_id
    ),
    p AS (
      SELECT user_id, COUNT(*) AS n_purchase FROM events
      WHERE event_type = 'purchase' AND value > 300 GROUP BY user_id
    )
    SELECT COALESCE(e.user_id, p.user_id) AS user_id, e.n_error, p.n_purchase
    FROM e FULL OUTER JOIN p ON e.user_id = p.user_id
""")
def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (SURVEY §2.3 X): high-value error users vs high-value
    purchase users — each side keeps its unmatched keys (both null patterns
    occur at sf0.01). Both inputs aggregate on the join key first, so the
    outer join itself is small-on-small after two map-side-combined aggs."""
    ev = _t(spark, sf_dir, "events")
    e = (ev.filter((F.col("event_type") == "error") & (F.col("value") > 300))
         .groupBy("user_id").agg(F.count("*").alias("n_error")))
    p = (ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 300))
         .groupBy("user_id").agg(F.count("*").alias("n_purchase")))
    return (
        e.join(p, "user_id", "full_outer")
        .select(F.col("user_id"), "n_error", "n_purchase")
    )
