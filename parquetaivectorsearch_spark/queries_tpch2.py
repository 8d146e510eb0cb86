"""Full TPC-H query-shape coverage, part 2: Q2/Q7-Q10/Q12/Q13/Q15/Q17/Q19/
Q21/Q22 adapted to the driver fixtures (FIXTURES.md — no partsupp table and
no l_shipmode/l_receiptdate columns, so Q2/Q9/Q12/Q21 substitute the missing
attribute with a fixture equivalent, noted per query; Q11/Q20 run over a
partsupp DERIVED deterministically from part × supplier — see the
`_PARTSUPP_SQL` block. With that, every classic shape is here or in
queries_tpch.py).

Why these matter at 100 TB: each one is a distinct physical-plan archetype —
multi-way broadcast-dim join with disjunctive nation pairs (Q7), conditional
market-share ratio over a 5-way join (Q8), LIKE-filtered profit rollup (Q9),
group-then-top-k (Q10), outer-join + double aggregation (Q13), agg-max scalar
subquery (Q15), per-group correlated average threshold (Q17), disjunction of
conjunctive range predicates (Q19), and anti-join + global scalar threshold
(Q22). All dims (nation/region/supplier/part/customer at fixture scale)
broadcast; only lineitem/orders shuffle, each exactly once per query.

Determinism (recipe in queries.py docstring): money through per-row
DECIMAL(12,2) casts, exact decimal sums ROUND(…,2)-ed and cast to DOUBLE in
final schemas (no DECIMAL ever output — driver hash is representation-
sensitive); l_quantity is integral so plain
double sums/avgs are order-independent and bit-exact; ratios divide exact
sums in double and ROUND(6); thresholds derived from integer cent-sums; every
ORDER BY ... LIMIT carries a unique tiebreaker.

Reference parity: the reference has no relational layer at all (SURVEY §2.3,
Program.cs is scan→index→search only); this module is north-star **X**
coverage for the warehouse-analytics half of the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.queries import _t, register


def _d12(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(12,2)")


def _rev() -> F.Column:
    """Per-row revenue l_extendedprice*(1-l_discount), bit-exact decimal."""
    return _d12("l_extendedprice") * _d12(F.lit(1) - F.col("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"


@register("nation_volume", f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS l_year,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2, 3
""")
def q_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair by year. Five-way
    join where supplier/customer/nation all broadcast; the disjunctive pair
    predicate lands post-join on broadcast columns, so lineitem and orders
    each shuffle once (on the join key) and nothing else moves."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    sup = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = F.broadcast(_t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("c_nk"),
                                F.col("n_name").alias("cust_nation")))
    j = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation",
                  F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )


@register("market_share", f"""
    WITH all_nations AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
             {_REV_SQL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                      AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume
    FROM all_nations GROUP BY o_year
""")
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of ECONOMY-part revenue sold into
    ASIA customers, by order year. The widest join in the suite (7 tables);
    every dim broadcasts so the plan is lineitem⋈orders sort-merge with five
    broadcast-hash stages stacked on the probe side — one shuffle total.
    Share divides two bit-exact decimal sums in double, rounded 6dp."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    part = F.broadcast(_t(spark, sf_dir, "part")
                       .filter(F.col("p_type") == "ECONOMY").select("p_partkey"))
    sup = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = F.broadcast(_t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"))
    nat = _t(spark, sf_dir, "nation")
    n1 = F.broadcast(nat.select(F.col("n_nationkey").alias("s_nk"),
                                F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nat.select(F.col("n_nationkey").alias("c_nk"),
                                F.col("n_regionkey").alias("c_rk")))
    reg = F.broadcast(_t(spark, sf_dir, "region")
                      .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .join(reg, F.col("c_rk") == F.col("r_regionkey"))
        .select(F.year("o_orderdate").cast("long").alias("o_year"),
                _rev().alias("volume"), "supp_nation")
    )
    nation_sum = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                              F.col("volume")).otherwise(F.lit(0)))
    total_sum = F.sum("volume")
    return j.groupBy("o_year").agg(
        F.round(nation_sum.cast("double") / total_sum.cast("double"), 6).alias("mkt_share"),
        F.round(total_sum, 2).cast("double").alias("total_volume"),
    )


@register("profit_by_nation_year", """
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(12,2))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(12,2))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
""")
def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'gear' parts by supplier nation and year.
    The fixtures have no partsupp.ps_supplycost, so cost is proxied as 10% of
    p_retailprice per unit — same plan shape (LIKE-filtered part dim pruning
    the probe, profit expression spanning three tables, two-key rollup).
    All decimal arithmetic per row; one shuffle (lineitem⋈orders)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity")
    part = F.broadcast(_t(spark, sf_dir, "part")
                       .filter(F.col("p_name").like("%gear%"))
                       .select("p_partkey", "p_retailprice"))
    sup = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey"))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    profit = (_rev()
              - _d12("p_retailprice") * _d12("l_quantity") * _d12(F.lit(0.10)))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@register("returned_customers", f"""
    SELECT c_custkey, c_name,
           CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           n_name AS nation
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
""")
def q_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window. Group-then-top-k: the rollup keys include the customer
    dim columns so no second join is needed after aggregation; Spark plans
    the final ORDER BY..LIMIT as TakeOrderedAndProject (per-partition heap,
    no global sort). Decimal revenue makes the cutoff deterministic; custkey
    breaks ties."""
    cust = F.broadcast(_t(spark, sf_dir, "customer")
                       .select("c_custkey", "c_name", "c_nationkey"))
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount")
    nat = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(cust, o.o_custkey == cust.c_custkey)
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register("order_count_distribution", """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
""")
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of non-urgent order counts per customer.
    Double aggregation — the outer join keeps order-less customers (COUNT of
    the null key is 0), the first group-by reduces to one row per customer,
    the second group-by is over that tiny intermediate. The join predicate's
    extra filter rides the join (not a WHERE — it must not drop customers)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    joined = cust.join(
        o, (cust.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left_outer")
    return (
        joined.groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register("top_supplier", f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
""")
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving max quarterly revenue —
    an aggregate feeding a scalar-subquery filter over itself. A literal
    scalar-subquery translation re-runs the revenue aggregate (and so
    re-scans lineitem) for the MAX side — observed as 2 fact scans with no
    ReusedExchange. Instead the max-filter is a rank() window over the
    per-supplier agg output: lineitem is scanned once, and the only new
    exchange moves |suppliers| pre-aggregated rows to one partition (the
    agg output is ~6 orders of magnitude smaller than the fact table).
    Decimal revenue makes rank-1 equality exact, so ties (all qualifying
    suppliers) are returned just like the spec's view formulation."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue0 = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("total_revenue"))
    )
    sup = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        revenue0
        .withColumn("rk", F.rank().over(Window.orderBy(F.col("total_revenue").desc())))
        .filter(F.col("rk") == 1)
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register("small_qty_revenue", """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS total_price,
           COUNT(*) AS n_items
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#12'
      AND l1.l_quantity * 5 < (
        SELECT SUM(l2.l_quantity) / COUNT(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
      )
""")
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below 20% of a part's average
    quantity. The correlated scalar AVG becomes a grouped pre-aggregate
    joined back on partkey — computed over ALL lineitems per part (the
    correlation ignores the brand filter), then the broadcast brand dim
    prunes the probe. `l_quantity*5 < avg` replaces `< 0.2*avg`: quantities
    are integral doubles, so sum/count and the ×5 are bit-exact in any
    engine and any partial-agg order (no 0.2 rounding hazard)."""
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part")
                       .filter(F.col("p_brand") == "Brand#12").select("p_partkey"))
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg((F.sum("l_quantity") / F.count("l_quantity")).alias("avg_qty"))
    )
    return (
        li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") * 5 < F.col("avg_qty"))
        .agg(
            F.sum(_d12("l_extendedprice")).cast("double").alias("total_price"),
            F.count("*").alias("n_items"),
        )
    )


@register("disjunctive_preds", f"""
    SELECT CAST(ROUND(SUM({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
""")
def q_disjunctive_preds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of three conjunctive brand/size/quantity
    bands. Catalyst extracts the common sub-predicates it can (quantity
    bounds 1..30 under the OR) for scan-level pushdown and evaluates the full
    disjunction post-join; part broadcasts, so the OR never forces a
    nested-loop join (the join key stays a clean equi-key — the classic Q19
    trap is writing the OR into the join condition)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    part = F.broadcast(_t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size"))
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(band)
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
             F.count("*").alias("n_items"))
    )


@register("idle_customers", """
    WITH thresh AS (
      SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
               / (100.0 * COUNT(*)) AS avg_bal
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_custs,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
    FROM customer, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 440000
      )
    GROUP BY c_mktsegment
""")
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy-but-idle customers per market segment —
    above-average balance, no big order. (Every fixture customer has orders,
    so Q22's 'no orders at all' is adapted to 'no order over 440000'.) The
    global average is one scalar broadcast; the NOT EXISTS is a left-anti
    join on custkey with the price filter pushed into the anti side's scan.
    Threshold = integer cent-sum / count: exact, order-independent in both
    engines (double sums of cents-valued floats are not)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal")
    thresh = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg((F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
              / (F.lit(100.0) * F.count("*"))).alias("avg_bal"))
    )
    big_orders = (_t(spark, sf_dir, "orders")
                  .filter(F.col("o_totalprice") > 440000).select("o_custkey"))
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_custs"),
             F.sum(_d12("c_acctbal")).cast("double").alias("total_bal"))
    )


@register("priority_shipment_counts", """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
    GROUP BY l_linestatus
""")
def q_priority_shipment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line-status counts of high- vs low-priority
    orders among slow shipments (>30 days after ordering). The fixtures have
    no l_shipmode column, so l_linestatus is the grouping stand-in — the
    plan archetype is identical: fact⋈fact equi-join with a cross-table
    inequality evaluated join-side, then two conditional counts in one
    hash agg (one pass, no second join or union)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey)
                & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register("waiting_suppliers", """
    WITH items AS (
      SELECT l_orderkey, l_suppkey,
             l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM items l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE l1.is_late
      AND EXISTS (
        SELECT 1 FROM items l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM items l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.is_late
      )
    GROUP BY s_name
""")
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *only* late supplier on a
    finished multi-supplier order. The spec's EXISTS ("some other supplier
    on the order") and NOT EXISTS ("no other late supplier") are both
    per-order set facts, so instead of a semi + anti join that re-derive
    the items pipeline three times (observed: 3 lineitem scans), two
    distinct-count windows over orderkey compute them in one pass:
    qualifying rows are late AND n_suppliers≥2 AND n_late_suppliers==1.
    One scan of each fact, one hash exchange on orderkey. Lateness (>60
    days, no l_receiptdate in the fixtures) is computed once so every
    predicate agrees."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    items = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey",
                (F.col("l_shipdate") > F.col("o_orderdate")
                 + F.expr("INTERVAL 60 DAYS")).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        items
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn("n_late_supp", F.size(F.collect_set(
            F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)))
    )
    sup = F.broadcast(_t(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        flagged.filter(F.col("is_late") & (F.col("n_supp") >= 2)
                       & (F.col("n_late_supp") == 1))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register("cheapest_supplier", """
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) * 1.0
               / (100.0 * SUM(l_quantity)) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p_partkey, l_suppkey AS suppkey, ROUND(unit_price, 6) AS unit_price
    FROM unit
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#21'
      AND unit_price = (
        SELECT MIN(u2.unit_price) FROM unit u2
        WHERE u2.l_partkey = unit.l_partkey
      )
""")
def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the supplier offering each part at the lowest
    observed unit price — a correlated MIN subquery joined back on
    (partkey, min_value). The fixtures have no partsupp.ps_supplycost, so
    unit price is derived from lineitem: integer cent-sum / integral
    quantity-sum, both order-independent, so the double division and the
    rank-1 cutoff are bit-exact across engines (ties return every minimal
    supplier, as in the spec). The groupwise-min is a rank() window
    PARTITIONed BY partkey over the per-(part,supplier) agg output — a
    join-back against a second aggregate re-scans lineitem (observed: no
    ReusedExchange), while the window shuffles only the already-collapsed
    rollup, ~|part×supplier| rows."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg((F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) * 1.0
              / (F.lit(100.0) * F.sum("l_quantity"))).alias("unit_price"))
    )
    part = F.broadcast(_t(spark, sf_dir, "part")
                       .filter(F.col("p_brand") == "Brand#21").select("p_partkey"))
    w = Window.partitionBy("l_partkey").orderBy("unit_price")
    return (
        unit.join(part, unit.l_partkey == part.p_partkey)
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") == 1)
        .select("p_partkey", F.col("l_suppkey").alias("suppkey"),
                F.round("unit_price", 6).alias("unit_price"))
    )


# ---------------------------------------------------------------------------
# Q11/Q20: the two partsupp-inventory shapes. The fixtures ship no partsupp
# table, so one is DERIVED deterministically with pure integer arithmetic
# (no engine-specific hashing) — both engines construct the identical table,
# so the query shapes become fully oracle-checkable. TPC-H's own partsupp
# has exactly 4 suppliers per part, so the derivation mirrors that shape:
# each part expands to 4 pseudo-random supplier candidates
# (p_partkey*13 + i*97) % |supplier| + 1, i ∈ 0..3, equi-joined back to
# supplier — LINEAR in SF. (The r1-r6 derivation was part CROSS JOIN
# supplier with a %3 eligibility filter: fine at sf0.01 where it planned as
# a broadcast-NLJ, but quadratic in SF — VERDICT r6 "what's wrong" #3.)
#   ps_availqty:     (p_partkey*31 + s_suppkey*17) % 9999 + 1
#   ps_supplycost¢:  (p_partkey*7  + s_suppkey*13) % 100000 + 100  (integer cents)
# Costs stay INTEGER CENTS through every aggregate and comparison so the
# value filters are bit-exact; division by 100 happens only in the output.
# ---------------------------------------------------------------------------

_PARTSUPP_SQL = """
    ps_cand AS (
      SELECT DISTINCT p_partkey,
             (p_partkey * 13 + i * 97) % ns + 1 AS cand_suppkey
      FROM part
      CROSS JOIN (SELECT COUNT(*) AS ns FROM supplier)
      CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS i)
    ),
    partsupp AS (
      SELECT p_partkey AS ps_partkey, s_suppkey AS ps_suppkey, s_nationkey,
             (p_partkey * 31 + s_suppkey * 17) % 9999 + 1 AS ps_availqty,
             (p_partkey * 7 + s_suppkey * 13) % 100000 + 100 AS ps_cost_cents
      FROM ps_cand JOIN supplier ON s_suppkey = cand_suppkey
    )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = s.agg(F.count("*").alias("ns"))
    cand = (
        p.join(F.broadcast(ns))  # single-row broadcast, not a cartesian
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
            "ns",
        )
        .select(
            "p_partkey",
            ((F.col("p_partkey") * 13 + F.col("i") * 97) % F.col("ns") + 1)
            .alias("cand_suppkey"),
        )
        .distinct()  # two i's can collide mod small |supplier|
    )
    ps = cand.join(s, cand.cand_suppkey == s.s_suppkey)
    return ps.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.col("s_suppkey").alias("ps_suppkey"),
        "s_nationkey",
        ((F.col("p_partkey") * 31 + F.col("s_suppkey") * 17) % 9999 + 1)
        .alias("ps_availqty"),
        ((F.col("p_partkey") * 7 + F.col("s_suppkey") * 13) % 100000 + 100)
        .alias("ps_cost_cents"),
    )


@register("important_stock", "WITH " + _PARTSUPP_SQL + """
    , natps AS (
      SELECT ps_partkey, ps_cost_cents * ps_availqty AS v_cents
      FROM partsupp WHERE s_nationkey < 5
    ),
    pv AS (SELECT ps_partkey, CAST(SUM(v_cents) AS BIGINT) AS value_cents
           FROM natps GROUP BY ps_partkey),
    tot AS (SELECT CAST(SUM(v_cents) AS BIGINT) AS total_cents FROM natps)
    SELECT ps_partkey, CAST(value_cents AS DOUBLE) / 100.0 AS stock_value
    FROM pv CROSS JOIN tot
    WHERE value_cents * 10000 > total_cents
    ORDER BY value_cents DESC, ps_partkey
""")
def q_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape over the derived partsupp: per-part inventory value
    (cost × availqty) restricted to a supplier-nation band, keeping parts
    whose value exceeds 1/10000 of the national total. The group-vs-global
    comparison is INTEGER (cents × qty, cross-checked via value·10⁴ >
    total — no double threshold can flip a boundary row), with one
    broadcastable single-row agg for the total; plan = two hash-aggs over
    one partsupp derivation + TakeOrdered."""
    ps = _partsupp(spark, sf_dir).filter(F.col("s_nationkey") < 5)
    natps = ps.select(
        "ps_partkey",
        (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v_cents"))
    pv = natps.groupBy("ps_partkey").agg(
        F.sum("v_cents").cast("bigint").alias("value_cents"))
    tot = natps.agg(F.sum("v_cents").cast("bigint").alias("total_cents"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 10000 > F.col("total_cents"))
        .select("ps_partkey",
                (F.col("value_cents").cast("double") / 100.0).alias("stock_value"),
                "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
        .drop("value_cents")
    )


@register("excess_inventory", "WITH " + _PARTSUPP_SQL + """
    , shipped AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT ps_suppkey, COUNT(DISTINCT ps_partkey) AS n_excess_parts
      FROM partsupp JOIN shipped
        ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      WHERE ps_availqty * 2 > qty
      GROUP BY ps_suppkey
    )
    SELECT s_suppkey, s_name, n_excess_parts
    FROM supplier JOIN excess ON s_suppkey = ps_suppkey
    ORDER BY s_suppkey
""")
def q_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape over the derived partsupp: suppliers holding more
    than half a year's shipped quantity of some part they stock, with the
    count of such parts — the excess-inventory chain (lineitem year-agg →
    partsupp threshold join → per-supplier distinct-count → supplier
    join). The half-of-quantity comparison is integer (availqty·2 > qty;
    l_quantity is integral-valued, summed as BIGINT), so the filter is
    bit-exact in both engines; the per-part counts make the output
    hash-sensitive to every threshold decision even where the fixture's
    uniform availqty makes the supplier-level filter weakly selective."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("qty"))
    ps = _partsupp(spark, sf_dir)
    excess = (
        ps.join(shipped, (ps.ps_partkey == shipped.l_partkey)
                & (ps.ps_suppkey == shipped.l_suppkey))
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .groupBy("ps_suppkey")
        .agg(F.countDistinct("ps_partkey").alias("n_excess_parts"))
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        s.join(excess, s.s_suppkey == excess.ps_suppkey)
        .select("s_suppkey", "s_name", "n_excess_parts")
        .orderBy("s_suppkey")
    )
