"""SQL-surface coverage: subquery forms, expressed through spark.sql().

The engine's primary API is the DataFrame, but the same Catalyst frontend
exposes full ANSI subquery support — aggregated derived tables with HAVING,
EXISTS/IN (rewritten to semi-joins), and scalar subqueries (planned as a
broadcast one-row aggregate). These queries run through `spark.sql` over
temp views to pin the SQL path end-to-end, not just the DataFrame builders.

Determinism: money sums through DECIMAL internally, DOUBLE in final
schemas (driver hash is decimal-representation-sensitive); the
scalar-subquery threshold is
rounded to whole dollars before comparing (an avg differing in the last ulp
across engines must not flip row membership)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquetaivectorsearch_spark.queries import _t, register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        _t(spark, sf_dir, t).createOrReplaceTempView(t)


@register("big_orders", """
    SELECT o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS total_price,
           CAST(s.sum_qty AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
    ) s ON s.l_orderkey = o.o_orderkey
""")
def q_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: join against an aggregated derived table with
    HAVING. Catalyst plans the subquery once (agg then join) — the filter
    on the aggregate happens before the join ships anything."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS total_price,
               CAST(s.sum_qty AS DOUBLE) AS sum_qty
        FROM orders o
        JOIN (
          SELECT l_orderkey,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
          FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120
        ) s ON s.l_orderkey = o.o_orderkey
    """)


@register("exists_subquery", """
    SELECT o_orderkey, o_orderstatus
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 90000
    )
""")
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst decorrelates it into a left-semi join on
    the pushed-down price filter (the rewrite the reference's hand-coded
    pipeline could never express)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderkey, o_orderstatus
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_extendedprice > 90000
        )
    """)


@register("above_avg_orders", """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders
    WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice)) FROM orders)
""")
def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: planned as a one-row broadcast
    aggregate feeding the scan filter — two passes over orders, no join.
    The threshold is rounded to whole dollars so a last-ulp AVG difference
    between engines cannot flip membership of any row."""
    _views(spark, sf_dir, "orders")
    return spark.sql("""
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price
        FROM orders
        WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice)) FROM orders)
    """)


@register("not_exists_subquery", """
    SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
    )
""")
def q_not_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti join after decorrelation: customers
    with no order above $400k. The anti join ships each customer at most
    once; the price filter prunes the orders side before the exchange."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
        )
    """)


@register("correlated_scalar_subquery", """
    SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer c
    WHERE c_acctbal > (
      SELECT ROUND(AVG(c2.c_acctbal), 2) FROM customer c2
      WHERE c2.c_nationkey = c.c_nationkey
    )
""")
def q_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their own nation's mean
    balance. Catalyst decorrelates to a per-nation aggregate joined back on
    nationkey — one extra agg + broadcast join, not N subquery executions.
    The comparison threshold is rounded to cents so a last-ulp AVG drift
    between engines cannot flip row membership."""
    _views(spark, sf_dir, "customer")
    return spark.sql("""
        SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT ROUND(AVG(c2.c_acctbal), 2) FROM customer c2
          WHERE c2.c_nationkey = c.c_nationkey
        )
    """)


@register("in_subquery", """
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_nationkey IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 2)
    )
""")
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over a dim subquery → left-semi broadcast join after rewrite."""
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 2)
        )
    """)


@register("lateral_topn", """
    SELECT n.n_name, l.c_custkey, l.acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
      FROM customer c WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 2
    ) l
""")
def q_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-group ORDER BY .. LIMIT: the
    top-2 customers by balance for each nation. Catalyst decorrelates the
    lateral into a ranked join (same physical shape as the window top-N,
    window_rank) — the SQL-surface twin of that DataFrame pattern."""
    _views(spark, sf_dir, "nation", "customer")
    return spark.sql("""
        SELECT n.n_name, l.c_custkey, l.acctbal
        FROM nation n, LATERAL (
          SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal
          FROM customer c WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) l
    """)


@register("recursive_calendar", """
    WITH RECURSIVE months(m) AS (
      SELECT DATE '1995-01-01' AS m
      UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
      WHERE m < DATE '2001-08-01'
    )
    SELECT year(m) AS y, month(m) AS mo, COUNT(o_orderkey) AS n_orders
    FROM months LEFT JOIN orders
      ON year(o_orderdate) = year(m) AND month(o_orderdate) = month(m)
    GROUP BY 1, 2
""")
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 UnionLoop): generate the monthly calendar
    spine spanning the order history, then left-join order counts onto it —
    months with zero orders survive (the gap-revealing shape a pure GROUP BY
    on the fact table cannot produce). The recursion is ~80 driver-cheap
    iterations over one-row frames; the join + agg stay distributed."""
    _views(spark, sf_dir, "orders")
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
          SELECT DATE '1995-01-01' AS m
          UNION ALL SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
          WHERE m < DATE '2001-08-01'
        )
        SELECT year(m) AS y, month(m) AS mo, COUNT(o_orderkey) AS n_orders
        FROM months LEFT JOIN orders
          ON year(o_orderdate) = year(m) AND month(o_orderdate) = month(m)
        GROUP BY 1, 2
    """)
