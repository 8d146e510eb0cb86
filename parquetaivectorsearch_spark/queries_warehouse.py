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
