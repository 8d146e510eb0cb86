"""Training-data-pipeline operators: vocabulary building, deterministic
sampling, bucketing/histograms, canonicalization, and hypertable-style
incremental rollups (SURVEY.md north-star extensions; all **X**).

These are the ops a 100 TB pre-training corpus pipeline runs between ingest
and training: build a vocab, carve deterministic samples, normalize text for
dedup keys, and keep time-rollups incrementally maintained instead of
rescanning history. All oracle-checked — determinism notes:

- sampling uses *arithmetic* (Knuth multiplicative hash / row_number), never
  engine RNG, so Spark and DuckDB agree bit-for-bit and a 100 TB re-run is
  reproducible;
- ntile/row_number windows carry unique ORDER BY tiebreakers;
- double sums go through DECIMAL; bucket edges use FLOOR on the same IEEE
  division in both engines;
- md5 hex is lowercase in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquetaivectorsearch_spark.functions.text import words
from parquetaivectorsearch_spark.queries import _t, register

_DEC = "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Vocabulary / token frequency (the "build the BPE corpus stats" step)
# ---------------------------------------------------------------------------

@register("vocab_top_words", """
    SELECT word, COUNT(*) AS freq
    FROM (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                w -> w <> '')) AS word
      FROM documents
    )
    GROUP BY word
    ORDER BY freq DESC, word
    LIMIT 100
""")
def q_vocab_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: explode whitespace tokens, count, top-100.
    Scale shape: map-side partial counts → one shuffle on word →
    TakeOrderedAndProject for the limit (no global sort materialized)."""
    # NOT spread: the vocabulary is shared across documents, so map-side
    # partial aggregation collapses each map task's words to the ~30k
    # distinct vocabulary before the shuffle — one map task ships 30k
    # partial rows where 32 would ship ~800k (measured 2× slower overall).
    # Scan parallelism matters less than partial-agg dedup for
    # low-cardinality explodes.
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(words(F.lower("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Deterministic sampling (reproducible corpus carving)
# ---------------------------------------------------------------------------

@register("sample_hash", """
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE (doc_id * 2654435761) % 1000 < 100
""")
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample via Knuth multiplicative hashing on the key.
    Unlike rand(seed), this is stable across engines, re-runs, and partition
    layouts — and it is a pure *filter*: no shuffle, pushdown-friendly, the
    only sampling shape that is reproducible over 100 TB."""
    d = _t(spark, sf_dir, "documents")
    return d.filter((F.col("doc_id") * F.lit(2654435761)) % 1000 < 100).select(
        "doc_id", "lang", "n_chars"
    )


@register("stratified_sample", """
    SELECT doc_id, lang, rn FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    ) t WHERE rn <= 50
""")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-quota-per-stratum sample (50 docs per language): row_number
    window partitioned by the stratum key. One shuffle on lang; at 100 TB
    the per-stratum scan is cut short by the rank filter after the
    partial sort (WindowGroupLimit pushes `rn <= 50` into the sort)."""
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 50)
    )


# ---------------------------------------------------------------------------
# Bucketing / histograms
# ---------------------------------------------------------------------------

@register("ntile_bucket", """
    SELECT c_custkey, c_acctbal,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER)
             AS quartile
    FROM customer
""")
def q_ntile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile assignment over account balance (equi-depth binning —
    the discretization step of feature pipelines). Unique tiebreaker
    (c_custkey) makes the assignment deterministic in both engines."""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal",
                F.ntile(4).over(w).cast("int").alias("quartile"))
    )


@register("histogram_totalprice", """
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1
""")
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (fixed $25k buckets). FLOOR over the same IEEE
    double division is bit-identical in both engines; the agg is a plain
    map-side-combinable groupBy — the cheapest possible distribution sketch
    at 100 TB."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(F.floor(F.col("o_totalprice") / 25000.0).alias("bucket"))
        .agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Grouping sets (multi-dimensional rollup in one pass)
# ---------------------------------------------------------------------------

@register("grouping_sets_agg", """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""")
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (rollup/cube's general form, SURVEY §2.4 X):
    three aggregation grains in a single Expand+HashAggregate pass instead
    of three scans."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("sum_qty"),
        )
    )


# ---------------------------------------------------------------------------
# Text canonicalization (the dedup-key step)
# ---------------------------------------------------------------------------

@register("text_normalize", """
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm_text,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS norm_hash
    FROM documents
""")
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalize text (lowercase, trim, collapse whitespace) and emit the
    md5 content hash — the key column every exact-dedup and CDC pipeline
    groups on. Pure codegen'd expressions, no UDF."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return _t(spark, sf_dir, "documents").select(
        "doc_id", norm.alias("norm_text"), F.md5(norm).alias("norm_hash")
    )


# ---------------------------------------------------------------------------
# Hypertable-style incremental rollup
# ---------------------------------------------------------------------------

@register("incremental_rollup", f"""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           {_DEC} AS total_value
    FROM events
    GROUP BY 1
""")
def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: historical days are served from a *materialized*
    daily-aggregate parquet; only the tail (ts >= cutoff) is aggregated from
    raw events; the two grains merge with a re-aggregation. At 100 TB this
    turns a full-history scan into (tiny rollup read + recent-partition
    scan) — the continuous-aggregate pattern. Oracle: the direct full agg,
    which the merged result must equal exactly (decimal sums are exact)."""
    import tempfile

    cutoff = F.lit("2024-01-20").cast("date")
    day = F.date_trunc("day", "ts").cast("date").alias("day")
    aggs = [
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
         .cast("double").alias("total_value"),
    ]
    e = _t(spark, sf_dir, "events").select(day, "value")

    rollup_dir = tempfile.mkdtemp(prefix="rollup_daily_")
    e.filter(F.col("day") < cutoff).groupBy("day").agg(*aggs) \
        .write.mode("overwrite").parquet(rollup_dir)

    materialized = spark.read.parquet(rollup_dir)
    tail = e.filter(F.col("day") >= cutoff).groupBy("day").agg(*aggs)
    return (
        materialized.unionByName(tail)
        .groupBy("day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast("double").alias("total_value"),
        )
    )


@register("profile_columns", """
    SELECT 'o_custkey' AS col,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_custkey) AS n_nulls,
           COUNT(DISTINCT o_custkey) AS n_distinct,
           CAST(MIN(o_custkey) AS DOUBLE) AS min_v,
           CAST(MAX(o_custkey) AS DOUBLE) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           ROUND(MIN(o_totalprice), 2), ROUND(MAX(o_totalprice), 2)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus), NULL, NULL
    FROM orders
""")
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling sweep (the data-validation stage before a training
    run): per column — row count, null count, exact distinct count,
    min/max. One aggregate pass per column batch; at 100 TB the exact
    distincts swap for approx_count_distinct (`hll_distinct` is the
    registered sketch twin). Numeric min/max as DOUBLE (rounded where the
    source is a float column), categorical min/max as NULL so the three
    profile rows union into one typed frame."""
    o = _t(spark, sf_dir, "orders")
    rows = [
        o.agg(F.lit("o_custkey").alias("col"),
              F.count("*").alias("n_rows"),
              (F.count("*") - F.count("o_custkey")).alias("n_nulls"),
              F.countDistinct("o_custkey").alias("n_distinct"),
              F.min("o_custkey").cast("double").alias("min_v"),
              F.max("o_custkey").cast("double").alias("max_v")),
        o.agg(F.lit("o_totalprice").alias("col"),
              F.count("*").alias("n_rows"),
              (F.count("*") - F.count("o_totalprice")).alias("n_nulls"),
              F.countDistinct("o_totalprice").alias("n_distinct"),
              F.round(F.min("o_totalprice"), 2).alias("min_v"),
              F.round(F.max("o_totalprice"), 2).alias("max_v")),
        o.agg(F.lit("o_orderstatus").alias("col"),
              F.count("*").alias("n_rows"),
              (F.count("*") - F.count("o_orderstatus")).alias("n_nulls"),
              F.countDistinct("o_orderstatus").alias("n_distinct"),
              F.lit(None).cast("double").alias("min_v"),
              F.lit(None).cast("double").alias("max_v")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register("fk_expectations", """
    SELECT 'orders.custkey->customer' AS expectation,
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_violations
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.quantity in (0,100]',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_quantity <= 0 OR l_quantity > 100) AS BIGINT)
    UNION ALL
    SELECT 'orders.totalprice >= 0',
           CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice < 0) AS BIGINT)
""")
def q_fk_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation checks (the dbt-test / Great-Expectations layer): FK
    containment via LEFT ANTI joins (the scalable form of NOT EXISTS —
    one shuffle, no subquery-per-row) plus range assertions, each reduced
    to a violation count. A pipeline gates ingestion on all-zeros; the
    oracle states the same checks as NOT EXISTS subqueries."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")

    def row(name, cnt_df):
        return cnt_df.agg(F.lit(name).alias("expectation"),
                          F.count("*").cast("bigint").alias("n_violations"))

    checks = [
        row("orders.custkey->customer",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti")),
        row("lineitem.orderkey->orders",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")),
        row("lineitem.quantity in (0,100]",
            li.filter((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100))),
        row("orders.totalprice >= 0",
            o.filter(F.col("o_totalprice") < 0)),
    ]
    out = checks[0]
    for r in checks[1:]:
        out = out.unionByName(r)
    return out


@register("ranking_metrics", """
    WITH spend AS (
      SELECT c.c_nationkey AS nation, c.c_custkey AS cust,
             c.c_acctbal > 5000 AS rel,
             SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS amt_c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT nation, cust, rel,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY amt_c DESC, cust) AS rnk
      FROM spend
    ),
    base AS (
      SELECT nation,
             SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS n_rel,
             SUM(CASE WHEN rel AND rnk <= 10 THEN 1 ELSE 0 END) AS hits,
             SUM(CASE WHEN rel AND rnk <= 10
                      THEN 1.0 / log2(rnk + 1) ELSE 0 END) AS dcg,
             MIN(CASE WHEN rel THEN rnk END) AS first_rel
      FROM ranked GROUP BY nation
    ),
    idcg AS (
      SELECT b.nation, SUM(1.0 / log2(t.i + 1)) AS idcg
      FROM base b
      JOIN unnest(generate_series(1, 10)) AS t(i)
        ON t.i <= LEAST(10, b.n_rel)
      GROUP BY b.nation
    )
    SELECT b.nation,
           ROUND(CAST(b.hits AS DOUBLE) / 10, 6) AS precision_at_10,
           ROUND(CASE WHEN b.n_rel = 0 THEN 0.0
                      ELSE b.hits / CAST(b.n_rel AS DOUBLE) END, 6)
             AS recall_at_10,
           ROUND(CASE WHEN b.first_rel IS NULL THEN 0.0
                      ELSE CAST(1 AS DOUBLE) / b.first_rel END, 6) AS mrr,
           ROUND(CASE WHEN i.idcg IS NULL OR i.idcg = 0 THEN 0.0
                      ELSE b.dcg / i.idcg END, 6) AS ndcg_at_10
    FROM base b LEFT JOIN idcg i ON b.nation = i.nation
""")
def q_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-evaluation metrics (precision@10 / recall@10 / MRR /
    binary-gain nDCG@10) computed IN the engine — the eval loop a
    retrieval or curation pipeline runs at corpus scale instead of
    collecting ranked lists to a driver script. The "run" per nation
    ranks its ordering customers by total spend summed in EXACT cents
    (bigint — float summation order can flip near-ties across engines;
    unique (amt_c DESC, cust) tiebreak); the relevance labels are independent of the ranking
    (acctbal > 5000 over the same ordering-customer universe).

    Shape: one grouped agg for the run, one window rank, one grouped agg
    for the per-group metric sums, and a tiny broadcast series join for
    the IDCG partial sums — nothing driver-side, so scoring a billion
    ranked rows is the same plan. All arithmetic is engine-portable
    (log2, exact int counts, ROUND 6dp above summation-order drift)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nation"),
                 F.col("c_custkey").alias("cust"),
                 (F.col("c_acctbal") > 5000).alias("rel"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .alias("amt_c"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("amt_c"), F.col("cust"))
    ranked = spend.withColumn("rnk", F.row_number().over(w))
    rel1 = F.when(F.col("rel"), 1).otherwise(0)
    base = ranked.groupBy("nation").agg(
        F.sum(rel1).alias("n_rel"),
        F.sum(F.when(F.col("rel") & (F.col("rnk") <= 10), 1)
              .otherwise(0)).alias("hits"),
        F.sum(F.when(F.col("rel") & (F.col("rnk") <= 10),
                     F.lit(1.0) / F.log2(F.col("rnk") + 1))
              .otherwise(F.lit(0.0))).alias("dcg"),
        F.min(F.when(F.col("rel"), F.col("rnk"))).alias("first_rel"),
    )
    series = spark.range(1, 11).select(F.col("id").alias("i"))
    idcg = (base.join(F.broadcast(series),
                      F.col("i") <= F.least(F.lit(10), F.col("n_rel")))
            .groupBy("nation")
            .agg(F.sum(F.lit(1.0) / F.log2(F.col("i") + 1)).alias("idcg")))
    return (base.join(idcg, "nation", "left").select(
        "nation",
        F.round(F.col("hits") / 10.0, 6).alias("precision_at_10"),
        F.round(F.when(F.col("n_rel") == 0, 0.0)
                .otherwise(F.col("hits") / F.col("n_rel").cast("double")),
                6).alias("recall_at_10"),
        F.round(F.when(F.col("first_rel").isNull(), 0.0)
                .otherwise(F.lit(1.0) / F.col("first_rel")), 6).alias("mrr"),
        F.round(F.when(F.col("idcg").isNull() | (F.col("idcg") == 0), 0.0)
                .otherwise(F.col("dcg") / F.col("idcg")), 6).alias("ndcg_at_10"),
    ))
