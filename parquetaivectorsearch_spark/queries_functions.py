"""Scalar/array/table-function surface: string + regexp + array functions,
per-row sequence generation (lateral explode), unpivot, and element-wise
vector arithmetic (SURVEY §2.8 X).

The reference's only scalar work is a concat, a cast, and a tokenize
(Program.cs:79-88); a user migrating real pipelines needs the whole scalar
toolbox, JVM-side so it stays inside whole-stage codegen — none of these
queries runs a line of Python per row.

Determinism notes: regex patterns restricted to constructs Java regex and
RE2 evaluate identically (literal classes, bounded quantifiers, no
backrefs); arrays normalized to sorted-distinct joined strings before
hashing (engines order set-ops differently); timestamps exported as
epoch-µs BIGINTs; the vector-sum norm compares an element-fold against the
oracle's inner-product algebra ‖a+q‖² = ⟨a,a⟩+2⟨a,q⟩+⟨q,q⟩, rounded well
above float ulp drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquetaivectorsearch_spark.functions import vector as V
from parquetaivectorsearch_spark.queries import _t, register

_TS_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"


@register("string_functions", """
    SELECT doc_id,
           upper(lang) AS lang_up,
           lpad(CAST(doc_id % 1000 AS VARCHAR), 6, '0') AS padded_id,
           reverse(source) AS rev_source,
           translate(source, 'src', 'SRC') AS xlat_source,
           levenshtein(lang, 'en') AS lev_en,
           substr(text, 1, 20) AS head20,
           repeat(lang, 2) AS lang_2x
    FROM documents
""")
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery (upper/lpad/reverse/translate/levenshtein/
    substr/repeat) — all JVM built-ins fused into one codegen'd project over
    the scan; Levenshtein doubles as the edit-distance kernel for fuzzy
    dedup blocking."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 6, "0").alias("padded_id"),
        F.reverse("source").alias("rev_source"),
        F.translate("source", "src", "SRC").alias("xlat_source"),
        F.levenshtein(F.col("lang"), F.lit("en")).alias("lev_en"),
        F.substring("text", 1, 20).alias("head20"),
        F.repeat("lang", 2).alias("lang_2x"),
    )


@register("regexp_functions", """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+ing')) AS INTEGER) AS n_ing_words,
           regexp_extract(text, '([A-Za-z]{9,})', 1) AS first_long_word,
           length(regexp_replace(text, '[aeiou]', '*', 'g')) AS len_masked
    FROM documents
""")
def q_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract-all (match count), first capture-group
    extract, and global replace. Patterns stick to constructs Java regex and
    DuckDB's RE2 agree on; Spark's regexp_replace is global by default —
    the oracle passes the 'g' flag explicitly."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[A-Za-z]+ing"), 0))
        .alias("n_ing_words"),
        F.regexp_extract(F.col("text"), "([A-Za-z]{9,})", 1).alias("first_long_word"),
        F.length(F.regexp_replace(F.col("text"), "[aeiou]", "*"))
        .cast("bigint").alias("len_masked"),
    )


_STOP5 = ("the", "and", "of", "to", "a")


@register("array_functions", f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(len(words) AS INTEGER) AS n_words,
           array_to_string(words[1:3], ' ') AS first3,
           COALESCE(array_to_string(list_sort(list_distinct(
             list_intersect(words, {list(_STOP5)}))), '|'), '') AS stopwords_present,
           CAST(len(list_distinct(words)) AS INTEGER) AS n_uniq
    FROM w
""")
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function battery over tokenized words: slice, set-intersect
    against a literal stopword array, distinct-count. Set results are
    normalized (sorted-distinct, joined) because engines order intersections
    differently. All higher-order/array built-ins — no UDF."""
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda x: x != "")
    stop = F.array(*[F.lit(s) for s in _STOP5])
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_join(F.slice(words, 1, 3), " ").alias("first3"),
        F.array_join(
            F.array_sort(F.array_distinct(F.array_intersect(words, stop))), "|"
        ).alias("stopwords_present"),
        F.size(F.array_distinct(words)).alias("n_uniq"),
    )


@register("sequence_explode", f"""
    SELECT o_orderkey,
           epoch_us(unnest(generate_series(o_orderdate,
                                           o_orderdate + INTERVAL 2 DAY,
                                           INTERVAL 1 DAY))) AS day_us
    FROM orders WHERE o_orderkey < 200
""")
def q_sequence_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row sequence generation + lateral explode (the table-function
    pattern: one order row → one row per covered day). Spark's
    sequence()+explode() runs inside codegen; the generated timestamps are
    exported as epoch-µs ints for the oracle hash."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    days = F.explode(
        F.sequence(
            F.col("o_orderdate"),
            F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS"),
            F.expr("INTERVAL 1 DAY"),
        )
    )
    return o.select("o_orderkey", days.alias("day")).select(
        "o_orderkey", F.expr(_TS_US.format(c="day")).alias("day_us")
    )


@register("unpivot_stack", """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value
    FROM part
""")
def q_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of two part metrics via the DataFrame
    unpivot API (plans as a zero-shuffle Expand node — each input row emits
    its value rows in place; the UNION ALL oracle would scan twice).
    Inverse of pivot_event_types."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@register("vector_arithmetic", """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
    SELECT e.vec_id,
           CAST(e.embedding[1] AS DOUBLE) + CAST(q.qv[1] AS DOUBLE) AS e0_sum,
           ROUND(sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                      + 2 * list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                      + list_inner_product(q.qv::DOUBLE[], q.qv::DOUBLE[])), 6) AS norm_sum,
           ROUND(0.5 * sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
                      + 2 * list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[])
                      + list_inner_product(q.qv::DOUBLE[], q.qv::DOUBLE[])), 6) AS norm_avg
    FROM embeddings e, q
""")
def q_vector_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise vector arithmetic (SURVEY §2.8 X): a + q via zip_with,
    then the L2 norm of the sum and of the midpoint 0.5·(a+q) — the
    building blocks of centroid updates and embedding interpolation, all as
    codegen'd higher-order functions. The oracle verifies through the
    inner-product expansion ‖a+q‖² = ⟨a,a⟩+2⟨a,q⟩+⟨q,q⟩ (alternate float
    summation order → ROUND 6)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = (emb.filter(F.col("vec_id") == 1)
         .select(F.col("embedding").alias("qv")))
    vsum = F.zip_with("embedding", "qv",
                      lambda x, y: x.cast("double") + y.cast("double"))
    out = emb.join(F.broadcast(q)).select(
        "vec_id",
        (F.element_at("embedding", 1).cast("double")
         + F.element_at("qv", 1).cast("double")).alias("e0_sum"),
        vsum.alias("vsum"),
    )
    norm = V.l2_norm("vsum")
    return out.select(
        "vec_id",
        "e0_sum",
        F.round(norm, 6).alias("norm_sum"),
        F.round(0.5 * norm, 6).alias("norm_avg"),
    )


@register("project_features", """
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 4),
    dots AS (
      SELECT e.vec_id, q.qid,
             list_inner_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) AS dot
      FROM embeddings e, q
    )
    SELECT vec_id,
           MAX(CASE WHEN qid = 0 THEN dot END) AS f0,
           MAX(CASE WHEN qid = 1 THEN dot END) AS f1,
           MAX(CASE WHEN qid = 2 THEN dot END) AS f2,
           MAX(CASE WHEN qid = 3 THEN dot END) AS f3
    FROM dots GROUP BY vec_id
""")
def q_project_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature projection (random-projection shape): every embedding dotted
    against a fixed 4-vector basis (corpus rows 0-3), pivoted wide — the
    dimensionality-reduction step of an embedding-table pipeline. Broadcast
    the basis, score in one pass, pivot by basis id; dot folds are
    sequential-double so each feature is bit-exact vs the oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    basis = F.broadcast(
        emb.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    )
    return (
        emb.join(basis)
        .select("vec_id", "qid", V.dot("embedding", "qv").alias("dot"))
        .groupBy("vec_id")
        .pivot("qid", [0, 1, 2, 3])
        .agg(F.first("dot"))
        .select(
            "vec_id",
            F.col("0").alias("f0"), F.col("1").alias("f1"),
            F.col("2").alias("f2"), F.col("3").alias("f3"),
        )
    )


@register("datetime_functions", """
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(QUARTER FROM o_orderdate) AS qtr,
           EXTRACT(MONTH FROM o_orderdate) AS mon,
           EXTRACT(DOY FROM o_orderdate) AS doy,
           isodow(o_orderdate) AS iso_dow,
           datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS epoch_day,
           datediff('day', DATE '1970-01-01', last_day(CAST(o_orderdate AS DATE)))
             AS month_end_day,
           datediff('day', DATE '1970-01-01',
                    CAST(date_trunc('month', o_orderdate) AS DATE))
             AS month_start_day,
           (EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
             + EXTRACT(MONTH FROM o_orderdate) - 1 AS month_index
    FROM orders WHERE o_orderkey < 1000
""")
def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function battery (SURVEY §2.8 X): extract fields, ISO
    weekday, last-day/truncation boundaries, month indexing. Every output is
    an integer (epoch-day or field number) — the cross-engine-safe export
    per the determinism recipe; Spark's weekday() (0=Monday) maps to
    DuckDB's isodow (1=Monday) by +1. All codegen'd, filter pushed."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    d = F.to_date("o_orderdate")
    epoch = F.lit("1970-01-01").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.datediff(d, epoch).cast("long").alias("epoch_day"),
        F.datediff(F.last_day(d), epoch).cast("long").alias("month_end_day"),
        F.datediff(F.to_date(F.date_trunc("month", "o_orderdate")), epoch)
            .cast("long").alias("month_start_day"),
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1)
            .cast("long").alias("month_index"),
    )


@register("map_functions", """
    SELECT user_id,
           COUNT(DISTINCT event_type) AS n_types,
           COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
           CAST(MAX(event_type = 'error') AS INTEGER) AS has_error
    FROM events GROUP BY user_id
""")
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface (SURVEY §2.8 X): per-user event-type histogram as a
    real MapType column — map_from_entries over sorted collected structs,
    then size / element_at / map_contains_key consume it. The oracle reads
    the same facts relationally (conditional counts), proving the map round
    trip loses nothing. Two-level agg keeps the collect_list per (user,type)
    pair tiny; the map itself never exceeds the event-type cardinality."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    m = (
        counts.groupBy("user_id")
        .agg(F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m"))
    )
    return m.select(
        "user_id",
        F.size("m").cast("long").alias("n_types"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("clicks"),
        # int, not boolean: the driver hash's boolean representation
        # behavior is unverified (this query's first sampling is r7) —
        # 0/1 is representation-proof in both engines
        F.map_contains_key("m", "error").cast("int").alias("has_error"),
    )


@register("conditional_functions", """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           GREATEST(c_acctbal, 0.0) AS bal_floor,
           LEAST(c_acctbal, 5000.0) AS bal_cap,
           COALESCE(ROUND(c_acctbal / NULLIF(c_nationkey % 5, 0), 4), -1.0)
             AS per_unit,
           CASE WHEN c_acctbal IS NULL THEN 0 ELSE 1 END AS has_bal
    FROM customer
""")
def q_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling battery (SURVEY §2.8 X): CASE banding,
    GREATEST/LEAST clamps, NULLIF-guarded division with COALESCE fallback.
    All codegen'd row-local expressions — the null-safety idioms every
    ingest pipeline needs, with zero exchanges in the plan."""
    c = _t(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high")
            .alias("bal_band"),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor"),
        F.least(bal, F.lit(5000.0)).alias("bal_cap"),
        F.coalesce(
            F.round(bal / F.nullif(F.col("c_nationkey") % 5, F.lit(0)), 4),
            F.lit(-1.0),
        ).alias("per_unit"),
        F.when(bal.isNull(), 0).otherwise(1).alias("has_bal"),
    )


@register("bitwise_functions", """
    SELECT o_orderkey,
           xor(o_orderkey, o_custkey) AS key_xor,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 15 AS with_flags,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           bit_count(o_orderkey) AS popcount
    FROM orders WHERE o_orderkey < 2000
""")
def q_bitwise_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery (SURVEY §2.8 X): xor/and/or, shifts, popcount — the
    primitives behind hash partitioning, bloom/bit-sampling sketches and
    SimHash-style fingerprints (operators/dedup.py uses them in anger).
    Pure codegen row-local ops; key filter pushed to the scan."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        (k.bitwiseAND(F.lit(255))).alias("low_byte"),
        (k.bitwiseOR(F.lit(15))).alias("with_flags"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).cast("int").alias("popcount"),
    )


@register("variant_json", """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract(props, '$.k') AS INTEGER)
             * CAST(json_extract(props, '$.k') AS INTEGER) AS k_sq,
           CAST(json_extract(props, '$.k') AS INTEGER) > 50 AS is_big
    FROM events
""")
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once into an
    open-schema VARIANT value, then typed variant_get extraction — the
    engine-native answer to schema-drifting JSON at 100 TB (no
    per-row schema inference, binary-encoded storage, shreddable).
    get_json_object (string re-parse per access) stays in json_extract
    as the legacy twin."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k * k).alias("k_sq"),
        (k > 50).alias("is_big"),
    )


@register("udtf_split_words", """
    WITH w AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '') AS arr
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, CAST(u.s.pos AS INTEGER) AS pos, u.s.word AS word
    FROM w, unnest(list_transform(arr,
                   (x, i) -> struct_pack(pos := i - 1, word := x))) AS u(s)
""")
def q_udtf_split_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (SURVEY §2.11; Spark 4 table function): LATERAL
    split of each document into (position, word) rows. The set-returning
    escape hatch when explode()-on-an-expression can't express the
    generator (stateful tokenizers, parsers). Bounded to 50 docs — the
    row-at-a-time Python path is the *slow* lane and the battery exists to
    pin the API, not to win the benchmark; explode_words is the codegen
    twin."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class SplitWords:
        def eval(self, text: str):
            import re
            words = [t for t in re.split(r"\s+", (text or "").strip()) if t]
            for i, w in enumerate(words):
                yield i, w

    spark.udtf.register("split_words_udtf", SplitWords)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.createOrReplaceTempView("docs_for_udtf")
    return spark.sql("""
        SELECT doc_id, t.pos, t.word
        FROM docs_for_udtf, LATERAL split_words_udtf(text) t
    """)


@register("python_datasource_scan", """
    WITH seq AS (
      SELECT unnest(generate_series(0, 4999)) AS id
    )
    SELECT id, (id * 2654435761) % 100003 AS val
    FROM seq WHERE (id * 2654435761) % 100003 < 50000
""")
def q_python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source via the Python DataSource API (Spark 4, SURVEY §2.1):
    a partitioned synthetic sequence source registered as a first-class
    format — executors read input partitions independently, exactly like
    parquet file splits. The filter rides on top like any scan predicate.
    See sources/pyds.py for the source; the oracle regenerates the same
    deterministic rows relationally."""
    from parquetaivectorsearch_spark.session import ship_package
    from parquetaivectorsearch_spark.sources.pyds import SequenceDataSource

    # The DataSource class pickles by module reference and this query never
    # touches load_table's lazy hook — ship the package zip explicitly.
    ship_package(spark)

    try:
        spark.dataSource.register(SequenceDataSource)
    except Exception:
        pass  # already registered in this session
    df = (spark.read.format("seqsource")
          .option("n", 5000).option("parts", 8).load())
    return df.filter(F.col("val") < 50000)


@register("datetime_constructors", """
    SELECT o_orderkey,
           datediff('day', DATE '1970-01-01',
                    make_date(CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER),
                              CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER), 1))
             AS month_floor_day,
           epoch_us(make_timestamp(CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT),
                                   CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT),
                                   CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT),
                                   12, 30, 0))
             AS noonish_us
    FROM orders WHERE o_orderkey < 1500
""")
def q_datetime_constructors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime constructors (SURVEY §2.8 X): make_date / make_timestamp
    from extracted fields — the write side of the datetime battery (building
    partition boundaries, synthetic event times). Integer epoch-day/µs
    outputs per the determinism recipe."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1500)
    epoch = F.lit("1970-01-01").cast("date")
    y, m, d = F.year("o_orderdate"), F.month("o_orderdate"), F.dayofmonth("o_orderdate")
    return o.select(
        "o_orderkey",
        F.datediff(F.make_date(y, m, F.lit(1)), epoch).cast("long")
            .alias("month_floor_day"),
        F.unix_micros(
            F.make_timestamp_ntz(y, m, d, F.lit(12), F.lit(30), F.lit(0))
            .cast("timestamp"))
            .alias("noonish_us"),
    )
