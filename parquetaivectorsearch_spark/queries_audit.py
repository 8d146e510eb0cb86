"""Corpus-audit queries, second batch (round-9 extension of the
training-data pipeline): exact corpus-wide heavy hitters via mergeable
Misra-Gries sketches, per-domain cap sampling, PSI distribution-drift
scoring, two-sample Kolmogorov-Smirnov tests, and triangle counting /
clustering coefficients on the near-duplicate similarity graph.

The reference's analytics stop at per-document token accounting
(Program.cs:80-116); these are the corpus-LEVEL audits a curation run
needs before committing a mixture: what dominates the corpus
(heavy_hitters), is any single domain over-represented
(domain_cap_sample), did a source drift from the corpus profile
(psi_drift), do two event populations differ (ks_statistic), and how
cohesive are the near-dup clusters the dedup pass found
(graph_triangles).

Scale shapes (the 100 TB reasoning, per query):
- heavy_hitters: the naive plan shuffles one row per corpus token;
  the two-pass Misra-Gries scheme (operators/sketch.py) shuffles only
  candidate-matching tokens and its phase-1 output is bounded by
  partitions × (k+1) rows regardless of corpus size.
- domain_cap_sample: one shuffle on the domain key; the md5 ranking
  key makes the "random" cap deterministic and oracle-replayable. A
  skewed mega-domain bounds its OUTPUT at cap rows but still sorts its
  full group; the documented scale upgrade is a per-partition partial
  top-cap before the window (same trick as knn partial top-k).
- psi_drift / ks_statistic: grouped integer counting into (source ×
  bin) / (type × value) tables, then O(bins) float math — the float
  work never touches the full data, only the contingency tables.
- graph_triangles: edges come from the bounded exact-jaccard join (the
  hash-checkable twin of the MinHash candidate path); triangle closure
  uses the forward (a<b<c) orientation so each triangle is generated
  once, and the per-node aggregation is a narrow union of three id
  projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquetaivectorsearch_spark.functions import text as TX
from parquetaivectorsearch_spark.operators.sketch import heavy_hitters_exact
from parquetaivectorsearch_spark.queries import _t, register
from parquetaivectorsearch_spark.queries_curation import _DUCK_WORDS
from parquetaivectorsearch_spark.queries_text import _DUCK_NGRAMS

# ---------------------------------------------------------------------------
# Exact heavy hitters over word bigrams (two-pass Misra-Gries)
# ---------------------------------------------------------------------------

_HH_DENOM = 1000  # keep bigrams with frequency >= 1/1000 of the stream


@register("heavy_hitters", f"""
    WITH d AS (
      SELECT {_DUCK_WORDS} AS ws FROM documents
    ),
    bg AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS term
      FROM (SELECT ws FROM d WHERE len(ws) >= 2),
           unnest(generate_series(1, len(ws) - 1)) AS t(i)
    ),
    tot AS (SELECT COUNT(*) AS total FROM bg)
    SELECT term, COUNT(*) AS cnt, (SELECT total FROM tot) AS total
    FROM bg GROUP BY term
    HAVING COUNT(*) * {_HH_DENOM} >= (SELECT total FROM tot)
""")
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent word-bigrams (count ≥ 1/{denom} of the
    stream), EXACT, via the two-pass mergeable Misra-Gries operator
    (operators/sketch.py): bounded per-partition summaries → candidate
    superset (provably no false negatives) → exact count restricted to
    candidates. The oracle runs the naive full groupBy — the two plans
    must agree bit-for-bit because phase 2 is exact. Integer counts
    end-to-end. On the uniform fixture the candidate pruning is weak
    (uniform is the heavy-hitter worst case); on Zipfian corpora the
    phase-2 shuffle carries ~k keys instead of the vocabulary."""
    d = (
        _t(spark, sf_dir, "documents")
        .select(TX.words("text").alias("ws"))
        .filter(F.size("ws") >= 2)
    )
    items = d.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
            )
        ).alias("term")
    )
    return heavy_hitters_exact(items, "term", _HH_DENOM)


# ---------------------------------------------------------------------------
# Per-domain cap sampling (Common-Crawl-style over-representation control)
# ---------------------------------------------------------------------------

_DOMAIN_CAP = 10


@register("domain_cap_sample", f"""
    SELECT source, doc_id, sample_rank
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS sample_rank
      FROM documents
    )
    WHERE sample_rank <= {_DOMAIN_CAP}
""")
def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap: keep at most {cap} documents per source, chosen
    by a deterministic md5(doc_id) ranking — the standard
    over-representation control in web-crawl curation (a mega-domain
    must not dominate the mixture), made hash-replayable instead of
    rng-seeded. Scale shape: Catalyst's rank-limit pushdown plans a
    MAP-SIDE WindowGroupLimit before the exchange (the knn partial
    top-k trick, declaratively), so each input partition ships at most
    cap rows per source into the shuffle and a skewed mega-domain
    never materializes its full group on one reducer — pinned in
    tests/test_plans.py; output bounded at cap × domains."""
    w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        _t(spark, sf_dir, "documents")
        .select(
            "source",
            "doc_id",
            F.md5(F.col("doc_id").cast("string")).alias("sample_key"),
        )
        .withColumn("sample_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("sample_rank") <= _DOMAIN_CAP)
        .select("source", "doc_id", "sample_rank")
    )


# ---------------------------------------------------------------------------
# PSI drift: per-source length-distribution drift vs the corpus profile
# ---------------------------------------------------------------------------

_PSI_BIN = 64  # n_chars bucket width; fixture spans 48..553 → ~9 bins


@register("psi_drift", f"""
    WITH b AS (SELECT source, n_chars // {_PSI_BIN} AS bin FROM documents),
    g AS (SELECT bin, COUNT(*) AS gc FROM b GROUP BY bin),
    s AS (SELECT source, COUNT(*) AS n_s FROM b GROUP BY source),
    t AS (SELECT (SELECT COUNT(*) FROM b) AS n, (SELECT COUNT(*) FROM g) AS nb),
    sb AS (SELECT source, bin, COUNT(*) AS sc FROM b GROUP BY source, bin),
    dom AS (
      SELECT s.source, s.n_s, g.bin, g.gc, COALESCE(sb.sc, 0) AS sc
      FROM s CROSS JOIN g
      LEFT JOIN sb ON sb.source = s.source AND sb.bin = g.bin
    ),
    terms AS (
      SELECT source, n_s,
             ROUND(((sc + 1.0) / (n_s + t.nb) - (gc + 1.0) / (t.n + t.nb))
                   * ln(((sc + 1.0) / (n_s + t.nb))
                        / ((gc + 1.0) / (t.n + t.nb))), 9) AS term
      FROM dom CROSS JOIN t
    )
    SELECT source, CAST(n_s AS BIGINT) AS n_docs,
           ROUND(SUM(term), 6) AS psi
    FROM terms GROUP BY source, n_s
""")
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of each source's document-length
    distribution against the whole-corpus profile — the standard drift
    score (PSI = Σ (p−q)·ln(p/q), Laplace-smoothed over the global bin
    domain; > 0.2 is the conventional "significant drift" flag). Bins
    are INTEGER n_chars DIV {bin}, so binning can never ulp-flip; the
    only float math is over the (source × bin) contingency table, with
    each term pre-rounded to 9 dp so both engines sum identical doubles
    (the dsir_weights discipline). At 100 TB: two grouped counts over
    the corpus, then O(sources × bins) arithmetic on broadcast
    tables."""
    b = _t(spark, sf_dir, "documents").select(
        "source", F.expr(f"n_chars DIV {_PSI_BIN}").alias("bin")
    )
    g = b.groupBy("bin").agg(F.count("*").alias("gc"))
    s = b.groupBy("source").agg(F.count("*").alias("n_s"))
    t = g.agg(F.sum("gc").alias("n"), F.count("*").alias("nb"))
    sb = b.groupBy("source", "bin").agg(F.count("*").alias("sc"))
    dom = (
        s.crossJoin(F.broadcast(g))
        .join(sb, ["source", "bin"], "left")
        .select(
            "source", "n_s", "bin", "gc",
            F.coalesce(F.col("sc"), F.lit(0)).alias("sc"),
        )
    )
    p = (F.col("sc") + 1.0) / (F.col("n_s") + F.col("nb"))
    q = (F.col("gc") + 1.0) / (F.col("n") + F.col("nb"))
    terms = dom.crossJoin(F.broadcast(t)).select(
        "source", "n_s", F.round((p - q) * F.log(p / q), 9).alias("term")
    )
    return terms.groupBy("source", "n_s").agg(
        F.round(F.sum("term"), 6).alias("psi")
    ).select(
        "source", F.col("n_s").cast("bigint").alias("n_docs"), "psi"
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test (event value distributions)
# ---------------------------------------------------------------------------

_KS_REF = "view"


@register("ks_statistic", f"""
    WITH o AS (SELECT event_type, value FROM events
               WHERE event_type <> '{_KS_REF}'),
    r AS (SELECT value FROM events WHERE event_type = '{_KS_REF}'),
    ty AS (SELECT DISTINCT event_type FROM o),
    u AS (
      SELECT event_type, value, 1 AS a, 0 AS rf FROM o
      UNION ALL
      SELECT ty.event_type, r.value, 0, 1 FROM ty CROSS JOIN r
    ),
    grid AS (SELECT event_type, value, SUM(a) AS ca, SUM(rf) AS cr
             FROM u GROUP BY event_type, value),
    c AS (
      SELECT event_type, value,
             SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cum_a,
             SUM(cr) OVER (PARTITION BY event_type ORDER BY value) AS cum_r
      FROM grid
    ),
    t AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS n,
                 CAST(SUM(cr) AS BIGINT) AS n_ref
          FROM grid GROUP BY event_type)
    SELECT c.event_type, t.n, t.n_ref,
           ROUND(MAX(ABS(cum_a * 1.0 / t.n - cum_r * 1.0 / t.n_ref)), 6)
             AS ks_d
    FROM c JOIN t ON c.event_type = t.event_type
    GROUP BY c.event_type, t.n, t.n_ref
""")
def q_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic of each event type's
    value distribution against the '{ref}' reference population:
    D = max over observed values of |F_type(v) − F_ref(v)| — the
    assumption-free "did these two populations drift apart" audit (the
    split-quality twin of psi_drift, for continuous features). Both
    empirical CDFs are evaluated on the merged distinct-value grid via
    one cumulative window per type, so ties are handled exactly; CDF
    values are ratios of integer counts (deterministic IEEE division)
    and only the final max is rounded. At 100 TB the grid is one
    grouped count plus a per-type window — value-distinct rows, not raw
    events, flow through the window."""
    e = _t(spark, sf_dir, "events").select("event_type", "value")
    o = e.filter(F.col("event_type") != _KS_REF)
    r = e.filter(F.col("event_type") == _KS_REF).select("value")
    ty = o.select("event_type").distinct()
    u = o.select(
        "event_type", "value", F.lit(1).alias("a"), F.lit(0).alias("rf")
    ).unionByName(
        ty.crossJoin(r).select(
            "event_type", "value", F.lit(0).alias("a"), F.lit(1).alias("rf")
        )
    )
    grid = u.groupBy("event_type", "value").agg(
        F.sum("a").alias("ca"), F.sum("rf").alias("cr")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = grid.select(
        "event_type",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cr").over(w).alias("cum_r"),
    )
    t = grid.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("n"),
        F.sum("cr").cast("bigint").alias("n_ref"),
    )
    d = F.abs(
        F.col("cum_a") * 1.0 / F.col("n") - F.col("cum_r") * 1.0 / F.col("n_ref")
    )
    return (
        c.join(F.broadcast(t), "event_type")
        .groupBy("event_type", "n", "n_ref")
        .agg(F.round(F.max(d), 6).alias("ks_d"))
    )


# ---------------------------------------------------------------------------
# Triangle count / clustering coefficient on the similarity graph
# ---------------------------------------------------------------------------

_TRI_TAU = 0.5
_TRI_MAX_ID = 150  # same bounded id range as ngram_jaccard_pairs


@register("graph_triangles", f"""
    WITH d AS (
      SELECT doc_id,
             {_DUCK_NGRAMS.format(t="text", n=3, n_minus_1=2)} AS g
      FROM documents WHERE doc_id < {_TRI_MAX_ID}
    ),
    e AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM d a, d b
      WHERE a.doc_id < b.doc_id
        AND CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / len(list_distinct(a.g || b.g)) >= {_TRI_TAU}
    ),
    tri AS (
      SELECT e1.da AS a, e1.db AS b, e2.db AS c
      FROM e e1
      JOIN e e2 ON e2.da = e1.db
      JOIN e e3 ON e3.da = e1.da AND e3.db = e2.db
    ),
    deg AS (
      SELECT node, COUNT(*) AS degree
      FROM (SELECT da AS node FROM e UNION ALL SELECT db FROM e)
      GROUP BY node
    ),
    tcnt AS (
      SELECT node, COUNT(*) AS tri_cnt
      FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
      GROUP BY node
    )
    SELECT deg.node AS doc_id, deg.degree,
           COALESCE(tcnt.tri_cnt, 0) AS tri_cnt,
           CASE WHEN deg.degree >= 2
                THEN ROUND(2.0 * COALESCE(tcnt.tri_cnt, 0)
                           / (deg.degree * (deg.degree - 1)), 6)
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN tcnt ON tcnt.node = deg.node
""")
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle count and local clustering coefficient on the
    exact-jaccard near-duplicate graph (same bounded id range and
    threshold family as ngram_jaccard_pairs) — the cluster-cohesion
    audit for dedup output: a near-dup component whose clustering is
    ~1 is a true duplicate clique (safe to keep one representative); a
    low-clustering star is chained false positives (transitive-closure
    over-merging). Edges are oriented a<b and triangles closed as
    a<b<c, so each triangle is generated exactly once; the closing
    edge set broadcasts (it is candidate-pair-sized, not corpus-sized).
    Counts are integers; the coefficient is one rounded division."""
    # r15 (guide §2.3): code-point-packed gram arrays + the exact
    # integer J ≥ tau=0.5 gate — one primitive array_intersect per
    # candidate pair, identical edge set (see ngram_jaccard_pairs)
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _TRI_MAX_ID)
        .select("doc_id", TX.char_ngram_codes("text", 3).alias("g"))
    )
    a = d.select(F.col("doc_id").alias("da"), F.col("g").alias("ga"))
    b = d.select(F.col("doc_id").alias("db"), F.col("g").alias("gb"))
    e = (
        a.join(b, (F.col("da") < F.col("db"))
               # J >= tau=0.5 forces 2*min >= max (r14, guide §3.2)
               & (F.least(F.size("ga"), F.size("gb")) * 2
                  >= F.greatest(F.size("ga"), F.size("gb")))
               & TX.jaccard_gate_half("ga", "gb"))
        .select("da", "db")
        .localCheckpoint(eager=False)
    )
    wedges = (
        e.select(F.col("da").alias("a"), F.col("db").alias("b"))
        .join(
            e.select(F.col("da").alias("b"), F.col("db").alias("c")), "b"
        )
        .select("a", "b", "c")
    )
    tri = wedges.join(
        F.broadcast(e.select(F.col("da").alias("a"), F.col("db").alias("c"))),
        ["a", "c"],
    )
    deg = (
        e.select(F.col("da").alias("node"))
        .unionByName(e.select(F.col("db").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    tcnt = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("tri_cnt"))
    )
    out = deg.join(tcnt, "node", "left").select(
        F.col("node").alias("doc_id"),
        "degree",
        F.coalesce(F.col("tri_cnt"), F.lit(0).cast("bigint")).alias("tri_cnt"),
    )
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            F.lit(2.0) * F.col("tri_cnt")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return out.withColumn("clustering", coeff)


@register("blocklist_scan", f"""
    WITH d AS (
      SELECT {_DUCK_WORDS} AS ws FROM documents
    ),
    bg AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS pat
      FROM (SELECT ws FROM d WHERE len(ws) >= 2),
           unnest(generate_series(1, len(ws) - 1)) AS t(i)
    ),
    top AS (
      SELECT pat FROM bg GROUP BY pat
      ORDER BY COUNT(*) DESC, pat LIMIT 20
    )
    SELECT doc.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pats
    FROM documents doc JOIN top p ON contains(doc.text, p.pat)
    GROUP BY doc.doc_id
""")
def q_blocklist_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-pattern phrase-blocklist scan — the banned-phrase /
    contamination-stoplist filter of a curation pipeline: how many of
    the top-20 corpus bigram phrases does each doc CONTAIN (substring
    semantics, not tokenized — catches phrases that cross the
    tokenizer's splits). The blocklist derives deterministically from
    the corpus (count desc, phrase tiebreak) and collects as 20 strings
    (bounded driver pull, the heavy_hitters phase-collect shape); the
    scan is then ONE narrow Catalyst pass — a codegen'd sum of
    instr() > 0 over the broadcast literals, zero joins, zero Python,
    zero explode. The oracle pays a |docs|×|patterns| contains() join
    instead; at 10k+ patterns the engine side would swap instr chains
    for an Aho-Corasick automaton in an Arrow closure (documented, not
    needed at blocklist sizes the fixture exercises)."""
    d = (
        _t(spark, sf_dir, "documents")
        .select(TX.words("text").alias("ws"))
        .filter(F.size("ws") >= 2)
    )
    top = (
        d.select(F.explode(F.expr(
            "transform(sequence(1, size(ws) - 1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
        )).alias("pat"))
        .groupBy("pat").count()
        .orderBy(F.desc("count"), "pat").limit(20)
    )
    pats = [r.pat for r in top.collect()]  # bounded: exactly 20 strings
    # seed with 0 so an EMPTY blocklist (no doc has >= 2 words) degrades
    # to an empty result instead of None.cast() (ADVICE r10)
    hits = F.lit(0)
    for p in pats:
        hits = hits + F.when(F.instr(F.col("text"), F.lit(p)) > 0,
                             1).otherwise(0)
    return (_t(spark, sf_dir, "documents")
            .select("doc_id", hits.cast("bigint").alias("n_pats"))
            .filter(F.col("n_pats") > 0))


# ---------------------------------------------------------------------------
# KMV set-operation estimates — the sketch answer to source-overlap audits
# ---------------------------------------------------------------------------

_KMV_K = 256
_KMV_N = 8  # shingle width, matches the novelty audit's 8-char unit
_KMV_HMAX = float(1 << 60)  # 15 hex chars of md5 → uniform on [0, 2^60)


@register("kmv_set_ops", f"""
    WITH d AS (SELECT source, text FROM documents WHERE length(text) >= {_KMV_N}),
    v AS (
      SELECT DISTINCT source, substring(text, CAST(i AS INTEGER), {_KMV_N}) AS sh
      FROM d, unnest(generate_series(1, length(text) - {_KMV_N - 1})) s(i)
    ),
    hv AS (
      SELECT source, sh,
             CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS h
      FROM v
    ),
    sk AS (
      SELECT source, sh, h FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY h, sh) AS rn
        FROM hv) t WHERE rn <= {_KMV_K}
    ),
    srcs AS (SELECT DISTINCT source FROM v),
    pairs AS (SELECT a.source AS sa, b.source AS sb
              FROM srcs a JOIN srcs b ON a.source < b.source),
    pr AS (
      SELECT p.sa, p.sb, s.sh, s.h,
             MAX(CASE WHEN s.source = p.sa THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN s.source = p.sb THEN 1 ELSE 0 END) AS in_b
      FROM pairs p JOIN sk s ON s.source IN (p.sa, p.sb)
      GROUP BY p.sa, p.sb, s.sh, s.h
    ),
    kv AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY sa, sb
                                     ORDER BY h, sh) AS rn
        FROM pr) t WHERE rn <= {_KMV_K}
    ),
    est AS (
      SELECT sa, sb,
             MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS hk,
             COUNT(*) AS n_kv,
             SUM(in_a * in_b) AS matches
      FROM kv GROUP BY sa, sb
    ),
    cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY source),
    ex AS (
      SELECT a.source AS sa, b.source AS sb,
             CAST(COUNT(*) AS BIGINT) AS exact_inter
      FROM hv a JOIN hv b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT e.sa AS src_a, e.sb AS src_b,
           ca.n AS exact_a, cb.n AS exact_b,
           COALESCE(x.exact_inter, 0) AS exact_inter,
           ca.n + cb.n - COALESCE(x.exact_inter, 0) AS exact_union,
           ROUND(CASE WHEN e.n_kv < {_KMV_K} THEN CAST(e.n_kv AS DOUBLE)
                      ELSE ({_KMV_K - 1}.0 * {_KMV_HMAX!r}) / e.hk END, 6)
             AS union_est,
           ROUND(CAST(e.matches AS DOUBLE) / e.n_kv, 6) AS jaccard_est,
           ROUND((CAST(e.matches AS DOUBLE) / e.n_kv)
                 * (CASE WHEN e.n_kv < {_KMV_K} THEN CAST(e.n_kv AS DOUBLE)
                         ELSE ({_KMV_K - 1}.0 * {_KMV_HMAX!r}) / e.hk END), 6)
             AS inter_est
    FROM est e
    JOIN cnt ca ON ca.source = e.sa
    JOIN cnt cb ON cb.source = e.sb
    LEFT JOIN ex x ON x.sa = e.sa AND x.sb = e.sb
""")
def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-value synopses with set operations
    (Beyer, Haas, Reinwald, Sismanis & Gemulla, SIGMOD 2007): per-source
    {_KMV_N}-char-shingle sets summarized by their {_KMV_K} smallest
    hashes; for every source pair the MERGED bottom-k (bottom-k of the
    two sketches' union — the same lossless merge rule as
    quantile_sketch) yields |A∪B| ≈ (k−1)·H/h₍k₎ and Jaccard ≈ the
    fraction of merged-sketch members present in BOTH sketches, hence
    |A∩B| by product — the sketch answer to 'how much do these two crawl
    sources overlap?' that never joins the raw shingle streams. The hash
    is md5's first 15 hex digits as a 60-bit integer — one expression,
    bit-identical in Spark (conv) and DuckDB ('0x'||…cast), so the
    oracle rebuilds every sketch and every estimate exactly. Exact
    counts ride along as audit columns (the |v|⋈|v| intersection join is
    the cost the sketch REPLACES at scale — it is here so the output
    self-certifies the error, same posture as quantile_sketch's rank
    audit; ≤25%-per-pair accuracy at k={_KMV_K} is test-pinned). Plan
    shape: per-source sketches are static-rank WindowGroupLimit prunes;
    the pair stage touches only {_KMV_K}-row sketches (never raw data),
    so at 100 TB the estimate pipeline is one narrow pass + sketch-sized
    joins."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.length("text") >= _KMV_N).select("source", "text"))
    # NB (r14 measured negatives, kept for the record): neither a
    # per-doc array_distinct pre-thin (12-char fixture shingles are
    # almost all unique within a doc — pure per-row overhead) nor
    # shingling inside the generator (whole-stage codegen pipelines
    # Generate+Project, so the "carried" text column is a pointer in
    # generated code, not a per-row copy, while the transform array
    # form pays a real per-doc allocation) beat this original shape.
    v = (d.select(
            "source",
            F.explode(F.sequence(F.lit(1),
                                 F.length("text") - (_KMV_N - 1))).alias("i"),
            "text")
         .select("source", F.expr(f"substring(text, i, {_KMV_N})").alias("sh"))
         .distinct())
    # checkpoint WITH the hash: one md5 pass serves the sketches, the
    # counts, and the exact-intersect join (r14; the r13 form
    # checkpointed pre-hash and recomputed md5 per consumer). The exact
    # join keys on the 60-bit md5 PREFIX instead of the 8-char shingle
    # string (the kmv conv trick the sketch itself already uses):
    # identical grouping — same content => same md5 => same prefix;
    # cross-content prefix collisions are 2^-60 and REPLAYED IDENTICALLY
    # by the oracle's matching h-join, so parity is exact regardless —
    # with 8-byte join keys (r14, guide SS2.3; same precedent as
    # substring_dup_pairs' r12 change).
    hv = (v.select("source", "sh",
                   F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10)
                   .cast("bigint").alias("h"))
          .localCheckpoint(eager=False))
    wsrc = Window.partitionBy("source").orderBy("h", "sh")
    sk = (hv.withColumn("rn", F.row_number().over(wsrc))
          .filter(F.col("rn") <= _KMV_K).drop("rn"))
    srcs = hv.select("source").distinct()
    pairs = (srcs.select(F.col("source").alias("sa"))
             .join(srcs.select(F.col("source").alias("sb")),
                   F.col("sa") < F.col("sb")))
    pr = (sk.join(F.broadcast(pairs),
                  (F.col("source") == F.col("sa"))
                  | (F.col("source") == F.col("sb")))
          .groupBy("sa", "sb", "sh", "h")
          .agg(F.max(F.when(F.col("source") == F.col("sa"), 1).otherwise(0))
               .alias("in_a"),
               F.max(F.when(F.col("source") == F.col("sb"), 1).otherwise(0))
               .alias("in_b")))
    wpair = Window.partitionBy("sa", "sb").orderBy("h", "sh")
    kv = (pr.withColumn("rn", F.row_number().over(wpair))
          .filter(F.col("rn") <= _KMV_K))
    est = (kv.groupBy("sa", "sb")
           .agg(F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
                F.count("*").alias("n_kv"),
                F.sum(F.col("in_a") * F.col("in_b")).alias("matches")))
    cnt = hv.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    ex = (hv.alias("a").join(hv.alias("b"),
                             (F.col("a.h") == F.col("b.h"))
                             & (F.col("a.source") < F.col("b.source")))
          .groupBy(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
          .agg(F.count("*").cast("bigint").alias("exact_inter")))
    u_raw = F.when(F.col("n_kv") < _KMV_K, F.col("n_kv").cast("double")) \
        .otherwise(F.lit(float(_KMV_K - 1) * _KMV_HMAX) / F.col("hk"))
    j_raw = F.col("matches").cast("double") / F.col("n_kv")
    return (est
            .join(F.broadcast(cnt.select(F.col("source").alias("sa"),
                                         F.col("n").alias("exact_a"))), "sa")
            .join(F.broadcast(cnt.select(F.col("source").alias("sb"),
                                         F.col("n").alias("exact_b"))), "sb")
            .join(ex, ["sa", "sb"], "left")
            .select(F.col("sa").alias("src_a"), F.col("sb").alias("src_b"),
                    "exact_a", "exact_b",
                    F.coalesce("exact_inter", F.lit(0)).cast("bigint")
                    .alias("exact_inter"),
                    (F.col("exact_a") + F.col("exact_b")
                     - F.coalesce("exact_inter", F.lit(0))).cast("bigint")
                    .alias("exact_union"),
                    F.round(u_raw, 6).alias("union_est"),
                    F.round(j_raw, 6).alias("jaccard_est"),
                    F.round(j_raw * u_raw, 6).alias("inter_est")))
