"""Corpus-curation audit queries (round-9 extension of the north-star
training-data pipeline): Gopher-style quality-rule flags, DSIR
hashed-feature importance weights, tokenizer fertility accounting, an
inverted-index build, an n-gram novelty (memorization) audit, and
embedding outlier detection.

The reference stops at token counting and per-corpus cost (Program.cs:
80-116); a curation pipeline additionally has to DECIDE which documents
enter the mixture. These six operators are the decision layer: rule
filters (Gopher, Rae et al. 2021), distribution matching (DSIR, Xie et
al. 2023), tokenizer-efficiency accounting, retrieval structures, and
two novelty/outlier audits. All are exact integer / fixed-order IEEE
arithmetic → every one is DuckDB-oracle-checkable.

Scale notes (the shapes that survive 100 TB):
- every per-doc metric is one projection over exploded words — narrow
  shuffle keys, map-side combine on (bucket)/(term)/(shingle);
- DSIR's model tables are 64 rows → broadcast back to the word stream;
  no second pass over text;
- the inverted index bounds its postings payload (first 20 ids) so a
  stop-word term cannot produce a gigabyte row;
- embedding outliers reuse the centroid_per_label long-format agg and a
  broadcast join — never a per-group vector materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquetaivectorsearch_spark.functions import text as TX
from parquetaivectorsearch_spark.queries import _t, register
from parquetaivectorsearch_spark.queries_text import _STOPWORDS, _count_in

_DUCK_WORDS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w <> '')"
_STOP_IN = ", ".join(f"'{s}'" for s in _STOPWORDS)

# ---------------------------------------------------------------------------
# Gopher-style rule filter (Rae et al. 2021, appendix A1.1 — public)
# ---------------------------------------------------------------------------

@register("gopher_rules", f"""
    WITH m AS (
      SELECT doc_id, len(ws) AS n_words,
             ROUND(list_sum(list_transform(ws, w -> length(w))) * 1.0
                   / len(ws), 6) AS mean_word_len,
             ROUND(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                   * 1.0 / len(ws), 6) AS frac_alpha,
             len(list_filter(ws, w -> w IN ({_STOP_IN}))) AS stop_hits
      FROM (SELECT doc_id, {_DUCK_WORDS} AS ws FROM documents)
      WHERE len(ws) > 0
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
           frac_alpha, CAST(stop_hits AS BIGINT) AS stop_hits,
           CAST(CASE WHEN n_words BETWEEN 20 AND 100000
                      AND mean_word_len BETWEEN 3 AND 10
                      AND frac_alpha >= 0.8
                      AND stop_hits >= 2 THEN 1 ELSE 0 END AS INTEGER)
             AS pass_gopher
    FROM m
""")
def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule flags (word-count bounds, mean word length 3-10,
    ≥80% alphabetic words, ≥2 stopword hits) + the conjunction as a 0/1
    keep flag. One projection over the word array with in-order integer
    folds — no shuffle at all; the 100 TB shape is a pure map stage.
    Thresholds compare the ROUNDED ratios so both engines gate on
    identical doubles."""
    d = _t(spark, sf_dir, "documents")
    ws = TX.words("text")
    n_words = F.size(ws)
    sum_len = F.aggregate(ws, F.lit(0), lambda a, w: a + F.length(w))
    alpha_hits = F.aggregate(
        ws, F.lit(0), lambda a, w: a + F.when(w.rlike("[a-z]"), 1).otherwise(0)
    )
    m = d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(sum_len.cast("double") / n_words, 6).alias("mean_word_len"),
        F.round(alpha_hits.cast("double") / n_words, 6).alias("frac_alpha"),
        _count_in(ws, _STOPWORDS).cast("bigint").alias("stop_hits"),
    ).filter(F.col("n_words") > 0)
    return m.withColumn(
        "pass_gopher",
        (
            F.col("n_words").between(20, 100000)
            & F.col("mean_word_len").between(3, 10)
            & (F.col("frac_alpha") >= 0.8)
            & (F.col("stop_hits") >= 2)
        ).cast("int"),
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023 — hashed n-gram features)
# ---------------------------------------------------------------------------

_DSIR_B = 64  # feature buckets; the published method uses 10k over bigrams

_DSIR_BUCKET_SQL = (
    "(length(word) * 131 + ascii(substr(word, 1, 1)) * 31"
    " + ascii(substr(word, length(word), 1))) % 64"
)


@register("dsir_weights", f"""
    WITH w AS (
      SELECT doc_id, lang, unnest({_DUCK_WORDS}) AS word FROM documents
    ),
    b AS (SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS bucket FROM w),
    raw AS (SELECT bucket, COUNT(*) AS r_cnt FROM b GROUP BY bucket),
    tgt AS (SELECT bucket, COUNT(*) AS t_cnt FROM b WHERE lang = 'en'
            GROUP BY bucket),
    tot AS (SELECT (SELECT COUNT(*) FROM b) AS r_tot,
                   (SELECT COUNT(*) FROM b WHERE lang = 'en') AS t_tot),
    ll AS (
      SELECT raw.bucket,
             ROUND(ln((COALESCE(tgt.t_cnt, 0) + 1.0) / (tot.t_tot + {_DSIR_B}))
                   - ln((raw.r_cnt + 1.0) / (tot.r_tot + {_DSIR_B})), 9) AS ll
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot
    )
    SELECT b.doc_id, COUNT(*) AS n_words,
           ROUND(SUM(ll.ll), 6) AS dsir_weight
    FROM b JOIN ll ON b.bucket = ll.bucket
    GROUP BY b.doc_id
""")
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Data Selection via Importance Resampling, Xie et al. 2023)
    per-document importance log-weights: hashed unigram features, target
    distribution = the `lang='en'` slice, raw = the whole corpus, Laplace
    smoothing. ONE combined feature-count agg over the exploded word
    stream (raw + target counts in the same 64-row pass — the word
    explode is never re-scanned), totals folded from that table, and
    the resulting 64-row log-likelihood model broadcast back; per-doc
    weight is one hash agg on doc_id. At 100 TB the bucket tables stay
    64 rows no matter the corpus — the only full-data costs are the
    explode and one shuffle on doc_id. Bucket log-likelihoods are
    pre-rounded to 9 dp so both engines sum identical doubles; final
    weight rounded to 6."""
    d = _t(spark, sf_dir, "documents")
    b = (
        d.select("doc_id", "lang", F.explode(TX.words("text")).alias("word"))
        .withColumn(
            "bucket",
            (
                F.length("word") * 131
                + F.ascii(F.substring("word", 1, 1)) * 31
                + F.ascii(F.expr("substring(word, length(word), 1)"))
            )
            % _DSIR_B,
        )
        .select("doc_id", "lang", "bucket")
    )
    counts = b.groupBy("bucket").agg(
        F.count("*").alias("r_cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t_cnt"),
    )
    tot = counts.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    ll = counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            F.log((F.col("t_cnt") + 1.0) / (F.col("t_tot") + _DSIR_B))
            - F.log((F.col("r_cnt") + 1.0) / (F.col("r_tot") + _DSIR_B)),
            9,
        ).alias("ll"),
    )
    return (
        b.join(F.broadcast(ll), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(F.sum("ll"), 6).alias("dsir_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility (pieces per word / chars per piece, by language)
# ---------------------------------------------------------------------------

_PIECE_RE = " ?[a-z]+| ?[0-9]{1,3}| ?[^ a-z0-9]+"


@register("tokenizer_fertility", f"""
    WITH m AS (
      SELECT lang,
             len(regexp_extract_all(text, '{_PIECE_RE}')) AS pieces,
             len({_DUCK_WORDS}) AS words,
             length(text) AS chars
      FROM documents
    )
    SELECT lang, CAST(SUM(pieces) AS BIGINT) AS total_pieces,
           CAST(SUM(words) AS BIGINT) AS total_words,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           ROUND(SUM(pieces) * 1.0 / SUM(words), 6) AS fertility,
           ROUND(SUM(chars) * 1.0 / SUM(pieces), 6) AS chars_per_piece
    FROM m GROUP BY lang
""")
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: BPE-ish regex pieces per
    whitespace word and chars per piece — the standard multilingual
    tokenizer-efficiency accounting (SentencePiece evaluation idiom).
    The piece split runs JVM-side via regexp_extract_all (no Python UDF,
    unlike the full BPE path in token_count) so it stays inside
    whole-stage codegen; the agg is 5 language rows. Integer sums,
    single final divisions → oracle-exact."""
    d = _t(spark, sf_dir, "documents")
    m = d.select(
        "lang",
        F.size(F.regexp_extract_all("text", F.lit(_PIECE_RE), F.lit(0))).alias("pieces"),
        F.size(TX.words("text")).alias("words"),
        F.length("text").alias("chars"),
    )
    return m.groupBy("lang").agg(
        F.sum("pieces").cast("bigint").alias("total_pieces"),
        F.sum("words").cast("bigint").alias("total_words"),
        F.sum("chars").cast("bigint").alias("total_chars"),
        F.round(F.sum("pieces") / F.sum("words"), 6).alias("fertility"),
        F.round(F.sum("chars") / F.sum("pieces"), 6).alias("chars_per_piece"),
    )


# ---------------------------------------------------------------------------
# Inverted index (term → df + bounded postings head)
# ---------------------------------------------------------------------------

@register("inverted_index", f"""
    WITH w AS (
      SELECT doc_id, unnest({_DUCK_WORDS}) AS term FROM documents
    ),
    p AS (SELECT DISTINCT doc_id, term FROM w)
    SELECT term, COUNT(*) AS df,
           array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',')
             AS postings_head
    FROM p GROUP BY term
""")
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: term → document frequency + the first 20
    postings (sorted doc_ids, comma-joined — the driver hash cannot take
    raw arrays). explode → distinct → one hash agg on term; bounding the
    postings payload keeps stop-word rows O(1) instead of O(corpus), the
    difference between an index build that works at 100 TB and one that
    OOMs on the term 'the'. Full postings would be written partitioned
    by term-range instead of returned."""
    d = _t(spark, sf_dir, "documents")
    pairs = (
        d.select(F.explode(TX.words("text")).alias("term"), "doc_id").distinct()
    )
    return pairs.groupBy("term").agg(
        F.count("*").alias("df"),
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_set("doc_id")), 1, 20)
        ).alias("postings_head"),
    )


# ---------------------------------------------------------------------------
# n-gram novelty (memorization / boilerplate audit)
# ---------------------------------------------------------------------------

_NOVEL_N = 8


@register("ngram_novelty", f"""
    WITH s AS (
      SELECT DISTINCT doc_id, substring(text, t.i, {_NOVEL_N}) AS sh
      FROM documents, unnest(generate_series(1, length(text) - {_NOVEL_N - 1}))
           AS t(i)
      WHERE length(text) >= {_NOVEL_N}
    ),
    g AS (SELECT sh, COUNT(*) AS df FROM s GROUP BY sh)
    SELECT s.doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN g.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS novel_shingles,
           ROUND(SUM(CASE WHEN g.df = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS novel_frac
    FROM s JOIN g ON s.sh = g.sh
    GROUP BY s.doc_id
""")
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document {_NOVEL_N}-char-shingle novelty: the fraction of a
    doc's distinct shingles that appear in NO other document — the
    cheap memorization/boilerplate audit (low novelty ⇒ the doc is
    assembled from corpus-common fragments). Same explode machinery as
    dedup_substring. JOIN-FREE attribution (r10 rewrite; r9 shipped the
    full per-doc shingle stream through a second shingle-keyed shuffle
    just to mark df==1 rows): a df==1 shingle belongs to exactly ONE
    doc, so the shingle-keyed agg carries min(doc_id) alongside df and
    the unique-holder rows reduce straight to per-doc novel counts —
    the |corpus-shingles| join-back becomes a doc-keyed join of two
    |docs|-row aggregates. Exact integers until one final division."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") >= _NOVEL_N)
    # Shingle INSIDE the generator and dedupe INSIDE the doc (r14, guide
    # §2.3/§2.4): the r13 form exploded bare positions and substring'd
    # after, so Generate carried the full text column on every position
    # row (~300 B × one row per corpus char), and per-doc distinctness
    # was re-derived by a corpus-wide (doc_id, sh) hash-aggregate +
    # exchange. array_distinct(transform(...)) IS the per-doc distinct
    # set — (doc_id, sh) rows are unique by construction once doc_id is
    # fixed per array — so the distinct agg disappears outright and
    # n_shingles collapses to size(arr), a projection instead of an
    # aggregation. Same rows, same values, one fewer shuffle.
    arr = d.select(
        "doc_id",
        F.array_distinct(F.expr(
            f"transform(sequence(1, length(text) - {_NOVEL_N - 1}),"
            f" i -> substring(text, i, {_NOVEL_N}))")).alias("arr"))
    # lazy checkpoint: arr feeds both the explode and the totals
    # projection — without it the shingling computes once per consumer
    # (measured +2.4s, the one regression of the first cut)
    arr = arr.localCheckpoint(eager=False)
    sh = arr.select("doc_id", F.explode("arr").alias("sh"))
    totals = arr.select("doc_id", F.size("arr").cast("long").alias("n_shingles"))
    novel = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"), F.min("doc_id").alias("holder"))
        .filter(F.col("df") == 1)
        .groupBy(F.col("holder").alias("doc_id"))
        .agg(F.count("*").cast("bigint").alias("novel_shingles"))
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("novel_shingles", F.lit(0)).cast("bigint")
            .alias("novel_shingles"),
            F.round(
                F.coalesce("novel_shingles", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("novel_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding outlier detection (distance-to-centroid z-score per label)
# ---------------------------------------------------------------------------

@register("embedding_outlier", """
    WITH cent AS (
      SELECT label, CAST(t.i AS INTEGER) AS i, ROUND(AVG(em[t.i]), 6) AS c
      FROM (SELECT label, embedding AS em FROM embeddings) d,
           unnest(generate_series(1, len(em))) AS t(i)
      GROUP BY label, t.i
    ),
    dist AS (
      SELECT e.vec_id, e.label,
             ROUND(sqrt(SUM((e.embedding[cent.i] - cent.c)
                            * (e.embedding[cent.i] - cent.c))), 6) AS dist
      FROM embeddings e JOIN cent ON e.label = cent.label
      GROUP BY e.vec_id, e.label
    ),
    st AS (
      SELECT label, ROUND(AVG(dist), 6) AS mu,
             ROUND(stddev_pop(dist), 6) AS sigma
      FROM dist GROUP BY label
    )
    SELECT dist.vec_id, dist.label, dist.dist,
           ROUND((dist.dist - st.mu) / st.sigma, 4) AS z,
           CAST(CASE WHEN (dist.dist - st.mu) / st.sigma > 2.0
                THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
    FROM dist JOIN st ON dist.label = st.label
""")
def q_embedding_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier audit: per-label centroid (long-format agg, the
    centroid_per_label shape), per-vector euclidean distance to its own
    centroid via an in-order zip_with fold, then a per-label z-score; z >
    2 flags the vector. The curation use: mislabeled / corrupted vectors
    before index build. Centroids and distances are rounded to 6 dp
    BEFORE the z-score so both engines divide identical doubles; the
    centroid table (n_labels × dim) broadcasts."""
    e = _t(spark, sf_dir, "embeddings")
    cent_long = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )
    cent = cent_long.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
        ).alias("centroid")
    )
    dist = e.join(F.broadcast(cent), "label").select(
        "vec_id",
        "label",
        F.round(
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        "embedding", "centroid", lambda v, c: (v - c) * (v - c)
                    ),
                    F.lit(0.0).cast("double"),
                    lambda a, x: a + x,
                )
            ),
            6,
        ).alias("dist"),
    )
    st = dist.groupBy("label").agg(
        F.round(F.avg("dist"), 6).alias("mu"),
        F.round(F.stddev_pop("dist"), 6).alias("sigma"),
    )
    z = (F.col("dist") - F.col("mu")) / F.col("sigma")
    return (
        dist.join(F.broadcast(st), "label")
        .select(
            "vec_id",
            "label",
            "dist",
            F.round(z, 4).alias("z"),
            (z > 2.0).cast("int").alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# exact suffix array (prefix doubling) — the Lee et al. 2022 dedup index
# ---------------------------------------------------------------------------

@register("suffix_array_rank", """
    WITH d16 AS (
      SELECT doc_id, substr(text, 1, 256) AS t FROM documents
      WHERE lang = 'en' ORDER BY doc_id LIMIT 16
    ),
    s AS (SELECT string_agg(t || chr(1), '' ORDER BY doc_id) AS shard
          FROM d16),
    p AS (SELECT unnest(generate_series(
            1, length((SELECT shard FROM s)))) AS pos),
    suf AS (SELECT pos, substr((SELECT shard FROM s), pos) AS sfx FROM p)
    SELECT CAST(pos AS BIGINT) AS pos,
           CAST(row_number() OVER (ORDER BY sfx) AS BIGINT) AS rank
    FROM suf
""")
def q_suffix_array_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT suffix array over a corpus shard by distributed prefix
    doubling (operators/suffix.py, Manber-Myers) — the index Lee et al.
    2022 build for exact substring dedup; the engine's winnowing path is
    the probabilistic tier, this is the exact tier. 16 en docs
    (truncated to 256 chars, each terminated by the \\x01 sentinel)
    concatenate into one shard; the operator never sees the string as a
    whole — it gets (pos, char) rows and runs ⌈log₂ n⌉ rounds of
    pair-join + range-partitioned two-phase dense rank (terasort shape;
    per-round driver traffic is P partition-distinct counts, never
    rows). The oracle sorts the n suffixes directly — O(n²)-ish in
    DuckDB but exact, so the hash gate checks every rank of a ~4k-suffix
    array against an independent construction."""
    from parquetaivectorsearch_spark.operators.suffix import suffix_array

    return suffix_array(_shard_chars(spark, sf_dir), parts=8)


def _offsets_from(d: DataFrame) -> DataFrame:
    """(doc_id, t) → (doc_id, t, off, ln): ln counts the terminating
    \x01 sentinel, off is the prefix-sum global offset over the
    doc_id-ordered concatenation (a handful of shard rows — the
    single-partition window is fine)."""
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
    return d.select(
        "doc_id", "t",
        F.coalesce(F.sum(F.length("t") + 1).over(w), F.lit(0)).alias("off"),
        (F.length("t") + 1).alias("ln"))


def _chars_from(offsets: DataFrame) -> DataFrame:
    """offsets frame → (pos, ch) rows for the sentinel-terminated
    shard — the suffix-array input."""
    return offsets.select(
        "off",
        F.posexplode(F.expr(
            "transform(sequence(1, length(t) + 1),"
            " i -> substring(concat(t, chr(1)), i, 1))")).alias("i", "ch")
    ).select((F.col("off") + F.col("i") + 1).alias("pos"), "ch")


def _shard_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, t, off, ln) for the 16-doc en shard: docs truncated to
    256 chars."""
    return _offsets_from(
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang") == "en")
        .orderBy("doc_id").limit(16)
        .select("doc_id", F.substring("text", 1, 256).alias("t")))


def _shard_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pos, ch) rows for the sentinel-terminated shard of
    ``_shard_offsets``."""
    return _chars_from(_shard_offsets(spark, sf_dir))


@register("longest_repeated_substring", """
    WITH d16 AS (
      SELECT doc_id, substr(text, 1, 256) AS t FROM documents
      WHERE lang = 'en' ORDER BY doc_id LIMIT 16
    ),
    s AS (SELECT string_agg(t || chr(1), '' ORDER BY doc_id) AS shard
          FROM d16),
    p AS (SELECT unnest(generate_series(
            1, length((SELECT shard FROM s)))) AS pos),
    suf AS (SELECT pos, substr((SELECT shard FROM s), pos) AS sfx FROM p),
    r AS (SELECT pos, sfx, row_number() OVER (ORDER BY sfx) AS rk FROM suf),
    adj AS (SELECT a.pos AS pos_a, b.pos AS pos_b, a.sfx AS sa, b.sfx AS sb
            FROM r a JOIN r b ON b.rk = a.rk + 1),
    ks AS (SELECT unnest(generate_series(1, 512)) AS k),
    l AS (SELECT pos_a, pos_b,
            COALESCE(MAX(CASE WHEN substr(sa, 1, k) = substr(sb, 1, k)
                          THEN k END), 0) AS lcp
          FROM adj CROSS JOIN ks
          WHERE k <= LEAST(length(sa), length(sb))
          GROUP BY pos_a, pos_b)
    SELECT CAST(pos_a AS BIGINT) AS pos_a, CAST(pos_b AS BIGINT) AS pos_b,
           CAST(lcp AS BIGINT) AS lcp
    FROM l ORDER BY lcp DESC, pos_a LIMIT 10
""")
def q_longest_repeated_substring(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Longest repeated substrings via the suffix-array LCP array — the
    exact form of the question every dedup heuristic approximates
    (Lee et al. 2022 dedup any ≥50-token repeat; THIS operator finds the
    true maximal repeats). The LRS always occurs between RANK-ADJACENT
    suffixes, so the answer is a top-k over the (n−1)-row LCP array. LCP
    comes from the sparse-table walk over the prefix-doubling levels the
    SA construction already produced (operators/suffix.lcp_adjacent):
    O(log n) equi-joins, never a per-character loop. The oracle computes
    every adjacent LCP by direct bounded prefix comparison in DuckDB —
    an independent construction, hash-checked on all 10 rows."""
    from parquetaivectorsearch_spark.operators.suffix import (
        lcp_adjacent, suffix_array_rounds)

    sa, rounds = suffix_array_rounds(_shard_chars(spark, sf_dir), parts=8)
    lcp = lcp_adjacent(sa, rounds, max_lcp=512)
    # LCP reported capped at 512 (both engines): "repeat of length >= 512"
    # is the answer past the cap; a correlated-series exact oracle is not
    # expressible in DuckDB, and the audit question is unchanged
    return (lcp.select("pos_a", "pos_b",
                       F.least(F.col("lcp"), F.lit(512)).cast("bigint")
                       .alias("lcp"))
            .orderBy(F.desc("lcp"), "pos_a").limit(10))


_SA_ORACLE_PRELUDE = """
    WITH d16 AS (
      SELECT doc_id, substr(text, 1, 256) AS t FROM documents
      WHERE lang = 'en' ORDER BY doc_id LIMIT 16
    ),
    s AS (SELECT string_agg(t || chr(1), '' ORDER BY doc_id) AS shard
          FROM d16),
    p AS (SELECT unnest(generate_series(
            1, length((SELECT shard FROM s)))) AS pos),
    suf AS (SELECT pos, substr((SELECT shard FROM s), pos) AS sfx FROM p),
    r AS (SELECT pos, sfx, row_number() OVER (ORDER BY sfx) AS rk FROM suf),
    adj AS (SELECT a.pos AS pos_a, b.pos AS pos_b, a.sfx AS sa, b.sfx AS sb
            FROM r a JOIN r b ON b.rk = a.rk + 1),
    ks AS (SELECT unnest(generate_series(1, 512)) AS k),
    l AS (SELECT pos_a, pos_b,
            COALESCE(MAX(CASE WHEN substr(sa, 1, k) = substr(sb, 1, k)
                          THEN k END), 0) AS lcp
          FROM adj CROSS JOIN ks
          WHERE k <= LEAST(length(sa), length(sb))
          GROUP BY pos_a, pos_b)
"""


@register("sa_repeat_pairs", _SA_ORACLE_PRELUDE + """
    , offs AS (
      SELECT doc_id,
             SUM(length(t) + 1) OVER (ORDER BY doc_id)
               - (length(t) + 1) AS off,
             length(t) + 1 AS ln
      FROM d16
    ),
    attributed AS (
      SELECT oa.doc_id AS doc_a, ob.doc_id AS doc_b, l.lcp
      FROM l
      JOIN offs oa ON l.pos_a > oa.off AND l.pos_a <= oa.off + oa.ln
      JOIN offs ob ON l.pos_b > ob.off AND l.pos_b <= ob.off + ob.ln
      WHERE l.lcp >= 16 AND oa.doc_id <> ob.doc_id
    )
    SELECT LEAST(doc_a, doc_b) AS doc_lo,
           GREATEST(doc_a, doc_b) AS doc_hi,
           CAST(MAX(lcp) AS BIGINT) AS max_lcp,
           CAST(COUNT(*) AS BIGINT) AS n_repeats
    FROM attributed GROUP BY doc_lo, doc_hi
""")
def q_sa_repeat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document EXACT repeat pairs from the suffix array — the
    back half of the Lee et al. 2022 pipeline: every shared substring of
    ≥16 chars between two docs appears as a rank-adjacent suffix pair
    with LCP ≥ 16 (maximal repeats are rank-adjacent), so the dedup
    candidate set is a FILTER over the LCP array plus a broadcast
    pos→doc attribution join (16 offset rows), never a doc×doc
    comparison. Complements the winnowing tier (probabilistic,
    alignment-robust) with exact guarantees at shard scale. doc pairs
    are normalized (lo, hi); max_lcp is the longest shared span, capped
    512 like longest_repeated_substring."""
    from parquetaivectorsearch_spark.operators.suffix import (
        lcp_adjacent, suffix_array_rounds)

    offs = _shard_offsets(spark, sf_dir).select("doc_id", "off", "ln")
    sa, rounds = suffix_array_rounds(_shard_chars(spark, sf_dir), parts=8)
    lcp = (lcp_adjacent(sa, rounds, max_lcp=512)
           .withColumn("lcp", F.least(F.col("lcp"), F.lit(512)))
           .filter(F.col("lcp") >= 16))
    oa = F.broadcast(offs.select(F.col("doc_id").alias("doc_a"),
                                 F.col("off").alias("off_a"),
                                 F.col("ln").alias("ln_a")))
    ob = F.broadcast(offs.select(F.col("doc_id").alias("doc_b"),
                                 F.col("off").alias("off_b"),
                                 F.col("ln").alias("ln_b")))
    att = (lcp
           .join(oa, (F.col("pos_a") > F.col("off_a"))
                 & (F.col("pos_a") <= F.col("off_a") + F.col("ln_a")))
           .join(ob, (F.col("pos_b") > F.col("off_b"))
                 & (F.col("pos_b") <= F.col("off_b") + F.col("ln_b")))
           .filter(F.col("doc_a") != F.col("doc_b")))
    return (att.groupBy(
                F.least("doc_a", "doc_b").alias("doc_lo"),
                F.greatest("doc_a", "doc_b").alias("doc_hi"))
            .agg(F.max("lcp").cast("bigint").alias("max_lcp"),
                 F.count("*").cast("bigint").alias("n_repeats")))


_WINNOW_PAIRS_SQL = """
    dt AS (
      SELECT doc_id, substr(text, 1, 256) AS t FROM documents
    ),
    d AS (
      SELECT doc_id, t AS text, length(t) - 31 AS n_w FROM dt
      WHERE length(t) >= 32
    ),
    k AS (
      SELECT doc_id, text, n_w,
             list_transform(generate_series(1, n_w),
               i -> md5(substring(text, CAST(i AS INTEGER), 32))
                    || lpad(CAST(i AS VARCHAR), 10, '0')) AS keys
      FROM d
    ),
    sel AS (
      SELECT doc_id, text,
             list_distinct(list_transform(generate_series(1, n_w),
               q -> list_min(list_slice(keys, CAST(q AS INTEGER),
                                        CAST(q + 15 AS INTEGER))))) AS winners
      FROM k
    ),
    w AS (
      SELECT DISTINCT doc_id,
             CAST(('0x' || substr(wk, 1, 15)) AS BIGINT) AS win
      FROM sel, unnest(winners) AS t(wk)
    ),
    keep AS (
      SELECT win FROM w GROUP BY win HAVING COUNT(*) BETWEEN 2 AND 10
    ),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             COUNT(*) AS n_shared_windows
      FROM w a
      JOIN keep k2 ON a.win = k2.win
      JOIN w b ON b.win = a.win AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
"""


@register("dedup_substring_exact", "WITH " + _WINNOW_PAIRS_SQL + """
    , fpairs AS (
      SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b LIMIT 8
    ),
    flagged AS (
      SELECT DISTINCT doc_id FROM (
        SELECT doc_a AS doc_id FROM fpairs
        UNION ALL SELECT doc_b AS doc_id FROM fpairs)
    ),
    d16 AS (
      SELECT dt.doc_id, dt.t FROM dt JOIN flagged USING (doc_id)
    ),
    s AS (SELECT string_agg(t || chr(1), '' ORDER BY doc_id) AS shard
          FROM d16),
    p AS (SELECT unnest(generate_series(
            1, length((SELECT shard FROM s)))) AS pos),
    suf AS (SELECT pos, substr((SELECT shard FROM s), pos) AS sfx FROM p),
    r AS (SELECT pos, sfx, row_number() OVER (ORDER BY sfx) AS rk FROM suf),
    adj AS (SELECT a.pos AS pos_a, b.pos AS pos_b, a.sfx AS sa, b.sfx AS sb
            FROM r a JOIN r b ON b.rk = a.rk + 1),
    ks AS (SELECT unnest(generate_series(1, 512)) AS k),
    l AS (SELECT pos_a, pos_b,
            COALESCE(MAX(CASE WHEN substr(sa, 1, k) = substr(sb, 1, k)
                          THEN k END), 0) AS lcp
          FROM adj CROSS JOIN ks
          WHERE k <= LEAST(length(sa), length(sb))
          GROUP BY pos_a, pos_b),
    offs AS (
      SELECT doc_id,
             SUM(length(t) + 1) OVER (ORDER BY doc_id)
               - (length(t) + 1) AS off,
             length(t) + 1 AS ln
      FROM d16
    ),
    attributed AS (
      SELECT oa.doc_id AS doc_a, ob.doc_id AS doc_b, l.lcp
      FROM l
      JOIN offs oa ON l.pos_a > oa.off AND l.pos_a <= oa.off + oa.ln
      JOIN offs ob ON l.pos_b > ob.off AND l.pos_b <= ob.off + ob.ln
      WHERE l.lcp >= 32 AND oa.doc_id <> ob.doc_id
    ),
    verified AS (
      SELECT LEAST(doc_a, doc_b) AS doc_lo,
             GREATEST(doc_a, doc_b) AS doc_hi,
             CAST(MAX(lcp) AS BIGINT) AS max_lcp,
             CAST(COUNT(*) AS BIGINT) AS n_repeats
      FROM attributed GROUP BY doc_lo, doc_hi
    )
    SELECT v.doc_lo, v.doc_hi,
           CAST(p2.n_shared_windows AS BIGINT) AS n_shared_windows,
           v.max_lcp, v.n_repeats
    FROM verified v
    JOIN pairs p2 ON p2.doc_a = v.doc_lo AND p2.doc_b = v.doc_hi
""")
def q_dedup_substring_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Lee et al. 2022 exact-substring-dedup pipeline composed
    end-to-end (VERDICT r10 #4): TIER 1 winnow-fingerprints the whole
    corpus (operators/dedup.substring_dup_pairs — content-defined
    min-md5 window selection, one content-keyed shuffle, the 100 TB
    prefilter) to FLAG candidate duplicate docs; TIER 2 builds the
    distributed suffix array (operators/suffix.py, prefix doubling) over
    ONLY the flagged docs and verifies each flagged pair's EXACT maximal
    shared span via the LCP array (cross-doc rank-adjacent suffixes,
    lcp ≥ window). The prefilter is what bounds the expensive exact
    tier: the SA never sees an unflagged doc — at 100 TB, tier 1 is a
    corpus-wide narrow pass and tier 2 runs per flagged shard-group.
    Both tiers see the SAME 256-char truncated view so verification
    semantics are exact; the flagged set is capped at the 16 smallest
    doc_ids (fixture-shard bound — production shards by pair-cluster).
    Output per verified pair: (doc_lo, doc_hi, n_shared_windows [tier-1
    evidence], max_lcp [exact longest shared span, capped 512],
    n_repeats [distinct rank-adjacent repeat sites ≥ 32 chars]). The
    oracle replays BOTH tiers in DuckDB: the winnow CTEs of
    dedup_substring plus the direct O(n²)-suffix-sort verification of
    sa_repeat_pairs — two independent constructions, hash-checked."""
    from parquetaivectorsearch_spark.operators.dedup import (
        substring_dup_pairs)
    from parquetaivectorsearch_spark.operators.suffix import (
        lcp_adjacent, suffix_array_rounds)

    dt = (_t(spark, sf_dir, "documents", spread=True)
          .select("doc_id", F.substring("text", 1, 256).alias("t")))
    # hashed=False so the DuckDB oracle can replay the window grouping
    # (pair-set equality with the hashed production twin is pinned in
    # tests/test_dedup.py); checkpointed because the pair set feeds both
    # the flagged-doc scan and the final verification join
    pairs = substring_dup_pairs(
        dt.select("doc_id", F.col("t").alias("text")),
        window=32, stride=16, max_docs_per_window=10,
        hashed=False).localCheckpoint(eager=False)
    # cap on flagged PAIRS, not flagged docs: both members of each
    # sharded pair are guaranteed present, so every sharded candidate is
    # verified-or-refuted (a doc-id cap strands pairs whose partner
    # falls outside it — 0 verified rows at sf0.1, which proves nothing)
    fpairs = pairs.orderBy("doc_a", "doc_b").limit(8)
    flagged = (fpairs.select(F.col("doc_a").alias("doc_id"))
               .unionAll(fpairs.select(F.col("doc_b").alias("doc_id")))
               .distinct())
    offs = _offsets_from(
        dt.join(F.broadcast(flagged), "doc_id").select("doc_id", "t")
    ).localCheckpoint(eager=False)  # reused: chars explode + attribution
    sa, rounds = suffix_array_rounds(_chars_from(offs), parts=8)
    lcp = (lcp_adjacent(sa, rounds, max_lcp=512)
           .withColumn("lcp", F.least(F.col("lcp"), F.lit(512)))
           .filter(F.col("lcp") >= 32))
    oa = F.broadcast(offs.select(F.col("doc_id").alias("doc_a"),
                                 F.col("off").alias("off_a"),
                                 F.col("ln").alias("ln_a")))
    ob = F.broadcast(offs.select(F.col("doc_id").alias("doc_b"),
                                 F.col("off").alias("off_b"),
                                 F.col("ln").alias("ln_b")))
    att = (lcp
           .join(oa, (F.col("pos_a") > F.col("off_a"))
                 & (F.col("pos_a") <= F.col("off_a") + F.col("ln_a")))
           .join(ob, (F.col("pos_b") > F.col("off_b"))
                 & (F.col("pos_b") <= F.col("off_b") + F.col("ln_b")))
           .filter(F.col("doc_a") != F.col("doc_b")))
    verified = (att.groupBy(
                    F.least("doc_a", "doc_b").alias("doc_lo"),
                    F.greatest("doc_a", "doc_b").alias("doc_hi"))
                .agg(F.max("lcp").cast("bigint").alias("max_lcp"),
                     F.count("*").cast("bigint").alias("n_repeats")))
    ev = pairs.select(F.col("doc_a").alias("doc_lo"),
                      F.col("doc_b").alias("doc_hi"),
                      F.col("n_shared_windows").cast("bigint")
                      .alias("n_shared_windows"))
    return verified.join(ev, ["doc_lo", "doc_hi"]).select(
        "doc_lo", "doc_hi", "n_shared_windows", "max_lcp", "n_repeats")
