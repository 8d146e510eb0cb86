"""Semantic + physical-plan checks for the training-data-pipeline operators
(queries_pipeline.py). Oracle parity is covered by test_oracle_parity.py;
here we assert the *meaning* (quotas, balance, merge-equals-direct) and the
scale posture visible in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquetaivectorsearch_spark import plans as P
from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_CORRECT, SF_SMOKE

QUERIES = Q.all_queries()


def test_sample_hash_fraction_and_no_shuffle(spark):
    """~10% deterministic sample; the plan must be a pure scan+filter —
    no exchange anywhere (the whole point of arithmetic sampling)."""
    df = QUERIES["sample_hash"](spark, SF_CORRECT)
    total = spark.read.parquet(f"{SF_CORRECT}/documents.parquet").count()
    n = df.count()
    assert 0.05 * total < n < 0.15 * total, (n, total)
    assert "Exchange" not in P.formatted_plan(df)


def test_stratified_sample_quotas(spark):
    """Exactly 50 docs per language (every fixture lang has >50 docs at
    sf0.01: smallest stratum is fr=64)."""
    per_lang = (
        QUERIES["stratified_sample"](spark, SF_CORRECT)
        .groupBy("lang").count().collect()
    )
    assert len(per_lang) == 5
    assert all(r["count"] == 50 for r in per_lang), per_lang


def test_stratified_sample_rank_limit_pushed(spark):
    """Spark must push `rn <= 100` into the window sort (WindowGroupLimit)
    so each stratum stops after 100 rows instead of ranking everything."""
    plan = P.formatted_plan(QUERIES["stratified_sample"](spark, SF_CORRECT))
    assert "WindowGroupLimit" in plan, plan


def test_ntile_buckets_balanced(spark):
    counts = (
        QUERIES["ntile_bucket"](spark, SF_CORRECT)
        .groupBy("quartile").count().orderBy("quartile").collect()
    )
    assert [r["quartile"] for r in counts] == [1, 2, 3, 4]
    sizes = [r["count"] for r in counts]
    assert max(sizes) - min(sizes) <= 1, sizes


def test_grouping_sets_grains(spark):
    """Three grains in one pass: per-returnflag rows, per-linestatus rows,
    and exactly one grand-total row; grand total equals count_rows of
    lineitem."""
    rows = QUERIES["grouping_sets_agg"](spark, SF_CORRECT).collect()
    grand = [r for r in rows if r["g_rf"] == 1 and r["g_ls"] == 1]
    assert len(grand) == 1
    li_total = (
        Q.QUERIES["scan_parquet"]  # any loader works; count lineitem directly
        and spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet").count()
    )
    assert grand[0]["n_items"] == li_total
    by_rf = sum(r["n_items"] for r in rows if r["g_rf"] == 0)
    by_ls = sum(r["n_items"] for r in rows if r["g_ls"] == 0)
    assert by_rf == by_ls == li_total


def test_text_normalize_idempotent(spark):
    """Normalizing twice changes nothing (canonical form is a fixpoint)."""
    df = QUERIES["text_normalize"](spark, SF_SMOKE)
    renorm = F.regexp_replace(F.lower(F.trim(F.col("norm_text"))), r"\s+", " ")
    changed = df.filter(renorm != F.col("norm_text")).count()
    assert changed == 0


def test_incremental_rollup_equals_direct(spark):
    """Merged (materialized history + raw tail) must equal the direct
    full-table daily aggregate exactly — and both sides of the cutoff must
    be non-empty, otherwise the merge path isn't actually exercised."""
    merged = {
        r["day"]: (r["n_events"], r["total_value"])
        for r in QUERIES["incremental_rollup"](spark, SF_CORRECT).collect()
    }
    from parquetaivectorsearch_spark.sources import load_table

    direct = {
        r["day"]: (r["n_events"], r["total_value"])
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("total_value"),
        )
        .collect()
    }
    assert merged == direct
    import datetime

    cutoff = datetime.date(2024, 1, 20)
    assert any(d < cutoff for d in merged)
    assert any(d >= cutoff for d in merged)


def test_vocab_top_words_is_take_ordered(spark):
    """Top-100 must plan as TakeOrderedAndProject (partial top-k per
    partition), not a global sort of the whole vocabulary."""
    df = QUERIES["vocab_top_words"](spark, SF_CORRECT)
    assert P.has_take_ordered(df)


def test_repetition_score_planted_values(spark):
    """Hand-checkable docs: the max-multiplicity fold must equal the
    relational (group-by) definition on planted repetition."""
    from parquetaivectorsearch_spark.queries_text import q_repetition_score
    import tempfile

    d = tempfile.mkdtemp(prefix="rep_")
    spark.createDataFrame(
        [
            # "a b a b a" → words 5, distinct 2; bigrams: ab,ba,ab,ba → max 2/4
            (0, "a b a b a"),
            # all distinct words → dup 0; every bigram unique → 1/3
            (1, "w x y z"),
            # one bigram only
            (2, "p q"),
            # degenerate: same word repeated
            (3, "t t t t"),
        ],
        "doc_id BIGINT, text STRING",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in q_repetition_score(spark, d).collect()}
    assert abs(got[0].dup_word_frac - (1 - 2 / 5)) < 1e-9
    assert abs(got[0].top_bigram_frac - 2 / 4) < 1e-9
    assert got[1].dup_word_frac == 0.0 and abs(got[1].top_bigram_frac - 1 / 3) < 1e-9
    assert got[2].dup_word_frac == 0.0 and got[2].top_bigram_frac == 1.0
    assert abs(got[3].dup_word_frac - (1 - 1 / 4)) < 1e-9
    assert got[3].top_bigram_frac == 1.0  # "t t" ×3 of 3 bigrams


def test_unigram_logprob_hand_case(spark):
    """3 tokens total: p(a)=2/3, p(b)=1/3; doc0 = avg(-ln 2/3, -ln 2/3) …"""
    import math
    import tempfile

    from parquetaivectorsearch_spark.queries_text import q_unigram_logprob

    d = tempfile.mkdtemp(prefix="ulp_")
    spark.createDataFrame(
        [(0, "a a"), (1, "b")], "doc_id BIGINT, text STRING"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in q_unigram_logprob(spark, d).collect()}
    assert got[0].n_tokens == 2 and got[1].n_tokens == 1
    assert abs(got[0].avg_neg_logprob - round(-math.log(2 / 3), 6)) < 1e-6
    assert abs(got[1].avg_neg_logprob - round(-math.log(1 / 3), 6)) < 1e-6


def test_pmi_collocations_survives_one_word_docs(spark):
    """sequence(1, 0) is DESCENDING in Spark — a 1-word doc must not probe
    element_at out of bounds under ANSI mode (guarded by the ≥2-word
    filter before the bigram transform)."""
    import tempfile

    from parquetaivectorsearch_spark.queries_text import q_pmi_collocations

    d = tempfile.mkdtemp(prefix="pmi_")
    spark.createDataFrame(
        [(0, "solo")] + [(i, "alpha beta alpha beta gamma") for i in range(1, 8)],
        "doc_id BIGINT, text STRING",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = q_pmi_collocations(spark, d).collect()
    pairs = {(r.w1, r.w2) for r in rows}
    assert ("alpha", "beta") in pairs  # seen 14 times ≥ 5


def test_ranking_metrics_hand_computed(spark):
    """Independent recomputation guard: ranking_metrics is oracle-checked,
    but the oracle SQL and the Spark plan share an author — a formula bug
    written into both would hash-match. This fixture pins the metric
    DEFINITIONS by hand: 13 customers in one nation with spends that rank
    them 1..13 and relevance at ranks {2,5,11,13}, plus a nation with no
    relevant customers at all (every zero-guard path)."""
    import math
    import tempfile

    from parquetaivectorsearch_spark.queries_pipeline import q_ranking_metrics

    d = tempfile.mkdtemp(prefix="rankm_")
    cust, orders, oid = [], [], 0
    for i in range(1, 14):  # nation 7: rank i = customer i (spend desc)
        rel = i in (2, 5, 11, 13)
        cust.append((i, 7, 9000.0 if rel else 100.0))
        # two orders summing to 1000 - 10i (exact cents)
        orders.append((oid, i, 600.0 - 10 * i)); oid += 1
        orders.append((oid, i, 400.0)); oid += 1
    for i in range(20, 23):  # nation 8: nobody relevant
        cust.append((i, 8, 100.0))
        orders.append((oid, i, 50.0)); oid += 1
    spark.createDataFrame(
        cust, "c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE"
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        orders, "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE"
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    got = {r.nation: r for r in q_ranking_metrics(spark, d).collect()}
    assert set(got) == {7, 8}

    # nation 7, by definition: hits@10 = ranks {2,5} → 2 of 4 relevant
    dcg = 1 / math.log2(2 + 1) + 1 / math.log2(5 + 1)
    idcg = sum(1 / math.log2(i + 1) for i in range(1, 5))  # min(10, 4) ideal
    r7 = got[7]
    assert r7.precision_at_10 == round(2 / 10, 6)
    assert r7.recall_at_10 == round(2 / 4, 6)
    assert r7.mrr == round(1 / 2, 6)
    assert r7.ndcg_at_10 == round(dcg / idcg, 6)

    r8 = got[8]
    assert (r8.precision_at_10, r8.recall_at_10, r8.mrr, r8.ndcg_at_10) \
        == (0.0, 0.0, 0.0, 0.0)


def test_zipf_fit_exact_power_law(spark):
    """A corpus whose word frequencies are EXACTLY n(r) = 2^(10-r) has
    ln n = 10·ln 2 − r·ln 2 — linear in r, not ln r, so the log-log fit
    is not ±1-exact; instead pin the regression itself: build counts
    n(r) = round(1000·r^−1) for r = 1..8, whose log-log slope must land
    within 0.02 of −1 with r² ≈ 1 (the Zipf signature the query is for)."""
    import tempfile

    from parquetaivectorsearch_spark.queries_text import q_zipf_fit

    d = tempfile.mkdtemp(prefix="zipf_")
    rows = []
    for r in range(1, 9):
        n = round(1000 / r)
        rows.extend((i, f"w{r:02d}") for i in range(n))
    docs = [(0, " ".join(w for _, w in rows))]
    spark.createDataFrame(docs, "doc_id BIGINT, text STRING") \
        .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = q_zipf_fit(spark, d).collect()[0]
    assert got.n_ranks == 8
    assert abs(got.slope + 1.0) < 0.02, got.slope
    assert got.r2 > 0.999, got.r2


def test_decontaminate_spans_hand_case(spark):
    """Bench doc 0 = 'b1..b10'; train doc 20 embeds words b1..b5 and
    b3..b7 (two overlapping 5-gram matches -> ONE merged span covering
    b1..b7 = 7 words) plus a separate b6..b10? no — a distant second
    region c-padding then b1..b5 again (second island). Verify island
    merge + coverage arithmetic exactly."""
    import tempfile

    from parquetaivectorsearch_spark.queries_traindata import (
        q_decontaminate_spans,
    )

    bench = " ".join(f"b{i}" for i in range(1, 11))          # b1..b10
    pad = " ".join(f"c{i}" for i in range(8))                # 8 unique words
    # words 1-7 = b1..b7 (matches at i=1,2,3 merge: span [1, 7]);
    # words 8-15 = pad; words 16-20 = b1..b5 (match at i=16: span [16, 20])
    train = " ".join(
        [f"b{i}" for i in range(1, 8)] + pad.split() +
        [f"b{i}" for i in range(1, 6)])
    d = tempfile.mkdtemp(prefix="dspan_")
    spark.createDataFrame(
        [(0, bench), (20, train)], "doc_id BIGINT, text STRING"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in q_decontaminate_spans(spark, d).collect()}
    assert set(got) == {20}
    r = got[20]
    assert r.n_spans == 2
    assert r.words_flagged == 7 + 5
    assert r.n_words == 20
    assert abs(r.frac_flagged - 0.6) < 1e-9


def test_heaps_law_monotone_and_final_totals(spark):
    """Vocabulary and token curves must be non-decreasing in the decile,
    and the decile-10 row must equal the whole-corpus totals."""
    from parquetaivectorsearch_spark.queries_text import q_heaps_law

    from parquetaivectorsearch_spark.sources import load_table

    rows = sorted(q_heaps_law(spark, SF_SMOKE).collect(),
                  key=lambda r: r.decile)
    assert [r.decile for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b.n_vocab >= a.n_vocab and b.n_tokens >= a.n_tokens \
            and b.n_docs >= a.n_docs
    docs = load_table(spark, SF_SMOKE, "documents")
    from parquetaivectorsearch_spark.functions.text import words
    import pyspark.sql.functions as F
    total_vocab = (docs.select(F.explode(words("text")).alias("w"))
                   .agg(F.count_distinct("w")).collect()[0][0])
    assert rows[-1].n_vocab == total_vocab
    assert rows[-1].n_docs == docs.count()


def test_pps_sample_invariants(spark):
    """Systematic PPS: exactly 50 draws total; every drawn doc's interval
    really contains its probes; a doc longer than total/50 chars is
    guaranteed to be drawn (systematic sampling's certainty-inclusion
    property)."""
    from parquetaivectorsearch_spark.queries_traindata import q_pps_sample
    from parquetaivectorsearch_spark.sources import load_table

    rows = q_pps_sample(spark, SF_SMOKE).collect()
    assert sum(r.n_picks for r in rows) == 50
    docs = load_table(spark, SF_SMOKE, "documents")
    import pyspark.sql.functions as F
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    drawn = {r.doc_id for r in rows}
    big = {r.doc_id for r in docs.filter(
        F.col("n_chars") * 50 > total).collect()}
    assert big <= drawn


def test_curation_funnel_monotone_and_consistent(spark):
    """Stage counts must be monotone non-increasing, start at the corpus
    size, and the dedup stage must actually remove truncation variants
    (a vacuous stage would silently prove nothing)."""
    from parquetaivectorsearch_spark.queries_traindata import q_curation_funnel
    from parquetaivectorsearch_spark.sources import load_table

    rows = {r.stage: r for r in q_curation_funnel(spark, SF_CORRECT).collect()}
    assert list(sorted(r.stage_no for r in rows.values())) == [0, 1, 2, 3, 4]
    order = ["raw", "quality", "dedup", "decontaminated", "train_split"]
    counts = [rows[s].n_docs for s in order]
    chars = [rows[s].total_chars for s in order]
    assert counts[0] == load_table(spark, SF_CORRECT, "documents").count()
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert all(a >= b for a, b in zip(chars, chars[1:])), chars
    assert counts[2] < counts[1], "dedup stage must remove cut variants"
    assert counts[4] < counts[3], "train split must drop ~20%"


def test_priority_sample_invariants(spark):
    """Priority sampling (Duffield-Lund-Thorup): exactly k=64 rows; every
    estimator >= its true weight (HT estimator is max(w, tau)); the total
    estimate is within a loose factor of the true char mass (sanity, not
    a distributional claim); and the plan takes the TakeOrdered path —
    never a global sort."""
    from parquetaivectorsearch_spark.queries_traindata import q_priority_sample
    from parquetaivectorsearch_spark.sources import load_table
    import pyspark.sql.functions as F

    df = q_priority_sample(spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) == 64
    assert all(r.est_weight >= r.n_chars for r in rows)
    total = load_table(spark, SF_CORRECT, "documents") \
        .agg(F.sum("n_chars")).collect()[0][0]
    est = sum(r.est_weight for r in rows)
    assert 0.2 * total < est < 5.0 * total, (est, total)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_temperature_mixture_invariants(spark):
    """alpha=0.5 mixture: per-language draw counts equal the
    least(n_s, ceil(120*sqrt(n_s/n_max))) quota exactly; the dominant
    language is actually down-sampled (non-vacuous flattening) while the
    smallest keeps everything; rn values are the 1..quota prefix of the
    Knuth-hash order (reproducibility)."""
    from parquetaivectorsearch_spark.queries_traindata import (
        q_temperature_mixture)
    from parquetaivectorsearch_spark.sources import load_table
    import math
    import pyspark.sql.functions as F

    rows = q_temperature_mixture(spark, SF_CORRECT).collect()
    got = {}
    for r in rows:
        got.setdefault(r.lang, []).append(r.rn)
    cnt = {r.lang: r.n for r in load_table(spark, SF_CORRECT, "documents")
           .groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_max = max(cnt.values())
    for s, n_s in cnt.items():
        quota = min(n_s, math.ceil(120.0 * math.sqrt(n_s / n_max)))
        assert sorted(got.get(s, [])) == list(range(1, quota + 1)), s
    fracs = sorted((n_s, len(got.get(s, [])) / n_s) for s, n_s in cnt.items())
    assert fracs[-1][1] < 1.0, "dominant language must be down-sampled"
    assert fracs[0][1] == 1.0, "smallest language must keep everything"


def test_temperature_mixture_rank_limit_pushed(spark):
    """The static rn <= 120 pre-filter must become a WindowGroupLimit so
    the dominant language's sort is cut at 120 rows map-side — the
    100 TB claim of the mixture plan; the dynamic quota join alone
    cannot be pushed."""
    from parquetaivectorsearch_spark import plans as P
    from parquetaivectorsearch_spark.queries_traindata import (
        q_temperature_mixture)

    plan = P.formatted_plan(q_temperature_mixture(spark, SF_CORRECT))
    assert "WindowGroupLimit" in plan, plan


def test_priority_sample_small_population_exact(spark):
    """n ≤ k: the sample is the whole corpus and est_weight degenerates
    to the TRUE weight (no threshold exists) — the small-population case
    of Duffield-Lund-Thorup. Materialized as a 40-doc fixture dir."""
    import tempfile

    from parquetaivectorsearch_spark.queries_traindata import (
        q_priority_sample)
    from parquetaivectorsearch_spark.sources import load_table

    small = tempfile.mkdtemp(prefix="ps_small_")
    (load_table(spark, SF_SMOKE, "documents")
     .filter("doc_id < 40").write.mode("overwrite")
     .parquet(f"{small}/documents.parquet"))
    rows = q_priority_sample(spark, small).collect()
    assert len(rows) == 40
    assert all(r.est_weight == float(r.n_chars) for r in rows)


def test_priority_sample_grouped_invariants(spark):
    """Per-group sampler: exactly k=16 rows per language (corpus has
    ≥ 17 docs per lang at sf0.01), every estimator ≥ its true weight,
    the rank-limit filter compiles to a WindowGroupLimit, and each
    group's estimate lands within a loose factor of that group's true
    char mass (per-stratum HT sanity)."""
    from parquetaivectorsearch_spark import plans as P
    from parquetaivectorsearch_spark.queries_traindata import (
        q_priority_sample_grouped)
    from parquetaivectorsearch_spark.sources import load_table
    import pyspark.sql.functions as F

    df = q_priority_sample_grouped(spark, SF_CORRECT)
    rows = df.collect()
    per = {}
    for r in rows:
        per.setdefault(r.lang, []).append(r)
        assert r.est_weight >= r.n_chars
    totals = {r.lang: r.t for r in
              load_table(spark, SF_CORRECT, "documents")
              .groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()}
    for lang, rs in per.items():
        assert len(rs) == 16, lang
        est = sum(r.est_weight for r in rs)
        assert 0.1 * totals[lang] < est < 10.0 * totals[lang], (lang, est)
    assert set(per) == set(totals)
    assert "WindowGroupLimit" in P.formatted_plan(df)
