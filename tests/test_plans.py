"""Physical-plan assertions: the scale-posture properties every operator
relies on must be visible in the executed plan (SURVEY.md §4), so a
refactor that silently kills pushdown/pruning/broadcast fails here."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquetaivectorsearch_spark import plans as P
from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_SMOKE

QUERIES = Q.all_queries()


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["filter_pushdown"](spark, SF_SMOKE)
    pushed = P.pushed_filters(df)
    assert any("lang" in p for p in pushed), pushed
    assert any("n_chars" in p for p in pushed), pushed


def test_column_pruning_reaches_scan(spark):
    """project_columns must read only (doc_id, lang, source) — never text,
    the wide column."""
    df = QUERIES["project_columns"](spark, SF_SMOKE)
    scans = P.read_schema_columns(df)
    assert scans and all("text" not in cols for cols in scans), scans


def test_dim_joins_broadcast(spark):
    df = QUERIES["join_broadcast_nation"](spark, SF_SMOKE)
    assert P.has_broadcast_join(df)


def test_knn_topk_is_take_ordered(spark):
    """Exact KNN must plan per-partition top-k heaps (TakeOrderedAndProject),
    not a global sort (Program.cs:219's OrderBy().Take() generalized)."""
    df = QUERIES["knn_topk"](spark, SF_SMOKE)
    assert P.has_take_ordered(df)
    assert P.has_broadcast_join(df)  # 1-row query side broadcast


def test_groupby_has_partial_aggregate(spark):
    df = QUERIES["groupby_agg"](spark, SF_SMOKE)
    assert P.has_partial_aggregate(df)


def test_minhash_reuses_signature_exchange(spark):
    """The LSH banding self-join must reuse the signature pipeline's shuffle
    (ReusedExchange), not recompute both sides. AQE decides reuse at
    runtime, so execute first and assert on the final adaptive plan."""
    from parquetaivectorsearch_spark.operators import dedup as DD
    from parquetaivectorsearch_spark.sources import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    cands = DD.minhash_candidates(DD.minhash_signatures(docs), 8)
    cands.collect()
    plan = P.executed_plan(cands)
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan


def test_scan_prunes_embedding_when_unused(spark):
    """count over embeddings must not read the 64-float embedding column."""
    from parquetaivectorsearch_spark.sources import load_table

    df = load_table(spark, SF_SMOKE, "embeddings").groupBy("label").count()
    scans = P.read_schema_columns(df)
    assert scans and all("embedding" not in cols for cols in scans), scans


def test_events_ts_filter_pushes_down(spark):
    """With the timestamp[us] fixture generation, events.ts passes through
    the loader untransformed, so a time-range predicate must reach the
    parquet scan as a pushed filter. (Under the old TIMESTAMP(NANOS)
    fixtures ts was a computed column and pushdown was impossible — this
    pins the scale win the dtype branch in sources/catalog.py buys.)"""
    from parquetaivectorsearch_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events").filter(
        F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
    pushed = P.pushed_filters(ev)
    assert any("ts" in p for p in pushed), pushed


def test_join_bucketed_has_no_exchange_below_join(spark):
    """The bucketed fact-to-fact join must consume the bucket layout: no
    ShuffleExchange may feed the SortMergeJoin (the post-join agg is allowed
    its own exchange)."""
    df = QUERIES["join_bucketed"](spark, SF_SMOKE)
    plan = P.executed_plan(df)
    join_at = plan.find("SortMergeJoin")
    assert join_at != -1, plan
    # Everything below the join in the plan string = the two scan subtrees.
    below = plan[join_at:]
    assert "Exchange" not in below, below


def test_repetition_score_is_shuffle_free(spark):
    """repetition_score must stay a narrow map after its spread
    repartition: exactly ONE exchange (the small (id, text) scatter that
    buys scan-width parallelism for the CPU-heavy fold — same tradeoff as
    the dedup signature stage), and no aggregation exchange (the whole
    point vs the explode+groupBy shape)."""
    df = QUERIES["repetition_score"](spark, SF_SMOKE)
    plan = P.executed_plan(df)
    assert plan.count("Exchange") <= 1, plan
    assert "HashAggregate" not in plan, plan


def test_substring_dedup_single_window_shuffle(spark):
    """dedup_substring's docstring contract: ONE shuffle of the (winnowed)
    window table — reused by the distinct, the stop-window agg, and both
    self-join sides — plus the final pair aggregation. The per-doc
    winnowing min-scan must stay a narrow map (no exchange of its own):
    executed adaptive plan shows ≤ 2 distinct Exchanges and ≥ 1 reuse."""
    from parquetaivectorsearch_spark import plans as P2

    df = QUERIES["dedup_substring"](spark, SF_SMOKE)
    df.collect()
    plan = P2.executed_plan(df)
    assert "isFinalPlan=true" in plan
    if "== Initial Plan ==" in plan:  # AQE prints final + initial; keep final
        plan = plan[: plan.index("== Initial Plan ==")]
    # shuffle exchanges only — AQE may legally convert the tiny keep /
    # self-join sides to broadcasts at fixture size
    n_shuffle = plan.count("Exchange hashpartitioning") \
        - plan.count("ReusedExchange")
    assert n_shuffle <= 2, plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Spark's runtime row-level filtering must inject a bloom filter built
    from the selective build side into the probe-side scan of a shuffle
    join (the 100 TB scan-reduction story: most lineitem rows are dropped
    before the shuffle). The application-side scan threshold defaults to
    10 GB — sized for real clusters — so it is lowered here to demonstrate
    the mechanism at fixture scale; results must equal the plain join."""
    from parquetaivectorsearch_spark.sources import load_table

    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    }
    old = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        rows = {tuple(r) for r in j.collect()}
        assert "might_contain" in P.executed_plan(j)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    plain = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
    assert rows == {tuple(r) for r in plain.collect()}


def test_unigram_logprob_broadcasts_vocab(spark):
    """The vocabulary must come back onto the token stream as a broadcast
    (vocab ≪ corpus — re-shuffling the token stream for the re-join would
    double the pipeline's largest exchange)."""
    df = QUERIES["unigram_logprob"](spark, SF_SMOKE)
    assert P.has_broadcast_join(df)


def test_bpe_merge_step_is_take_ordered(spark):
    """Top-20 pairs must plan as TakeOrderedAndProject over the partial
    agg, never a global sort of the |alphabet|² key space."""
    df = QUERIES["bpe_merge_step"](spark, SF_SMOKE)
    assert P.has_take_ordered(df)
    assert P.has_partial_aggregate(df)


def test_knn_range_search_is_shuffle_free(spark):
    """The radius query is one pass: broadcast 1-row query, row-local
    rounded-distance filter — NO Exchange anywhere (not even a top-k
    heap-merge), the plan shape the 100 TB single-pass claim rests on."""
    df = QUERIES["knn_range_search"](spark, SF_SMOKE)
    plan = P.executed_plan(df)
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    assert P.has_broadcast_join(df)


def test_maxsim_is_row_local_take_ordered(spark):
    """MaxSim's 4×4 token-interaction grid must stay inside one projection:
    no HashAggregate (the naive explode→groupBy×2 shape), no generate/
    explode, just broadcast + TakeOrdered."""
    df = QUERIES["maxsim_multivector"](spark, SF_SMOKE)
    plan = P.executed_plan(df)
    assert "HashAggregate" not in plan, plan
    assert "Generate" not in plan, plan
    assert P.has_take_ordered(df)


def test_curation_funnel_single_pass(spark):
    """The funnel's 5 stage rows must come from ONE aggregate over one
    corpus scan (r9 shipped a 5-way union re-executing the flag lineage
    per stage: 14 parquet scans, zero reuse). Pinned shape: exactly 3
    parquet scans — the flags lineage plus the two contamination shingle
    branches — and the keeper flag as a window, never a join-back."""
    import re

    df = QUERIES["curation_funnel"](spark, SF_SMOKE)
    plan = P.formatted_plan(df)
    tree = plan.split("\n\n")[0]
    assert len(re.findall(r"Scan parquet", tree)) == 3, tree
    assert "Window" in tree, tree


def test_domain_cap_partial_window_group_limit(spark):
    """The per-domain cap must plan a MAP-SIDE WindowGroupLimit below the
    exchange (rank-limit pushdown): each input partition ships at most
    cap rows per source, so a skewed mega-domain never full-sorts its
    group on one reducer. Shape: WindowGroupLimit → Exchange →
    WindowGroupLimit → Window."""
    df = QUERIES["domain_cap_sample"](spark, SF_SMOKE)
    tree = P.formatted_plan(df).split("\n\n")[0]
    import re
    limits = len(re.findall(r"WindowGroupLimit", tree))
    assert limits == 2, tree
    assert tree.index("Exchange") < tree.rindex("WindowGroupLimit"), tree


def test_admission_build_side_policy():
    """Unit pin for the filtered-serve admission join (r10 What's-wrong
    #1): a selective filter broadcasts the small allowed-id set, an
    UNselective filter broadcasts the bounded candidate frame (never
    the ~n_total id set), and the both-huge corner degrades to a
    shuffle semi-join instead of OOMing either broadcast."""
    from parquetaivectorsearch_spark.operators.hnsw import (
        admission_build_side)

    assert admission_build_side(100, 8, 40) == "broadcast_allowed"
    # sel=0.5 over 1B vectors: 500M ids must NEVER be the build side
    assert admission_build_side(500_000_000, 8, 40) == "broadcast_cand"
    # 1M-query batch at k'=8000 against a 500M-id filter: both unbounded
    assert admission_build_side(500_000_000, 1_000_000, 8000) == "shuffle"
    # at the row budget exactly, broadcasting is still allowed
    assert admission_build_side(4_000_000, 1_000_000, 8000) == \
        "broadcast_allowed"


def test_filtered_hnsw_broadcasts_cand_not_allowed(spark):
    """With an unselective filter (allowed ≈ whole corpus > |q|·k') the
    admission join's BUILD side must be the candidate frame, not the
    allowed-id set (the r10 plan broadcast `allowed` unconditionally —
    an OOM at any large filter). Auto-broadcast is disabled so the only
    BroadcastHashJoin in the plan is the explicit hint; `allowed` is
    the LEFT child there, so the hinted build side must be BuildRight."""
    from pyspark.sql import functions as F

    from parquetaivectorsearch_spark.operators.hnsw import (
        build_hnsw, hnsw_search_filtered)
    from parquetaivectorsearch_spark.sources import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    graph = build_hnsw(emb.select("vec_id", "embedding"), n_partitions=2)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"))
    allowed = emb.select("vec_id")  # sel = 1.0: every id passes
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold",
                             None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        res = hnsw_search_filtered(graph, queries, allowed, k=5)
        plan = P.executed_plan(res)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                           old_aqe)
    import re
    joins = re.findall(r"BroadcastHashJoin.*", plan)
    assert len(joins) == 1, plan
    assert "BuildRight" in joins[0], joins[0]


def test_grouped_quantile_sketch_plans_map_side_group_limit(spark):
    """The per-group bottom-k summary must plan a MAP-SIDE
    WindowGroupLimit below the exchange (static rn <= k over (hash, id)),
    so a mega-language ships at most k rows per input partition instead
    of full-sorting its group on one reducer — the same rank-limit
    pushdown pin as domain_cap_sample. Pinned on the OPERATOR (the query
    localCheckpoints the summary, which hides this stage from the final
    tree)."""
    import re

    from parquetaivectorsearch_spark.operators.sketch import (
        bottomk_summary_grouped,
    )
    from parquetaivectorsearch_spark.sources import load_table

    d = load_table(spark, SF_SMOKE, "documents") \
        .select("lang", "doc_id", "n_chars")
    df = bottomk_summary_grouped(d, "lang", "doc_id", "n_chars", k=64)
    tree = P.formatted_plan(df).split("\n\n")[0]
    limits = len(re.findall(r"WindowGroupLimit", tree))
    assert limits == 2, tree
    assert tree.index("Exchange") < tree.rindex("WindowGroupLimit"), tree
