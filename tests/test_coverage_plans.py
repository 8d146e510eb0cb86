"""Plan-shape assertions for the TPC-H fill-ins, scalar-function surface and
training-data pipeline queries: the 100 TB posture (pushdown, broadcast semi
joins, Expand-based unpivot, window-partitioned packing) must be visible in
the physical plan."""

from __future__ import annotations

import re

from parquetaivectorsearch_spark import plans as P
from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_SMOKE

QUERIES = Q.all_queries()


def test_forecast_revenue_pushes_all_predicates(spark):
    """Q6 shape: every filter column reaches the parquet scan and the plan
    is scan → partial agg → single-row final agg (no join, no wide node)."""
    df = QUERIES["forecast_revenue"](spark, SF_SMOKE)
    pushed = " ".join(P.pushed_filters(df))
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, pushed
    assert P.has_partial_aggregate(df)


def test_promo_revenue_broadcasts_part(spark):
    plan = P.formatted_plan(QUERIES["promo_revenue"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan


def test_late_orders_is_semi_join(spark):
    """Q4 shape: the EXISTS-with-inequality must plan as a single semi join
    (each order ships at most once), not an inner join + distinct."""
    plan = P.formatted_plan(QUERIES["late_orders_priority"](spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan


def test_argmax_agg_is_single_aggregate_no_window(spark):
    """max_by packs argmax into the hash agg — no Window/sort node."""
    plan = P.formatted_plan(QUERIES["argmax_agg"](spark, SF_SMOKE))
    assert "max_by" in plan, plan
    assert "Window" not in plan, plan


def test_unpivot_is_expand_no_shuffle(spark):
    """unpivot plans as an Expand node with zero exchanges — each row emits
    its long-form rows in place (the UNION ALL formulation would scan the
    table once per metric)."""
    plan = P.formatted_plan(QUERIES["unpivot_stack"](spark, SF_SMOKE))
    assert "Expand" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_decontaminate_broadcast_semi_join(spark):
    """The bench-shingle set must broadcast into a semi join — the corpus
    side never shuffles on shingle."""
    plan = P.formatted_plan(QUERIES["decontaminate"](spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_mixture_sample_is_pure_filter(spark):
    """Deterministic sampling must stay a scan+filter: no exchange at all."""
    plan = P.formatted_plan(QUERIES["mixture_sample"](spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_pack_sequences_partitions_by_source(spark):
    """Packing must window per source shard (hash-partitioned on source),
    never a single global ordering."""
    plan = P.formatted_plan(QUERIES["pack_sequences"](spark, SF_SMOKE))
    assert re.search(r"hashpartitioning\(source", plan), plan


def test_not_exists_is_anti_join(spark):
    plan = P.formatted_plan(QUERIES["not_exists_subquery"](spark, SF_SMOKE))
    assert "LeftAnti" in plan, plan


def test_correlated_scalar_decorrelates_to_aggregate_join(spark):
    """The per-nation average must appear as one aggregate joined back —
    not N subquery executions."""
    plan = P.formatted_plan(QUERIES["correlated_scalar_subquery"](spark, SF_SMOKE))
    assert P.has_partial_aggregate(QUERIES["correlated_scalar_subquery"](spark, SF_SMOKE)) or "HashAggregate" in plan, plan
    assert "Join" in plan, plan


# ---------------------------------------------------------------------------
# queries_tpch2: full TPC-H shape suite — scale posture
# ---------------------------------------------------------------------------

def test_nation_volume_broadcasts_all_dims(spark):
    """Q7 shape: supplier/customer/nation sides all broadcast; the only
    sort-merge-worthy join is lineitem⋈orders; shipdate window is pushed."""
    df = QUERIES["nation_volume"](spark, SF_SMOKE)
    plan = P.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "l_shipdate" in " ".join(P.pushed_filters(df))


def test_market_share_single_shuffle_probe(spark):
    """Q8 shape: 7-table join with five broadcast stages stacked on one
    probe; no nested-loop join anywhere."""
    plan = P.formatted_plan(QUERIES["market_share"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 5, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_returned_customers_take_ordered(spark):
    """Q10 shape: ORDER BY revenue LIMIT 20 must plan as
    TakeOrderedAndProject (per-partition heaps), never a global sort."""
    plan = P.executed_plan(QUERIES["returned_customers"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan


def test_order_count_distribution_keeps_outer_join(spark):
    """Q13 shape: the priority filter must ride the join (LeftOuter
    survives) — a WHERE would silently drop order-less customers."""
    plan = P.formatted_plan(QUERIES["order_count_distribution"](spark, SF_SMOKE))
    assert "LeftOuter" in plan, plan


def test_waiting_suppliers_single_scan_window(spark):
    """Q21 shape: the EXISTS / NOT EXISTS set facts come from per-order
    windows, not semi/anti joins that would re-derive the items pipeline —
    lineitem must be scanned exactly once."""
    df = QUERIES["waiting_suppliers"](spark, SF_SMOKE)
    df.collect()
    plan = P.executed_plan(df)
    assert "Window" in plan, plan
    baseline = QUERIES["forecast_revenue"](spark, SF_SMOKE)
    baseline.collect()
    per_scan = P.executed_plan(baseline).count("lineitem.parquet")
    assert plan.count("lineitem.parquet") == per_scan, plan


def test_disjunctive_preds_stays_hash_join(spark):
    """Q19 shape: the OR-of-bands must evaluate as a post-join filter on a
    broadcast-hash join — writing it into the join condition degrades to a
    nested-loop cross product at scale."""
    plan = P.formatted_plan(QUERIES["disjunctive_preds"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_idle_customers_anti_join_pushes_price(spark):
    """Q22 shape: NOT EXISTS plans as an anti join whose build side scans
    only big orders (price filter pushed to that scan)."""
    df = QUERIES["idle_customers"](spark, SF_SMOKE)
    plan = P.formatted_plan(df)
    assert "LeftAnti" in plan, plan
    assert "o_totalprice" in " ".join(P.pushed_filters(df))


def test_datetime_functions_no_shuffle(spark):
    """Pure per-row datetime projection: key filter pushed, zero exchanges."""
    df = QUERIES["datetime_functions"](spark, SF_SMOKE)
    assert "o_orderkey" in " ".join(P.pushed_filters(df))
    assert len(re.findall(r"\(\d+\) Exchange", P.formatted_plan(df))) == 0


def test_top_supplier_single_fact_scan(spark):
    """Q15 shape: the max-revenue filter must NOT re-run the revenue
    aggregate (scalar-subquery formulation re-scans lineitem); the rank
    window over the agg output keeps exactly one fact scan."""
    df = QUERIES["top_supplier"](spark, SF_SMOKE)
    df.collect()
    plan = P.executed_plan(df)
    baseline = QUERIES["forecast_revenue"](spark, SF_SMOKE)
    baseline.collect()
    per_scan = P.executed_plan(baseline).count("lineitem.parquet")
    assert plan.count("lineitem.parquet") == per_scan, plan


def test_python_datasource_partition_invariance(spark):
    """The custom source's row set must be identical under any partition
    count — partitioning is a parallelism knob, not a semantic one (the
    contract any 100 TB source must satisfy)."""
    from parquetaivectorsearch_spark.session import ship_package
    from parquetaivectorsearch_spark.sources.pyds import SequenceDataSource

    ship_package(spark)
    try:
        spark.dataSource.register(SequenceDataSource)
    except Exception:
        pass
    def rows(parts):
        df = (spark.read.format("seqsource")
              .option("n", 500).option("parts", parts).load())
        assert df.rdd.getNumPartitions() == min(parts, 500)
        return sorted((r.id, r.val) for r in df.collect())
    assert rows(1) == rows(8) == rows(17)


def test_variant_json_no_shuffle(spark):
    """VARIANT parse + typed extraction is per-row work: zero exchanges."""
    plan = P.formatted_plan(QUERIES["variant_json"](spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan


def test_funnel_steps_single_event_scan(spark):
    """The three funnel stages must share one window exchange over events —
    the CTE-chain formulation re-scanned events five times."""
    df = QUERIES["funnel_steps"](spark, SF_SMOKE)
    df.collect()
    plan = P.executed_plan(df)
    assert "Window" in plan, plan
    baseline = QUERIES["tumbling_window_agg"](spark, SF_SMOKE)
    baseline.collect()
    per_scan = P.executed_plan(baseline).count("events.parquet")
    assert plan.count("events.parquet") == per_scan, plan


def test_similarity_join_is_tiled_not_cartesian(spark):
    """The exact θ-join must run as tiled equi-joins (Okcan & Riedewald
    M-bucket shape, operators/simjoin.py): no CartesianProduct /
    BroadcastNestedLoopJoin node, a broadcast of the tiny tile relation,
    and a shuffle equi-join that co-locates each (n/B)² tile."""
    plan = P.formatted_plan(QUERIES["similarity_join"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_r10_queries_no_cartesian_no_row_python(spark):
    """Hygiene sweep over the r10-born batch: no CartesianProduct node
    and no row-at-a-time BatchEvalPython anywhere; the BNLJ occurrences
    in the mixture/grid/offset queries are broadcast nested loops over
    literally-tiny frames (1-row max agg, 16 offsets, 30 days, 4
    queries) — exact BNLJ counts flex with AQE across scale factors, so
    the regression bound is a loose cap (≤ 4 per query — sa_repeat_pairs
    legitimately carries two broadcast range-attribution joins that AQE
    can materialize twice in the final plan string) that still
    catches an unbroadcast nested loop over a corpus-sized side (those
    plan as CartesianProduct or blow past the cap)."""
    names = [
        "priority_sample", "temperature_mixture", "suffix_array_rank",
        "longest_repeated_substring", "sa_repeat_pairs", "blocklist_scan",
        "compression_ratio", "hilbert_layout", "bq_asymmetric_rank",
        "seasonal_decompose", "rolling_distinct_users",
        "priority_sample_grouped",
    ]
    for name in names:
        plan = P.formatted_plan(QUERIES[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        got = plan.count("BroadcastNestedLoopJoin")
        assert got <= 4, (name, got)


def test_r11_queries_no_cartesian_no_row_python(spark):
    """Same hygiene sweep over the r11-born batch: dedup_substring_exact
    chains the winnow shuffle into the SA rounds plus two broadcast
    range-attribution joins (the sa_repeat_pairs shape, same loose BNLJ
    cap)."""
    for name in ["dedup_substring_exact"]:
        plan = P.formatted_plan(QUERIES[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        got = plan.count("BroadcastNestedLoopJoin")
        assert got <= 4, (name, got)
