"""Plan-shape assertions for the composed TPC-H-style queries: the 100 TB
posture (broadcast dims, pushdown, partition pruning, partial top-k) must be
visible in the physical plan, not just hoped for."""

from __future__ import annotations

import re

from parquetaivectorsearch_spark import plans as P
from parquetaivectorsearch_spark import queries as Q
from tests.conftest import SF_CORRECT, SF_SMOKE

QUERIES = Q.all_queries()


def test_pricing_summary_filter_pushed_and_partial_agg(spark):
    df = QUERIES["pricing_summary"](spark, SF_SMOKE)
    assert any("l_shipdate" in p for p in P.pushed_filters(df))
    assert P.has_partial_aggregate(df)


def test_regional_revenue_broadcasts_dims(spark):
    """The join tree must broadcast the dim side — no shuffle for
    region/nation/customer; and the region filter reaches its scan."""
    df = QUERIES["regional_revenue"](spark, SF_SMOKE)
    plan = P.formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert any("r_name" in p for p in P.pushed_filters(df))


def test_top_revenue_orders_is_take_ordered(spark):
    df = QUERIES["top_revenue_orders"](spark, SF_SMOKE)
    assert P.has_take_ordered(df)
    assert any("c_mktsegment" in p for p in P.pushed_filters(df))


def test_partitioned_read_prunes_partitions(spark):
    """The partitioned-layout read must carry PartitionFilters on `day` and
    scan only the 3 selected day-directories."""
    df = QUERIES["partitioned_write_prune"](spark, SF_CORRECT)
    plan = P.formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan


def test_centroid_shuffles_once(spark):
    """posexplode → partial avg → one exchange on (label, pos): exactly one
    shuffle in the whole plan."""
    df = QUERIES["centroid_per_label"](spark, SF_SMOKE)
    plan = P.formatted_plan(df)
    # formatted plans list each node twice (tree + detail) — count the
    # numbered detail entries only.
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan


def test_knn_filtered_pushes_label_predicate(spark):
    """Pre-filtered vector search: the label predicate must reach the scan
    (PushedFilters), so distance math runs on the filtered subset only."""
    df = QUERIES["knn_filtered"](spark, SF_SMOKE)
    assert any("label" in p for p in P.pushed_filters(df))
    assert P.has_take_ordered(df)


def test_exists_subquery_becomes_semi_join(spark):
    """Catalyst must decorrelate EXISTS into a semi join — no subquery
    re-execution per row."""
    plan = P.formatted_plan(QUERIES["exists_subquery"](spark, SF_SMOKE))
    assert "LeftSemi" in plan, plan


def test_in_subquery_broadcasts_dim(spark):
    df = QUERIES["in_subquery"](spark, SF_SMOKE)
    plan = P.formatted_plan(df)
    assert "LeftSemi" in plan and "Broadcast" in plan, plan
