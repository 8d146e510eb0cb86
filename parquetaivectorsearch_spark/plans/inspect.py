"""Physical-plan inspection helpers — the engine's scale-posture assertions.

The reference hand-fuses its physical pipeline (SURVEY.md §4); here Catalyst
owns physical planning, and these helpers make the *required* plan
properties checkable in tests instead of hoped-for:

- filters pushed to the parquet scan (PushedFilters),
- column pruning at the scan (ReadSchema),
- broadcast joins for dimension tables,
- TakeOrderedAndProject for top-k (no global sort),
- map-side partial aggregation before the shuffle.

A plan regression (e.g. a refactor that inserts a UDF before a filter and
silently kills pushdown) fails tests/test_plans.py rather than shipping a
100×-slower scan at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (pruning evidence)."""
    cols: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols.append([c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()])
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df) or \
        "BroadcastNestedLoopJoin" in executed_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in executed_plan(df)


def has_partial_aggregate(df: DataFrame) -> bool:
    """Map-side combine present: a HashAggregate with partial mode below the
    exchange."""
    plan = formatted_plan(df)
    return bool(re.search(r"Functions \[\d+\]: partial_", plan)) or "partial_" in plan
