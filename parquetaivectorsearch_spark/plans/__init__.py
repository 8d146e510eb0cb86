from parquetaivectorsearch_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    has_broadcast_join,
    has_partial_aggregate,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "has_broadcast_join",
    "has_partial_aggregate",
    "has_take_ordered",
    "pushed_filters",
    "read_schema_columns",
]
