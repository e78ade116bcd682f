"""Plan inspection and assertion helpers."""

from pontem_spark.plans.inspect import (
    physical_plan,
    optimized_plan,
    pushed_filters,
    read_schema_columns,
    count_exchanges,
    has_node,
)

__all__ = [
    "physical_plan",
    "optimized_plan",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "has_node",
]
