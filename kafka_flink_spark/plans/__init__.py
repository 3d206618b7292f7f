"""Plan inspection (the performance gate's toolkit)."""

from kafka_flink_spark.plans.inspect import (
    count_exchanges,
    has_broadcast_join,
    plan_string,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_count,
)

__all__ = [
    "count_exchanges",
    "has_broadcast_join",
    "plan_string",
    "pushed_filters",
    "read_schema_columns",
    "wholestage_codegen_count",
]
