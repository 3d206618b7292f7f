"""Sources and sinks (SURVEY.md §2.1 S1-S9, §2.2 K1-K6)."""

from kafka_flink_spark.sources.fixtures import load_table, load_tables, trades_view

__all__ = ["load_table", "load_tables", "trades_view"]
