"""Sources and sinks (SURVEY.md §2.1 S1-S9, §2.2 K1-K6)."""

from kafka_flink_spark.sources.fixtures import load_table, load_tables, trades_view
from kafka_flink_spark.sources.kafka_io import (
    console_sink,
    decode_json_envelope,
    encode_json_envelope,
    jdbc_sink,
    kafka_json_sink,
    kafka_json_source,
    topic_transfer,
    trades_from_wire,
    trades_to_wire,
)

__all__ = [
    "console_sink",
    "decode_json_envelope",
    "encode_json_envelope",
    "jdbc_sink",
    "kafka_json_sink",
    "kafka_json_source",
    "load_table",
    "load_tables",
    "topic_transfer",
    "trades_from_wire",
    "trades_to_wire",
    "trades_view",
]
