"""Sources and sinks (SURVEY.md §2.1 S1-S9, §2.2 K1-K6)."""

from kafka_flink_spark.sources.fixtures import load_table, load_tables, trades_view
from kafka_flink_spark.sources.kafka_log import (
    append_segment,
    end_offset,
    register_kafka_log,
    write_trade_log,
)
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
    "append_segment",
    "console_sink",
    "decode_json_envelope",
    "encode_json_envelope",
    "jdbc_sink",
    "kafka_json_sink",
    "kafka_json_source",
    "end_offset",
    "load_table",
    "load_tables",
    "register_kafka_log",
    "topic_transfer",
    "trades_from_wire",
    "trades_to_wire",
    "trades_view",
    "write_trade_log",
]
