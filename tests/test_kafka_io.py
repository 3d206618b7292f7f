"""Kafka I/O codec tests — broker-free (SURVEY.md §7.2.4: the JSON
envelope functions are the connector's entire data path; broker
wrappers only add options, and are validated structurally here)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from kafka_flink_spark.schemas import TOY_SCHEMA, TRADE_WIRE_SCHEMA
from kafka_flink_spark.sources.kafka_io import (
    decode_json_envelope,
    encode_json_envelope,
    trades_from_wire,
    trades_to_wire,
)


def test_toy_roundtrip(spark):
    """0_kafka_json_flink.py semantics: 2-field rows survive the wire."""
    df = spark.createDataFrame([(1, "hi"), (2, "hello")], TOY_SCHEMA)
    wire = encode_json_envelope(df)
    assert wire.columns == ["value"]
    back = decode_json_envelope(wire, TOY_SCHEMA)
    assert sorted(back.collect()) == sorted(df.collect())


def test_envelope_emits_valid_json_with_key(spark):
    df = spark.createDataFrame([(7, "x")], TOY_SCHEMA)
    row = encode_json_envelope(df, key_col="id").collect()[0]
    assert row["key"] == "7"
    assert json.loads(row["value"]) == {"id": 7, "msg": "x"}


def test_trade_wire_conversion_roundtrip(spark):
    """Epoch-ms wire timestamp ↔ engine TIMESTAMP (P6, SURVEY.md §1.5)."""
    wire = spark.createDataFrame(
        [(1704103200123, "I1", "A", 10.5, 3)], TRADE_WIRE_SCHEMA
    )
    native = trades_from_wire(wire)
    assert [f.dataType.simpleString() for f in native.schema.fields][0] == "timestamp"
    back = trades_to_wire(native)
    assert back.collect() == wire.collect()


def test_malformed_rows_surface_as_nulls(spark):
    """A malformed wire value yields a null-columns row (dead-letter
    routing point), not a query failure."""
    raw = spark.createDataFrame([("{bad json",), ('{"id": 3, "msg": "ok"}',)], "value string")
    back = decode_json_envelope(raw, TOY_SCHEMA)
    rows = back.collect()
    assert len(rows) == 2
    ok = [r for r in rows if r["id"] is not None]
    assert len(ok) == 1 and ok[0]["msg"] == "ok"


def test_kafka_source_sink_wrappers_build(spark):
    """Structural check: the broker wrappers assemble the kafka format
    plan without contacting a broker (start() is never called here for
    the sink; the source builds its logical plan lazily). Skipped when
    the spark-sql-kafka connector jar isn't deployed (this container);
    the JSON data path is still fully covered by the codec tests."""
    import pytest

    from kafka_flink_spark.sources.kafka_io import kafka_json_source

    try:
        df = kafka_json_source(spark, "localhost:9092", "trades", min_partitions=64)
    except Exception as e:  # AnalysisException: Failed to find data source: kafka
        if "Failed to find data source: kafka" in str(e):
            pytest.skip("spark-sql-kafka connector not deployed in this environment")
        raise
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [f.name for f in TRADE_WIRE_SCHEMA.fields]


def test_trade_gen_datasource_parallelism_invariant(spark):
    """The trade_gen Python DataSource yields the identical relation at
    any partition count (fields derive from the global seq, not the
    split), and splits cover the row range exactly once."""
    from kafka_flink_spark.sources.trade_gen import register_trade_gen

    register_trade_gen(spark)

    def rows(parts):
        df = (
            spark.read.format("trade_gen")
            .option("rows", "500")
            .option("partitions", str(parts))
            .load()
        )
        return sorted(tuple(r) for r in df.collect())

    a, b = rows(2), rows(7)
    assert len(a) == 500
    assert a == b
