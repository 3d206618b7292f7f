"""I/O codec queries: the Kafka JSON wire envelope exercised without a
broker (SURVEY.md §2.1 S1 / §2.2 K1 — the encode/decode column
transforms ARE the connector's data path; the broker wrapper adds only
options)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_flink_spark.sources.fixtures import TRADES_ORACLE_CTE, trades_view
from kafka_flink_spark.sources.kafka_io import encode_json_envelope
from kafka_flink_spark.suite import register

_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("instrument_id", T.StringType()),
        T.StructField("product", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.LongType()),
        T.StructField("seq", T.LongType()),
    ]
)


@register(
    "k1_json_envelope_roundtrip",
    oracle=f"""
WITH {TRADES_ORACLE_CTE}
SELECT product AS key,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       instrument_id, product, price, qty, seq
FROM trades
""",
    doc="S1/K1: Kafka JSON wire envelope round-trip — typed rows → "
    "to_json value (+ routing key) → from_json back to typed rows, "
    "losslessly (ts carried as epoch µs on the wire; reference "
    "JsonRowSerializationSchema/JsonRowDeserializationSchema, "
    "0_kafka_json_flink.py:35-52). Entirely JVM expressions inside "
    "codegen — no Python, no shuffle.",
)
def k1_json_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    trades = trades_view(spark, sf_dir)
    wire_rows = trades.select(
        F.unix_micros("ts").alias("ts_us"),
        "instrument_id",
        "product",
        "price",
        "qty",
        "seq",
    )
    enveloped = encode_json_envelope(wire_rows, key_col="product")
    return enveloped.select(
        "key", F.from_json(F.col("value").cast("string"), _WIRE_SCHEMA).alias("r")
    ).select(
        "key",
        F.date_format(F.timestamp_micros("r.ts_us"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "r.instrument_id",
        "r.product",
        "r.price",
        "r.qty",
        "r.seq",
    )
