"""Kafka source/sink wrappers and the JSON wire envelope (SURVEY.md
§2.1 S1-S3/S8, §2.2 K1/K2/K5, §2.3 P4, §2.9 W13).

The reference reads/writes Kafka topics carrying JSON-encoded rows
(``JsonRowDeserializationSchema`` / ``JsonRowSerializationSchema``,
reference ``0_kafka_json_flink.py:35-52``; ``SimpleStringSchema`` +
``json.dumps`` in ``3_ohlc.py:41,69-77``). Here the envelope is a pair
of pure column transforms — ``decode_json_envelope`` /
``encode_json_envelope`` — applied identically to batch and streaming
frames, so the codec is unit-testable without a broker and the broker
wrappers are thin config shims around ``format("kafka")``.

Scale notes:

* Source parallelism = Kafka partitions; ``minPartitions`` can
  oversubscribe so 1000 executors aren't idle behind 32 partitions.
* ``from_json``/``to_json`` are JVM expressions inside whole-stage
  codegen — no Python in the hot path (the reference crossed into
  Python per row).
* The sink pre-serializes to a single ``value`` column; key selection
  (``key_col``) controls Kafka partition routing — keyed by ``product``
  it preserves the reference's per-key ordering contract (G1).

The broker-dependent pieces of this module (connection, offsets) are
option pass-throughs that the sandbox cannot execute; the SEMANTICS
behind them — per-partition offsets, ``startingOffsets``
earliest/latest, checkpoint-beats-start-position, exact offset-range
replay — are executed and pinned broker-free by the segment-log
source in ``sources/kafka_log.py`` (query ``s11``,
``tests/test_kafka_log.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_flink_spark.schemas import TRADE_WIRE_SCHEMA


def decode_json_envelope(
    raw: DataFrame, schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Kafka wire → typed columns: cast bytes to string, parse with an
    explicit schema (S1; the reference's ``fail_on_missing_field``
    strictness maps to ``FAILFAST``-less permissive parse + downstream
    null checks — Spark's streaming source cannot FAILFAST per row
    without poisoning the whole batch, so malformed rows surface as
    nulls that `filter` can route to a dead-letter sink)."""
    return raw.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("r")
    ).select("r.*")


def encode_json_envelope(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Typed columns → Kafka wire: one JSON ``value`` per row (K1), and
    an optional routing ``key``."""
    cols = [F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def trades_from_wire(parsed: DataFrame) -> DataFrame:
    """Wire-form trade (epoch-ms ``timestamp``, reference 3_ohlc.py:28)
    → engine-native form (TIMESTAMP ``ts``; SURVEY.md §1.5)."""
    return parsed.select(
        F.timestamp_millis(F.col("timestamp")).alias("ts"),
        "instrument_id",
        "product",
        "price",
        "qty",
    )


def trades_to_wire(trades: DataFrame) -> DataFrame:
    """Engine-native trade → wire form (epoch ms)."""
    return trades.select(
        F.unix_millis(F.col("ts")).alias("timestamp"),
        "instrument_id",
        "product",
        "price",
        "qty",
    )


def kafka_json_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: T.StructType = TRADE_WIRE_SCHEMA,
    starting_offsets: str = "earliest",
    min_partitions: int | None = None,
) -> DataFrame:
    """S1/S2/S3 — streaming Kafka source with JSON row decoding
    (reference ``FlinkKafkaConsumer`` + ``JsonRowDeserializationSchema``,
    ``3_ohlc.py:32-36``; start-position control ``:58`` /
    ``old/kfk.py:64``)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    return decode_json_envelope(reader.load(), schema)


def kafka_json_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    key_col: str | None = None,
):
    """K1/K2 — streaming Kafka sink publishing each row as a JSON value
    (reference ``FlinkKafkaProducer``, ``0_kafka_json_flink.py:38-45``).
    Returns the started StreamingQuery."""
    wire = encode_json_envelope(df, key_col=key_col)
    return (
        wire.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .start()
    )


def topic_transfer(
    spark: SparkSession,
    bootstrap_servers: str,
    source_topic: str,
    sink_topic: str,
    checkpoint_dir: str,
):
    """P4/W13 — pass-through topic transfer (reference ``1_transfer.py``):
    consume topic A, publish unchanged to topic B. No parse, no shuffle —
    the bytes move kafka→kafka through a narrow plan."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", source_topic)
        .option("startingOffsets", "earliest")
        .load()
        .select("key", "value")
    )
    return (
        raw.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", sink_topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def console_sink(df: DataFrame, output_mode: str = "append", num_rows: int = 20):
    """K3 — console sink (reference ``.print()``)."""
    return (
        df.writeStream.format("console")
        .option("numRows", str(num_rows))
        .outputMode(output_mode)
        .start()
    )


def jdbc_sink(
    df: DataFrame,
    url: str,
    table: str,
    checkpoint_dir: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
):
    """K4 — end-of-window candles → RDBMS (the reference's intended
    Postgres sink, ``old/kfk.py:185-207`` commented / ``7_ohlc.py:96-98``
    print-placeholder): ``foreachBatch`` + batch JDBC write, the standard
    Spark pattern for sinks without a native streaming writer. Each
    micro-batch writes transactionally per partition."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.write.jdbc(url, table, mode=mode, properties=properties or {})

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
