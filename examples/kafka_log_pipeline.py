"""The reference's flagship pipeline end-to-end, broker-free:

    producer → topic (partitioned log) → JSON decode → streaming OHLCV

``sources/kafka_log.py`` stands in for the broker: a topic is a
directory of sealed JSONL segments (flat, or ``partition=N`` dirs),
read as ``(partition, offset, value)`` with real Kafka semantics —
``startingOffsets`` earliest/latest, per-partition checkpointed
offsets, executor-parallel splits (one per partition per
micro-batch), exact offset-range replay. Swap the two ``format(
"kafka_log")`` reads for ``sources/kafka_io.kafka_json_source`` to
run the identical pipeline against a real broker.

    python examples/kafka_log_pipeline.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from kafka_flink_spark.operators.candles import ohlcv  # noqa: E402
from kafka_flink_spark.session import get_session  # noqa: E402
from kafka_flink_spark.sources.kafka_io import decode_json_envelope  # noqa: E402
from kafka_flink_spark.sources.kafka_log import (  # noqa: E402
    register_kafka_log,
    write_trade_log,
)
from kafka_flink_spark.streaming.candles_stream import (  # noqa: E402
    ohlcv_stream,
    run_available_now,
)

WIRE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("instrument_id", T.StringType()),
        T.StructField("product", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("qty", T.LongType()),
    ]
)


def to_trades(wire):
    """Kafka wire rows → typed trades (the S1 decode path)."""
    return decode_json_envelope(wire, WIRE_SCHEMA).select(
        F.timestamp_millis("ts_ms").alias("ts"), "product", "price", "qty", "seq"
    )


def main() -> None:
    spark = get_session("kafka-log-pipeline-example")
    register_kafka_log(spark)

    with tempfile.TemporaryDirectory(prefix="example_topic_") as tmp:
        topic = f"{tmp}/trades"

        # Producer (the reference's old/gen.py, as a deterministic log):
        # 20k JSON trade envelopes over 4 topic partitions.
        write_trade_log(topic, 20_000, segment_rows=2_500, n_partitions=4)

        # Streaming consumer from earliest: 1-minute OHLCV candles.
        stream = (
            spark.readStream.format("kafka_log")
            .option("path", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        candles = run_available_now(ohlcv_stream(to_trades(stream), "1 minute"), "update")
        print(f"streamed candles: {candles.count()}")
        candles.orderBy("window_start", "product").show(5, truncate=False)

        # Batch over the same topic gives the identical answer — the
        # Structured Streaming equivalence the whole engine rests on.
        batch = ohlcv(
            to_trades(spark.read.format("kafka_log").option("path", topic).load()),
            "1 minute",
            seq_col="seq",
        )
        n_stream, n_batch = candles.count(), batch.count()
        assert n_stream == n_batch, (n_stream, n_batch)
        print(f"batch candles: {n_batch} — stream == batch ✔")

    spark.stop()


if __name__ == "__main__":
    main()
