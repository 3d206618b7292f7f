"""Live-Kafka integration check — the 15-minute parity run for a real
broker.

Everything in this repo's Kafka surface except the TCP connection is
executed broker-free in CI (the JSON envelope codec is pure columns,
offset/checkpoint/partition-discovery semantics are pinned by the
segment-log source, `s11`/`tests/test_kafka_log.py`). This script is
the remaining step the sandbox cannot run: the same wrappers against
a REAL broker. Run it once against your cluster before switching
production traffic; every check prints PASS/FAIL and the script exits
non-zero on the first failure.

Usage:
    export KAFKA_BOOTSTRAP=broker1:9092            # required
    spark-submit --packages \\
        org.apache.spark:spark-sql-kafka-0-10_2.13:<your-spark-version> \\
        examples/kafka_broker_roundtrip.py [sf_dir]

Checks, in order (mirroring the reference's topology,
0_kafka_json_flink.py / 1_transfer.py / 3_ohlc.py):

1. PRODUCE  — fixture trades → JSON envelope → topic A (batch write,
   keyed by product so per-key order is preserved within partitions).
2. CONSUME + AGGREGATE — streaming read of topic A from earliest →
   decode → tumbling OHLCV (availableNow), compared candle-for-candle
   against the batch answer computed directly from the fixture: the
   broker round-trip must be value-lossless (epoch-ms wire precision
   is part of the contract, trades_to_wire/trades_from_wire).
3. TRANSFER — topic A → topic B byte pass-through (1_transfer.py),
   then count parity A == B.
4. START-FROM-LATEST — a latest-offsets consumer started after the
   backlog sees zero backlog rows (S3's contract).
5. RESUME — the OHLCV query restarted on the same checkpoint after
   new rows are produced processes ONLY the new rows (offset commit
   beats startingOffsets, the kafka_log-pinned rule, now live).

Topics are created with unique suffixes and small retention; clean up
with the printed `kafka-topics.sh --delete` lines afterwards.
"""

from __future__ import annotations

import os
import sys
import time
import uuid

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kafka_flink_spark.operators.candles import ohlcv  # noqa: E402
from kafka_flink_spark.sources.fixtures import trades_view  # noqa: E402
from kafka_flink_spark.sources.kafka_io import (  # noqa: E402
    encode_json_envelope,
    kafka_json_source,
    topic_transfer,
    trades_from_wire,
    trades_to_wire,
)
from kafka_flink_spark.streaming.candles_stream import run_available_now  # noqa: E402

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")
if not BOOTSTRAP:
    sys.exit(
        "KAFKA_BOOTSTRAP is not set — this check needs a real broker. "
        "See the module docstring."
    )

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
RUN = uuid.uuid4().hex[:8]
TOPIC_A, TOPIC_B = f"trades_{RUN}", f"transfer_{RUN}"
_failures = 0


def check(name: str, ok: bool, detail: str = "") -> None:
    global _failures
    print(f"[{'PASS' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    if not ok:
        _failures += 1
        sys.exit(1)


def main() -> None:
    spark = (
        SparkSession.builder.appName("kafka-broker-roundtrip")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ckpt_root = f"/tmp/kafka_roundtrip_{RUN}"

    trades = trades_view(spark, SF_DIR).select(
        "ts", "instrument_id", "product", "price", "qty"
    )
    n_src = trades.count()

    # 1. PRODUCE: fixture -> wire JSON -> topic A (keyed by product).
    encode_json_envelope(trades_to_wire(trades), key_col="product").write.format(
        "kafka"
    ).option("kafka.bootstrap.servers", BOOTSTRAP).option("topic", TOPIC_A).save()
    check("produce fixture to topic A", True, f"{n_src} rows -> {TOPIC_A}")

    # 2. CONSUME + AGGREGATE: earliest-offsets stream -> OHLCV == batch.
    stream = trades_from_wire(
        kafka_json_source(spark, BOOTSTRAP, TOPIC_A, starting_offsets="earliest")
    )
    # complete mode: the memory sink holds the final full candle set
    # regardless of how the broker read split into micro-batches. The
    # wire format is epoch-MS (the reference's contract), so the batch
    # reference aggregates the same ms-truncated timestamps — the
    # parity being checked is the BROKER hop, not float/time codecs
    # (those are pinned broker-free by test_trade_wire_conversion).
    streamed = run_available_now(
        ohlcv(stream.withWatermark("ts", "0 seconds"), "1 hour"), "complete"
    )
    batch = ohlcv(trades_from_wire(trades_to_wire(trades)), "1 hour")
    last = streamed.select(batch.columns)
    diff = last.exceptAll(batch).count() + batch.exceptAll(last).count()
    check(
        "streamed OHLCV == batch OHLCV after broker round-trip",
        diff == 0,
        f"symmetric diff {diff} candle rows",
    )

    # 3. TRANSFER: topic A -> topic B, byte pass-through.
    q = topic_transfer(spark, BOOTSTRAP, TOPIC_A, TOPIC_B, f"{ckpt_root}/transfer")
    while q.isActive and q.status["isDataAvailable"]:
        time.sleep(1)
    time.sleep(3)
    q.stop()
    n_b = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", TOPIC_B)
        .option("startingOffsets", "earliest")
        .load()
        .count()
    )
    check("topic transfer A -> B count parity", n_b == n_src, f"{n_b} vs {n_src}")

    # 4. START-FROM-LATEST sees no backlog.
    latest = kafka_json_source(spark, BOOTSTRAP, TOPIC_A, starting_offsets="latest")
    n_latest = run_available_now(latest, "append").count()
    check("latest-offsets consumer sees zero backlog", n_latest == 0, f"{n_latest}")

    # 5. RESUME: checkpointed query reprocesses nothing, new rows only.
    ckpt = f"{ckpt_root}/resume"
    s1 = trades_from_wire(
        kafka_json_source(spark, BOOTSTRAP, TOPIC_A, starting_offsets="earliest")
    )
    q1 = (
        s1.writeStream.format("memory").queryName(f"resume_a_{RUN}")
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q1.awaitTermination()
    first = spark.table(f"resume_a_{RUN}").count()
    extra = trades.limit(50)
    encode_json_envelope(trades_to_wire(extra), key_col="product").write.format(
        "kafka"
    ).option("kafka.bootstrap.servers", BOOTSTRAP).option("topic", TOPIC_A).save()
    q2 = (
        s1.writeStream.format("memory").queryName(f"resume_b_{RUN}")
        .option("checkpointLocation", ckpt).outputMode("append")
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    second = spark.table(f"resume_b_{RUN}").count()
    check(
        "checkpoint resume processes only new rows",
        first == n_src and second == 50,
        f"first run {first}/{n_src}, resumed run {second}/50",
    )

    print(f"\nAll live-broker checks passed. Cleanup:\n"
          f"  kafka-topics.sh --bootstrap-server {BOOTSTRAP} --delete --topic {TOPIC_A}\n"
          f"  kafka-topics.sh --bootstrap-server {BOOTSTRAP} --delete --topic {TOPIC_B}")


if __name__ == "__main__":
    main()
