"""Streaming-envelope benchmark test (BASELINE.md: the reference's
design load is ~2 000 ev/s across ~2 000 product keys on 1-minute
tumbling windows, derived from old/gen.py:13,36). The engine must
sustain that with wide margin on local hardware — this test replays
200 000 synthetic trade events through the full streaming OHLCV
pipeline and asserts ≥ 20 000 ev/s (10× the reference envelope)."""

from __future__ import annotations

import shutil
import tempfile
import time

from pyspark.sql import functions as F

from kafka_flink_spark.streaming.candles_stream import ohlcv_stream, run_available_now

N_EVENTS = 200_000
N_KEYS = 2_000


def test_streaming_ohlcv_sustains_reference_envelope(spark):
    tmpdir = tempfile.mkdtemp(prefix="throughput_")
    try:
        src = f"{tmpdir}/src"
        # 200k events over a 100-minute span, 2 000 keys (old/gen.py shape:
        # price ∈ [1,1000], qty ∈ [1,100]).
        (
            spark.range(N_EVENTS)
            .select(
                F.timestamp_millis(
                    F.lit(1704067200000) + (F.col("id") * 30)  # ~33 ev/s/key stream
                ).alias("ts"),
                F.concat(F.lit("Instrument_"), (F.col("id") % 100)).alias("instrument_id"),
                F.concat(F.lit("Product_"), (F.col("id") % N_KEYS)).alias("product"),
                (F.pmod(F.col("id") * 2654435761, F.lit(1000)) + 1).cast("double").alias("price"),
                (F.pmod(F.col("id"), F.lit(100)) + 1).cast("long").alias("qty"),
                F.col("id").alias("seq"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(src)
        )
        schema = (
            "ts timestamp, instrument_id string, product string, "
            "price double, qty long, seq long"
        )
        stream = spark.readStream.schema(schema).parquet(src)
        t0 = time.perf_counter()
        out = run_available_now(ohlcv_stream(stream, "1 minute"), "update")
        n_windows = out.count()
        elapsed = time.perf_counter() - t0
        rate = N_EVENTS / elapsed
        # 100 minutes × up to 2000 products per minute-bucket
        assert n_windows > 0
        assert rate >= 20_000, f"streaming OHLCV rate {rate:.0f} ev/s < 20k floor ({elapsed:.1f}s)"
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
