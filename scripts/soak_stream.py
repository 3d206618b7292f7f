"""Resident streaming soak (VERDICT r8 task 3).

Every streaming query in the suite runs as a short availableNow
replay; this script instead keeps TWO resident jobs up for >= 30
minutes of continuous synthetic load on the RocksDB state store (the
cluster default), sampling state-store and progress metrics the whole
time, and asserts the two properties a replay can't show:

* the event-time watermark advances monotonically for the whole soak
  (no stall — the failure mode of a wedged stateful operator);
* state size PLATEAUS instead of growing with arrivals — for the
  OHLCV job via watermark eviction of closed windows, for the dedup
  job via the bucket_cap bounded-state contract over a finite doc
  universe (the uncapped w31 variant is BY CONTRACT linear in
  arrivals — it indexes all history — so the resident configuration
  is the capped one, exactly like d13 in batch).

Jobs:

1. ohlcv: rate source at --ohlcv-rate ev/s (default 100k, 2000 keys —
   the reference's design envelope x50) -> 1-minute tumbling OHLCV
   with a 30 s watermark (streaming/candles_stream.ohlcv_stream),
   append mode to a noop sink. Windows close ~90 s after they open,
   so state must stay at (keys x open-windows), not grow.
2. dedup: rate source at --dedup-rate docs/s (default 5k) -> 20-token
   synthetic text from a 50k-doc universe (pure JVM expressions) ->
   streaming SimHash near-dup index (streaming/dedup_stream.
   simhash_dedup_stream, bucket_cap=16), update mode to a noop sink.
   Once the universe has been seen, every bucket is full and state is
   flat.

Usage: python scripts/soak_stream.py [--secs 1800] [--out STREAM_SOAK.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
KEEP_METRIC = ("SstFileSize", "MemoryUsage", "NumKeys", "numKeys", "PinnedBlocks")


def sample(q) -> dict | None:
    p = q.lastProgress
    if p is None:
        return None
    ops = []
    for so in p.get("stateOperators", []):
        ops.append(
            {
                "operator": so.get("operatorName"),
                "numRowsTotal": so.get("numRowsTotal"),
                "numRowsUpdated": so.get("numRowsUpdated"),
                "memoryUsedBytes": so.get("memoryUsedBytes"),
                "custom": {
                    k: v
                    for k, v in (so.get("customMetrics") or {}).items()
                    if any(s in k for s in KEEP_METRIC)
                },
            }
        )
    return {
        "batchId": p.get("batchId"),
        "inputRowsPerSecond": p.get("inputRowsPerSecond"),
        "processedRowsPerSecond": p.get("processedRowsPerSecond"),
        "numInputRows": p.get("numInputRows"),
        "watermark": (p.get("eventTime") or {}).get("watermark"),
        "stateOperators": ops,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=int, default=1800)
    ap.add_argument("--ohlcv-rate", type=int, default=100_000)
    ap.add_argument("--dedup-rate", type=int, default=5_000)
    ap.add_argument("--doc-universe", type=int, default=50_000)
    ap.add_argument("--sample-every", type=int, default=15)
    ap.add_argument("--out", default="STREAM_SOAK.json")
    ap.add_argument(
        "--with-timers",
        action="store_true",
        help="add a third resident job: the event-time-timer candle "
        "path (streaming/stateful.running_candles_event_timers — "
        "w30's operator), 1-minute windows at --timer-rate ev/s; "
        "state must plateau at one open window per key and timers "
        "must keep flushing finals as the watermark advances",
    )
    ap.add_argument("--timer-rate", type=int, default=20_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.streaming.candles_stream import ohlcv_stream
    from kafka_flink_spark.streaming.dedup_stream import simhash_dedup_stream

    spark = get_session("stream-soak")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )

    ckpt = tempfile.mkdtemp(prefix="soak_ckpt_")

    # --- job 1: OHLCV over a 100k ev/s synthetic trade stream -------
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(args.ohlcv_rate))
        .load()
    )
    trades = rate.select(
        F.col("timestamp").alias("ts"),
        F.concat(F.lit("Type_"), (F.col("value") % 2000).cast("string")).alias(
            "product"
        ),
        (100.0 + (F.col("value") % 10_000) / 100.0).alias("price"),
        (F.col("value") % 97 + 1).cast("long").alias("qty"),
        F.col("value").alias("seq"),
    )
    candles = ohlcv_stream(trades, "1 minute", "30 seconds")
    q_ohlcv = (
        candles.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", f"{ckpt}/ohlcv")
        .queryName("soak_ohlcv")
        .start()
    )

    # --- job 2: streaming SimHash dedup over a finite doc universe --
    drate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(args.dedup_rate))
        .load()
    )
    dk = (F.col("value") % args.doc_universe).cast("string")
    docs = drate.select(
        F.col("value").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(20)),
                lambda i: F.substring(
                    F.md5(F.concat(F.lit("tok:"), dk, F.lit(":"), i.cast("string"))),
                    1,
                    8,
                ),
            ),
        ).alias("text"),
    )
    q_dedup = (
        simhash_dedup_stream(docs, bucket_cap=16)
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", f"{ckpt}/dedup")
        .queryName("soak_dedup")
        .start()
    )

    # --- job 3 (optional): event-time timers (w30's operator) -------
    queries = {"ohlcv": q_ohlcv, "dedup": q_dedup}
    if args.with_timers:
        from kafka_flink_spark.streaming.stateful import (
            running_candles_event_timers,
        )

        trate = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(args.timer_rate))
            .load()
        )
        ttrades = trate.select(
            F.col("timestamp").alias("ts"),
            F.concat(F.lit("T_"), (F.col("value") % 2000).cast("string")).alias(
                "product"
            ),
            (100.0 + (F.col("value") % 10_000) / 100.0).alias("price"),
            (F.col("value") % 97 + 1).cast("long").alias("qty"),
            F.col("value").alias("seq"),
        )
        queries["timers"] = (
            running_candles_event_timers(
                ttrades, window_minutes=1, watermark_delay="30 seconds"
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", f"{ckpt}/timers")
            .queryName("soak_timers")
            .start()
        )

    t0 = time.time()
    samples: list[dict] = []
    while time.time() - t0 < args.secs:
        time.sleep(args.sample_every)
        for q in queries.values():
            if q.exception() is not None:
                print(f"FATAL {q.name}: {q.exception()}", file=sys.stderr)
                sys.exit(2)
        row = {"t": round(time.time() - t0, 1)}
        for name, q in queries.items():
            row[name] = sample(q)
        samples.append(row)
        print(json.dumps(row), file=sys.stderr)

    for q in queries.values():
        q.stop()

    # ---------------- assertions over the timeline ------------------
    def series(job: str, fn):
        return [fn(s[job]) for s in samples if s.get(job) is not None]

    failures: list[str] = []

    wm = [w for w in series("ohlcv", lambda p: p["watermark"]) if w]
    if not wm or any(b < a for a, b in zip(wm, wm[1:])):
        failures.append("ohlcv watermark not monotone non-decreasing")
    if len(set(wm)) < max(3, len(wm) // 4):
        failures.append(f"ohlcv watermark barely advanced: {len(set(wm))} distinct")

    # plateau needs >= 8 samples; a short smoke run (--secs 60) can't
    # have them, so only a soak that REQUESTED enough samples fails on
    # their absence
    plateau_expected = args.secs // args.sample_every >= 8

    def plateau(job: str, label: str):
        rows = series(
            job, lambda p: sum(op["numRowsTotal"] or 0 for op in p["stateOperators"])
        )
        if len(rows) < 8:
            if plateau_expected:
                failures.append(f"{label}: too few samples ({len(rows)})")
            else:
                print(f"{label}: plateau check skipped (smoke run)", file=sys.stderr)
            return rows
        q3 = rows[3 * len(rows) // 4 :]  # last quarter
        q2 = rows[len(rows) // 2 : 3 * len(rows) // 4]  # third quarter
        if max(q2) > 0 and max(q3) > 1.25 * max(q2):
            failures.append(
                f"{label} state still growing: maxQ3={max(q3)} vs maxQ2={max(q2)}"
            )
        return rows

    ohlcv_rows = plateau("ohlcv", "ohlcv")
    dedup_rows = plateau("dedup", "dedup")
    timer_rows: list[int] = []
    if args.with_timers:
        timer_rows = plateau("timers", "timers")
        twm = [w for w in series("timers", lambda p: p["watermark"]) if w]
        if not twm or any(b < a for a, b in zip(twm, twm[1:])):
            failures.append("timers watermark not monotone non-decreasing")

    proc = series("ohlcv", lambda p: p["processedRowsPerSecond"] or 0.0)
    steady = proc[len(proc) // 4 :]
    mean_rate = sum(steady) / max(1, len(steady))
    # like plateau: a smoke run's samples are all JVM warmup, so the
    # steady-state rate floor only binds on a real soak
    if plateau_expected and mean_rate < 0.9 * args.ohlcv_rate:
        failures.append(
            f"ohlcv steady-state rate {mean_rate:.0f} < 90% of {args.ohlcv_rate}"
        )

    summary = {
        "soak_secs": round(time.time() - t0, 1),
        "n_samples": len(samples),
        "ohlcv_rate_target": args.ohlcv_rate,
        "ohlcv_processed_rows_per_s_mean": round(mean_rate, 1),
        "ohlcv_state_rows_first_last": [
            ohlcv_rows[0] if ohlcv_rows else None,
            ohlcv_rows[-1] if ohlcv_rows else None,
        ],
        "ohlcv_state_rows_max": max(ohlcv_rows) if ohlcv_rows else None,
        "dedup_state_rows_first_last": [
            dedup_rows[0] if dedup_rows else None,
            dedup_rows[-1] if dedup_rows else None,
        ],
        "dedup_state_rows_max": max(dedup_rows) if dedup_rows else None,
        "watermark_first_last": [wm[0], wm[-1]] if wm else None,
        "ohlcv_final_batch": samples[-1]["ohlcv"]["batchId"] if samples else None,
        "dedup_final_batch": samples[-1]["dedup"]["batchId"] if samples else None,
        "timers_state_rows_first_last": (
            [timer_rows[0], timer_rows[-1]] if timer_rows else None
        ),
        "timers_state_rows_max": max(timer_rows) if timer_rows else None,
        "timers_final_batch": (
            samples[-1]["timers"]["batchId"]
            if samples and args.with_timers
            else None
        ),
        "failures": failures,
        "samples": samples,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "samples"}, indent=1))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
