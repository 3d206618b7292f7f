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


def _load_jsonl(path: str) -> list[dict]:
    rows = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    except FileNotFoundError:
        pass
    return rows


def orchestrate_kill_restart(args) -> int:
    """VERDICT r9 task 3: crash-restart a RESIDENT soak mid-stream.

    Phase 1 runs the soak in a CHILD PROCESS GROUP (python driver +
    local-mode JVM) and SIGKILLs the whole group at --kill-at seconds
    — a real crash: at 100k ev/s micro-batches run back-to-back, so
    the kill lands mid-micro-batch and nothing flushes, commits, or
    runs shutdown hooks. Phase 2 restarts the identical job from the
    same RocksDB changelog checkpoint for the remaining --secs.

    Cross-phase assertions (the ones a single uninterrupted soak
    can't show):

    * watermark RESUMES from the checkpointed value (phase-2 first
      watermark >= phase-1 last) and keeps advancing monotonically;
    * state restores from the changelog rather than resetting (dedup
      first phase-2 state-row count ~= phase-1 last) and returns to
      the phase-1 plateau (continuity, no post-restart leak);
    * exactly-once finals: the OHLCV job writes append-mode finals to
      a parquet file sink; after the crash+restart the committed view
      (_spark_metadata log — orphan part-files from the killed
      attempt are excluded) must hold exactly one row per
      (product, window) over a GAPLESS 1-minute window sequence with
      every window complete (all --keys products). Because the rate
      source is deterministic and replayable from its checkpointed
      offsets, this grid equality IS equality with an uninterrupted
      control run — no dup, no loss.
    """
    import os
    import signal
    import subprocess

    ckpt = args.ckpt_dir or tempfile.mkdtemp(prefix="soak_kill_ckpt_")
    finals = args.finals_dir or tempfile.mkdtemp(prefix="soak_kill_finals_")
    base = args.out + ".phase{n}"
    restart_secs = max(60, args.secs - args.kill_at)

    def child(phase: int, secs: int) -> subprocess.Popen:
        cmd = [
            sys.executable,
            os.path.abspath(__file__),
            "--secs", str(secs),
            "--ohlcv-rate", str(args.ohlcv_rate),
            "--dedup-rate", str(args.dedup_rate),
            "--doc-universe", str(args.doc_universe),
            "--sample-every", str(args.sample_every),
            "--ckpt-dir", ckpt,
            "--finals-dir", finals,
            "--samples-jsonl", base.format(n=phase) + ".jsonl",
            "--out", base.format(n=phase) + ".json",
            "--no-assert",
        ]
        return subprocess.Popen(cmd, start_new_session=True, cwd=os.getcwd())

    for phase in (1, 2):  # stale JSONL from a prior run would append
        for ext in (".jsonl", ".json"):
            try:
                os.remove(base.format(n=phase) + ext)
            except FileNotFoundError:
                pass

    print(f"[kill-restart] phase 1: soak {args.kill_at}s then SIGKILL group")
    p1 = child(1, args.kill_at + 3600)  # never finishes on its own
    t0 = time.time()
    while time.time() - t0 < args.kill_at:
        if p1.poll() is not None:
            print(f"[kill-restart] phase 1 died early rc={p1.returncode}")
            return 2
        time.sleep(1)
    os.killpg(p1.pid, signal.SIGKILL)  # python + JVM, uncommitted
    p1.wait()
    kill_wall = time.time()
    print(f"[kill-restart] killed pgid {p1.pid} at t={args.kill_at}s; restarting")

    p2 = child(2, restart_secs)
    t_relaunch = time.time()
    rc2 = p2.wait()
    if rc2 != 0:
        print(f"[kill-restart] phase 2 exited rc={rc2}")
        return 2

    s1 = _load_jsonl(base.format(n=1) + ".jsonl")
    s2 = _load_jsonl(base.format(n=2) + ".jsonl")
    downtime = round(
        t_relaunch - kill_wall + (s2[0]["t"] - args.sample_every if s2 else 0), 1
    )
    failures: list[str] = []

    def series(samples, job, fn):
        out = []
        for s in samples:
            p = s.get(job)
            if p is not None:
                v = fn(p)
                if v is not None:
                    out.append(v)
        return out

    def state_rows(p):
        return sum(op["numRowsTotal"] or 0 for op in p["stateOperators"])

    if len(s1) < 4 or len(s2) < 4:
        failures.append(f"too few samples: phase1={len(s1)} phase2={len(s2)}")

    # 1. watermark resumption + continued monotone advance
    wm1 = series(s1, "ohlcv", lambda p: p["watermark"])
    wm2 = series(s2, "ohlcv", lambda p: p["watermark"])
    wm1 = [w for w in wm1 if w]
    wm2 = [w for w in wm2 if w]
    if not wm1 or not wm2:
        failures.append("missing watermarks in one phase")
    else:
        if wm2[0] < wm1[-1]:
            failures.append(
                f"watermark regressed across restart: {wm2[0]} < {wm1[-1]}"
            )
        if any(b < a for a, b in zip(wm2, wm2[1:])):
            failures.append("phase-2 watermark not monotone")
        if wm2[-1] <= wm1[-1]:
            failures.append("watermark did not advance after restart")

    # 2. state restore + plateau continuity
    for job in ("ohlcv", "dedup"):
        r1 = series(s1, job, state_rows)
        r2 = series(s2, job, state_rows)
        if not r1 or not r2:
            failures.append(f"{job}: missing state samples")
            continue
        if job == "dedup" and r2[0] < 0.9 * r1[-1]:
            failures.append(
                f"dedup state did not restore from changelog: first "
                f"phase-2 sample {r2[0]} vs last phase-1 {r1[-1]}"
            )
        p1_plateau = max(r1[3 * len(r1) // 4 :]) if len(r1) >= 4 else max(r1)
        p2_tail = max(r2[3 * len(r2) // 4 :]) if len(r2) >= 4 else max(r2)
        if p1_plateau > 0 and p2_tail > 1.3 * p1_plateau:
            failures.append(
                f"{job} post-restart plateau {p2_tail} > 1.3x "
                f"pre-crash plateau {p1_plateau}"
            )

    # 3. exactly-once finals grid (committed _spark_metadata view)
    from kafka_flink_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("kill-restart-verify")
    fin = spark.read.parquet(finals)
    grid = (
        fin.groupBy("window_start")
        .agg(
            F.count("*").alias("rows"),
            F.count_distinct("product").alias("keys"),
        )
        .orderBy("window_start")
        .collect()
    )
    n_keys = 2000
    if not grid:
        failures.append("no finals committed at all")
    else:
        # no duplicates: one row per (product, window) in every window
        dup = [
            (str(r["window_start"]), r["rows"], r["keys"])
            for r in grid
            if r["rows"] != r["keys"]
        ]
        if dup:
            failures.append(f"duplicate finals in {len(dup)} windows: {dup[:5]}")
        # no loss: every window complete (all keys). The very first
        # window is exempt — the rate source may start inside its last
        # 2000/rate seconds and legitimately never emit some residues.
        lost = [
            (str(r["window_start"]), r["keys"])
            for r in grid[1:]
            if r["keys"] != n_keys
        ]
        if lost:
            failures.append(
                f"lost finals in {len(lost)} windows "
                f"(want {n_keys} keys each): {lost[:5]}"
            )
        starts = [r["window_start"] for r in grid]
        gaps = [
            (str(a), str(b))
            for a, b in zip(starts, starts[1:])
            if (b - a).total_seconds() != 60.0
        ]
        if gaps:
            failures.append(f"window sequence has gaps across the crash: {gaps}")
        min_windows = (args.kill_at + restart_secs) // 60 - 3
        if len(grid) < min_windows:
            failures.append(
                f"only {len(grid)} closed windows committed; expected >= "
                f"{min_windows} for a gapless resume"
            )
    orphans = 0
    try:
        committed = {
            os.path.basename(f0.path)
            for f0 in spark.read.format("parquet").load(finals).inputFiles()  # type: ignore[attr-defined]
        }
    except Exception:
        committed = set()
    try:
        on_disk = {f0 for f0 in os.listdir(finals) if f0.endswith(".parquet")}
        if committed:
            orphans = len(on_disk - committed)
    except Exception:
        pass

    summary = {
        "mode": "kill-restart",
        "kill_at_secs": args.kill_at,
        "restart_secs": restart_secs,
        "restart_downtime_secs": downtime,
        "ohlcv_rate": args.ohlcv_rate,
        "dedup_rate": args.dedup_rate,
        "phase1_samples": len(s1),
        "phase2_samples": len(s2),
        "watermark_phase1_last": wm1[-1] if wm1 else None,
        "watermark_phase2_first": wm2[0] if wm2 else None,
        "watermark_phase2_last": wm2[-1] if wm2 else None,
        "dedup_state_rows_phase1_last": (
            series(s1, "dedup", state_rows)[-1] if s1 else None
        ),
        "dedup_state_rows_phase2_first": (
            series(s2, "dedup", state_rows)[0] if s2 else None
        ),
        "finals_windows": len(grid),
        "finals_rows_per_window": sorted({r["rows"] for r in grid}) if grid else [],
        "orphan_uncommitted_files_excluded_by_metadata_log": orphans,
        "failures": failures,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))
    spark.stop()
    return 1 if failures else 0


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
    # ---- crash-restart mode (VERDICT r9 task 3) --------------------
    ap.add_argument(
        "--kill-at",
        type=int,
        default=None,
        help="orchestrator mode: run the soak in a child process "
        "group, SIGKILL the whole group (python + JVM — a real "
        "crash, nothing commits) at this many seconds, restart "
        "from the same RocksDB changelog checkpoint for the rest "
        "of --secs, then assert watermark resumption, state-"
        "plateau continuity, and exactly-once finals",
    )
    ap.add_argument(
        "--ckpt-dir", default=None, help="checkpoint root (default: mkdtemp)"
    )
    ap.add_argument(
        "--finals-dir",
        default=None,
        help="write OHLCV append finals to this parquet file-sink dir "
        "instead of noop (the exactly-once evidence channel)",
    )
    ap.add_argument(
        "--samples-jsonl",
        default=None,
        help="also append each progress sample as a JSONL line "
        "(flushed — survives a SIGKILL of this process)",
    )
    ap.add_argument(
        "--no-assert",
        action="store_true",
        help="child mode: collect samples and write the summary but "
        "skip the timeline assertions (the orchestrator asserts "
        "across phases instead)",
    )
    args = ap.parse_args()

    if args.kill_at is not None:
        sys.exit(orchestrate_kill_restart(args))

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

    ckpt = args.ckpt_dir or tempfile.mkdtemp(prefix="soak_ckpt_")

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
    ohlcv_writer = (
        candles.writeStream.outputMode("append")
        .option("checkpointLocation", f"{ckpt}/ohlcv")
        .queryName("soak_ohlcv")
    )
    if args.finals_dir:
        # Parquet file sink: exactly-once via the _spark_metadata
        # commit log — a crashed attempt's orphan part-files are
        # invisible to a Spark reader, which is the property the
        # kill-restart orchestrator verifies.
        ohlcv_writer = ohlcv_writer.format("parquet").option(
            "path", args.finals_dir
        )
    else:
        ohlcv_writer = ohlcv_writer.format("noop")
    q_ohlcv = ohlcv_writer.start()

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
    jsonl = open(args.samples_jsonl, "a") if args.samples_jsonl else None
    while time.time() - t0 < args.secs:
        time.sleep(args.sample_every)
        for q in queries.values():
            if q.exception() is not None:
                print(f"FATAL {q.name}: {q.exception()}", file=sys.stderr)
                # Persist everything collected so far — the samples
                # leading up to a mid-soak crash are the most useful
                # diagnostics; don't discard them with the exit.
                with open(args.out, "w") as f:
                    json.dump(
                        {
                            "soak_secs": round(time.time() - t0, 1),
                            "n_samples": len(samples),
                            "failures": [f"{q.name}: {q.exception()}"],
                            "samples": samples,
                        },
                        f,
                        indent=1,
                    )
                sys.exit(2)
        row = {"t": round(time.time() - t0, 1)}
        for name, q in queries.items():
            row[name] = sample(q)
        samples.append(row)
        line = json.dumps(row)
        print(line, file=sys.stderr)
        if jsonl is not None:
            jsonl.write(line + "\n")
            jsonl.flush()

    for q in queries.values():
        q.stop()
    if jsonl is not None:
        jsonl.close()

    # ---------------- assertions over the timeline ------------------
    def series(job: str, fn):
        return [fn(s[job]) for s in samples if s.get(job) is not None]

    failures: list[str] = []

    # plateau needs >= 8 samples; a short smoke run (--secs 60) can't
    # have them, so only a soak that REQUESTED enough samples fails on
    # their absence
    plateau_expected = args.secs // args.sample_every >= 8

    wm = [w for w in series("ohlcv", lambda p: p["watermark"]) if w]
    if not wm or any(b < a for a, b in zip(wm, wm[1:])):
        failures.append("ohlcv watermark not monotone non-decreasing")
    # distinct-count is a soak-only check like plateau: a 60 s smoke
    # yields ~4 samples, and a slow first batch on a loaded box can
    # legitimately leave <3 distinct watermarks
    if plateau_expected and len(set(wm)) < max(3, len(wm) // 4):
        failures.append(f"ohlcv watermark barely advanced: {len(set(wm))} distinct")

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
    if failures and not args.no_assert:
        sys.exit(1)


if __name__ == "__main__":
    main()
