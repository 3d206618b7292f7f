"""RocksDB-provider streaming bench (VERDICT r7 task 3).

Runs the bench STREAM_OPS replays twice, each in its OWN child process
(fresh JVM, fresh state-store dirs — the bench's stream-section
discipline): once on the local default HDFSBackedStateStoreProvider
and once on RocksDBStateStoreProvider + changelog checkpointing (the
cluster_conf() 100-TB default, session.py). Prints a per-query table
of medians and the ratio; the SURVEY §3.1 claim is that RocksDB costs
a flat ~20-25% vs the memory store, so the bar is ratio <= ~2x.

Usage: python scripts/rocksdb_stream_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def run_child(sf_dir: str, provider: str | None) -> dict[str, float]:
    repo = os.path.abspath(".")
    conf_lines = ""
    if provider:
        conf_lines = (
            f"spark.conf.set('spark.sql.streaming.stateStore.providerClass', {provider!r})\n"
            "spark.conf.set('spark.sql.streaming.stateStore."
            "rocksdb.changelogCheckpointing.enabled', 'true')\n"
        )
    code = (
        "import sys, json\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from kafka_flink_spark.session import get_session\n"
        "from kafka_flink_spark.suite import all_queries\n"
        "import bench\n"
        "spark = get_session('rocksdb-stream-bench')\n"
        + conf_lines
        + "qs = all_queries()\n"
        "spread = {}\n"
        f"t = bench._time_section(spark, qs, {sf_dir!r}, list(bench.STREAM_OPS), spread)\n"
        "print('ROWS ' + json.dumps({'t': t, 'spread': spread}))\n"
        "spark.stop()\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True,
        env=os.environ,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("ROWS ")][-1]
    return json.loads(line[len("ROWS "):])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mem = run_child(sf_dir, None)
    rdb = run_child(sf_dir, ROCKSDB)
    rows = []
    for name in mem["t"]:
        m, r = mem["t"][name], rdb["t"][name]
        rows.append((name, m, r, round(r / m, 2) if m else None))
        print(f"{name:40s} mem={m:7.3f}s rocksdb={r:7.3f}s ratio={r/m:5.2f}x")
    total_m = sum(mem["t"].values())
    total_r = sum(rdb["t"].values())
    print(f"{'TOTAL':40s} mem={total_m:7.3f}s rocksdb={total_r:7.3f}s "
          f"ratio={total_r/total_m:5.2f}x")
    with open("ROCKSDB_STREAM_BENCH.json", "w") as fh:
        json.dump(
            {"sf_dir": sf_dir, "memory": mem, "rocksdb": rdb},
            fh, indent=1, sort_keys=True,
        )
    print("written ROCKSDB_STREAM_BENCH.json", file=sys.stderr)


if __name__ == "__main__":
    main()
