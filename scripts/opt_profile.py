"""Per-query profiling helper for the optimization rounds.

Usage:
    python scripts/opt_profile.py [--plans DIR --tag TAG] [--reps N] q1 q2 ...

For each named query: runs it REPS times against $SPARK_GRAFT_SF_DIR
with the noop sink (same timing discipline as bench.py), prints
per-rep and median seconds, and (with --plans) writes the
``explain("formatted")`` output to DIR/<name>_<tag>.txt.

This is a measurement tool only — it never feeds results back into
any query path (no caching of query outputs across runs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="directory for explain output")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("kafka_flink_spark-opt-profile")
    qs = all_queries()
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"opt_profile:{name}")
        if args.plans:
            # Public API capture (ADVICE r11): redirect explain()'s
            # stdout instead of reaching into JVM internals, which
            # break under Spark Connect.
            import contextlib
            import io

            df = qs[name].spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        reps = []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
        med = sorted(reps)[len(reps) // 2]
        print(f"{name}: median={med} reps={reps}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
