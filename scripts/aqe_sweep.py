"""One-off AQE coalescing sweep (measurement only, round 12).

Times a representative query set under the current session conf vs
``spark.sql.adaptive.coalescePartitions.parallelismFirst=false`` at
several advisory partition sizes. Usage:

    python scripts/aqe_sweep.py <mode> q1 q2 ...

mode: "control" | advisory size string ("16m", "64m", ...)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import all_queries

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(f"aqe-sweep-{mode}")
    if mode != "control":
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", mode)
    qs = all_queries()
    # warm the JVM once
    qs[names[0]].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        reps = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = sorted(reps)[1]
        print(f"{mode} {name}: median={out[name]} reps={sorted(reps)}", flush=True)
    print(f"TOTAL {mode} {round(sum(out.values()), 2)}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
