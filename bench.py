"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric", "value", "unit", "queries", "sf"}.

Execution is measured with a noop sink (full plan executes on the
cluster; nothing is collected to the driver), matching how the engine
would run at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = (
    "a1_ohlcv_tumbling_1h",
    "a2_running_ohlcv",
    "a5_ohlcv_cascade_1h_to_1d",
    "a6_sql_ohlc_5m",
    "g1_pricing_summary",
    "q_shipping_priority",
    "q_local_supplier_volume",
    "j1_join_broadcast_inner",
    "w1_topk_per_group",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import all_queries

    spark = get_session("kafka_flink_spark-bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs]
    extra = [n for n in os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "").split(",") if n in qs]
    names += [n for n in extra if n not in names]

    # Warm the JVM + parquet footers once so per-query numbers measure
    # execution, not session startup.
    qs[names[0]].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
