"""Round-5 scale measurements.

1. Streaming state BEYOND memory-resident: the round-4 state-scale
   table stopped at 100k keys on the default HDFS-backed store (state
   fully memory-resident). The actual 100 TB streaming question is
   what happens when state exceeds heap — answered by the RocksDB
   state-store provider (incremental checkpointing, spill-to-disk
   native store). Same 400k-event OHLCV replay, HDFS vs RocksDB
   provider at 100k and 1M distinct keys.

2. gr1/gr2/gr3 graph-op re-measure after the round-5 edge
   localCheckpoint fix (the co-purchase self-join now executes once).

Usage: python scripts/scaling_r5.py [stream|graph|ops|wcc]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
HDFS = "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"


def stream_rate(spark, n_events: int, n_keys: int, provider: str, partitions: int = 8) -> int:
    """Median-of-3 warm replay rate (ev/s) for the OHLCV stream at the
    given key cardinality under the given state-store provider."""
    from kafka_flink_spark.streaming.candles_stream import (
        ohlcv_stream,
        run_available_now,
    )

    tmp = tempfile.mkdtemp(prefix="scal_stream_")
    prev_parts = prev_prov = None
    try:
        (
            spark.range(n_events)
            .select(
                F.timestamp_millis(F.lit(1704067200000) + F.col("id") * 30).alias("ts"),
                F.concat(F.lit("P_"), F.col("id") % n_keys).alias("product"),
                (F.pmod(F.col("id") * 2654435761, F.lit(1000)) + 1).cast("double").alias("price"),
                (F.pmod(F.col("id"), F.lit(100)) + 1).cast("long").alias("qty"),
                F.col("id").alias("seq"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(f"{tmp}/src")
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_prov = spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", HDFS
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)

        def replay() -> None:
            stream = spark.readStream.schema(
                "ts timestamp, product string, price double, qty long, seq long"
            ).parquet(f"{tmp}/src")
            run_available_now(ohlcv_stream(stream, "1 minute"), "update").count()

        replay()  # warm: engine init + provider class load
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            replay()
            rates.append(int(n_events / (time.perf_counter() - t0)))
        return sorted(rates)[1]
    finally:
        # conf restore in the finally: a throwing replay (e.g. missing
        # RocksDB native lib) must not leave the session pinned to
        # this run's partitions/provider and corrupt later rows.
        if prev_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_prov is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev_prov)
        shutil.rmtree(tmp, ignore_errors=True)


def stream_main() -> None:
    from kafka_flink_spark.session import get_session

    spark = get_session("scaling-r5-stream")
    n = 400_000
    for provider, label in ((HDFS, "hdfs"), (ROCKSDB, "rocksdb")):
        for keys in (100_000, 1_000_000):
            r = stream_rate(spark, n, keys, provider)
            print(f"provider={label:8s} keys={keys:>9,} rate={r:>8,} ev/s", flush=True)
    spark.stop()


def graph_main() -> None:
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import all_queries

    spark = get_session("scaling-r5-graph")
    qs = all_queries()
    sf_dir = "/root/testdata/sf0.1"
    for name in (
        "gr1_pagerank_copurchase",
        "gr2_triangle_count",
        "gr3_connected_components",
    ):
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            qs[name].spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 2))
        print(f"{name}: runs={runs} median={sorted(runs)[1]}", flush=True)
    spark.stop()


def ops_main() -> None:
    """1x/10x rows for the late round-5 operators (e12 funnel, t33
    weighted sample)."""
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.operators.text import weighted_priority_sample
    from scaling_r3 import synth_docs, t

    spark = get_session("scaling-r5-ops")

    def synth_events(n: int, n_users: int):
        typ = F.element_at(
            F.array(*[F.lit(x) for x in ("view", "click", "signup", "purchase", "error")]),
            (F.pmod(F.xxhash64("id"), F.lit(5)) + 1).cast("int"),
        )
        return spark.range(n).select(
            (F.col("id") % n_users).alias("user_id"),
            typ.alias("event_type"),
            F.timestamp_millis(F.lit(1704067200000) + F.col("id") * 13).alias("ts"),
        )

    def funnel(ev):
        us = F.unix_micros("ts")
        base = ev.groupBy("user_id").agg(
            F.min(F.when(F.col("event_type") == "view", us)).alias("v_us")
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .join(base, "user_id")
            .filter(us > F.col("v_us"))
            .groupBy("user_id")
            .agg(F.min(us).alias("c_us"))
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .join(clicks, "user_id")
            .filter(us > F.col("c_us"))
            .groupBy("user_id")
            .agg(F.min(us).alias("p_us"))
        )
        return base.join(clicks, "user_id", "left").join(purchases, "user_id", "left")

    print("== e12 funnel (events 1M -> 10M, users = n/50) ==")
    for n in (1_000_000, 10_000_000):
        w = t(funnel(synth_events(n, n // 50)))
        print(f"events={n:>11,} wall={w:5.1f}s", flush=True)

    print("== t33 weighted_priority_sample (docs 50k -> 500k) ==")
    for n in (50_000, 500_000):
        w = t(weighted_priority_sample(synth_docs(spark, n), k=50))
        print(f"docs={n:>8,} wall={w:5.1f}s", flush=True)
    spark.stop()


def wcc_main() -> None:
    """Pointer-doubling convergence evidence: worst-case CHAIN graphs
    (diameter = n-1) must converge in ~log2(n) label rounds, not n —
    the difference between 17 rounds and 100k rounds at the 100 TB
    diameter regime. Also a 1M-edge random graph for the typical case."""
    from kafka_flink_spark.operators.graph import connected_components
    from kafka_flink_spark.session import get_session

    spark = get_session("scaling-r5-wcc")
    for n in (10_000, 100_000):
        nodes = spark.range(n).select(F.col("id"))
        chain = spark.range(n - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        t0 = time.perf_counter()
        out = connected_components(nodes, chain, "id", max_iterations=25)
        n_comp = out.select("component_id").distinct().count()
        w = time.perf_counter() - t0
        print(f"chain n={n:>8,} wall={w:5.1f}s components={n_comp} (expect 1)", flush=True)
    n, m = 200_000, 1_000_000
    nodes = spark.range(n).select(F.col("id"))
    rand = spark.range(m).select(
        F.pmod(F.xxhash64("id"), F.lit(n)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 7), F.lit(n)).alias("dst"),
    )
    t0 = time.perf_counter()
    out = connected_components(nodes, rand, "id")
    n_comp = out.select("component_id").distinct().count()
    w = time.perf_counter() - t0
    print(f"random n={n:,} m={m:,} wall={w:5.1f}s components={n_comp}", flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
    if mode == "stream":
        stream_main()
    elif mode == "graph":
        graph_main()
    elif mode == "ops":
        ops_main()
    elif mode == "wcc":
        wcc_main()
    else:
        raise SystemExit(f"unknown mode {mode!r}")
