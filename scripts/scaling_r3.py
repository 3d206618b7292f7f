"""Scale-up measurements for the round-3 operators: Bloom join
pruning, Z-order writes, BPE pair counts, CDC chunk dedup.

Synthesizes inputs at 1x / 10x with spark.range (parallel source, so
numbers measure the operator, not the fixture's one-row-group layout)
and prints wall times for SCALING.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafka_flink_spark.session import get_session  # noqa: E402


def t(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def synth_fact(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.pmod(F.xxhash64("id"), F.lit(200_000)).alias("fk"),
        (F.pmod(F.col("id"), F.lit(100)) + 1).alias("qty"),
    )


def synth_docs(spark, n: int, words: int = 120):
    # ~1% of docs share a 60-word boilerplate block (CDC should dedup it)
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(words)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(5000))
            ),
        ),
        " ",
    )
    boiler = " ".join(f"b{i}" for i in range(60))
    text = F.when(F.pmod("id", F.lit(100)) == 0, F.concat(F.lit(boiler + " "), body)).otherwise(body)
    return spark.range(n).select(F.col("id").alias("doc_id"), text.alias("text"))


def main() -> None:
    spark = get_session("scaling-r3")
    from kafka_flink_spark.operators.bloom import bloom_semi_join
    from kafka_flink_spark.operators.text import bpe_pair_counts, cdc_chunk_dedup
    from kafka_flink_spark.operators.zorder import zorder_write
    from kafka_flink_spark.sources.fixtures import scratch_dir

    print("== bloom_semi_join (dim = 1% of key space) ==")
    for n in (2_000_000, 20_000_000):
        fact = synth_fact(spark, n)
        dim = spark.range(2_000).select(F.pmod(F.xxhash64("id"), F.lit(200_000)).alias("k")).distinct()
        w = t(bloom_semi_join(fact, dim, "fk", "k", num_bits=1 << 18, num_hashes=3))
        print(f"rows={n:>11,} wall={w:5.1f}s")

    print("== zorder_write (2 keys, 16 files) ==")
    for n in (1_000_000, 10_000_000):
        fact = synth_fact(spark, n).withColumn("k2", F.pmod(F.xxhash64("row_id"), F.lit(4096)))
        d = scratch_dir("zorder_scale_")
        t0 = time.perf_counter()
        zorder_write(fact, ["fk", "k2"], d + "/t", bits=10, num_files=16)
        print(f"rows={n:>11,} wall={time.perf_counter() - t0:5.1f}s")

    print("== pagerank / triangle_count (random graph, avg degree 20) ==")
    from kafka_flink_spark.operators.graph import pagerank, triangle_count

    for n in (100_000, 1_000_000):
        edges = spark.range(n * 10).select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n)).alias("src"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n)).alias("dst"),
        )
        nodes = spark.range(n).select(F.col("id"))
        t0 = time.perf_counter()
        pagerank(nodes, edges, "id", iterations=5).write.format("noop").mode(
            "overwrite"
        ).save()
        wp = time.perf_counter() - t0
        wt = t(triangle_count(edges))
        print(f"nodes={n:>9,} edges={n * 10:>10,} pagerank5={wp:5.1f}s triangles={wt:5.1f}s")

    print("== bpe_pair_counts / cdc_chunk_dedup ==")
    for n in (5_000, 50_000):
        docs = synth_docs(spark, n).persist()
        docs.count()
        wb = t(bpe_pair_counts(docs, top_k=50))
        wc = t(cdc_chunk_dedup(docs, boundary_mod=32))
        print(f"docs={n:>7,} bpe={wb:5.1f}s cdc={wc:5.1f}s")
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
