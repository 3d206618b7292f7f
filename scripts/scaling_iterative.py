"""Scale-up measurement for the ITERATIVE/graph ops (SCALING.md):
dedup_clusters (pointer-doubling connected components — cost model is
rounds × shuffle) and knn_graph (blocked-GEMM — cost model is block
count), at 10× input steps. Synthetic inputs via spark.range; noop
writes; warm session. Run: python scripts/scaling_iterative.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def t(df) -> float:
    s = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - s


def synth_docs(spark, n: int):
    # ~1% of docs are members of 50-doc near-dup chains (pair graph:
    # consecutive ids within a chain), rest singletons
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )


def chain_pairs(spark, n: int, chain_len: int = 50):
    # every doc in [0, n/100) links to its neighbor within 50-doc chains
    m = n // 100
    return (
        spark.range(m - 1)
        .filter((F.col("id") % chain_len) != chain_len - 1)
        .select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
    )


def synth_vectors(spark, n: int, dim: int = 64):
    cols = [
        (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1000)) / 500.0 - 1.0).alias(f"c{i}")
        for i in range(dim)
    ]
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*cols).alias("embedding"),
    )


def main() -> None:
    from kafka_flink_spark.operators.dedup import dedup_clusters
    from kafka_flink_spark.operators.similarity import knn_graph

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("== dedup_clusters (50-doc chains over 1% of corpus) ==")
    for n in (50_000, 500_000):
        docs = synth_docs(spark, n)
        pairs = chain_pairs(spark, n)
        s = time.time()
        out = dedup_clusters(docs, pairs)
        w = t(out)
        total = time.time() - s
        print(f"docs={n:>9,} pairs={pairs.count():>8,} wall={total:6.1f}s (write {w:4.1f}s)")

    print("== knn_graph (64-dim, k=4) ==")
    for n in (5_000, 50_000):
        vecs = synth_vectors(spark, n)
        s = time.time()
        out = knn_graph(vecs, k=4)
        w = t(out)
        total = time.time() - s
        print(f"vectors={n:>7,} wall={total:6.1f}s (write {w:4.1f}s)")

    print("== ann_knn_graph (64-dim, k=4; planes grow with log2 n) ==")
    from kafka_flink_spark.operators.similarity import ann_knn_graph

    for n, planes in ((5_000, 7), (50_000, 10), (500_000, 13)):
        vecs = synth_vectors(spark, n)
        s = time.time()
        out = ann_knn_graph(vecs, k=4, num_planes=planes)
        w = t(out)
        total = time.time() - s
        print(f"vectors={n:>8,} planes={planes} wall={total:6.1f}s (write {w:4.1f}s)")

    spark.stop()


if __name__ == "__main__":
    main()
