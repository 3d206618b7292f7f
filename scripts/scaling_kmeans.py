"""Scale-up measurement for distributed k-means (SCALING.md): the cost
model is iterations x (narrow assignment pass + k x dim-cell update
shuffle), so wall should track the scan near-linearly. Synthetic
vectors via spark.range; noop writes; warm session.
Run: python scripts/scaling_kmeans.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kafka_flink_spark.operators.clustering import kmeans_profile


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
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    for n in (50_000, 500_000):
        vecs = synth_vectors(spark, n).persist()
        vecs.count()
        # warm
        kmeans_profile(vecs.limit(1000), k=8, iterations=1).write.format("noop").mode("overwrite").save()
        t0 = time.time()
        kmeans_profile(vecs, k=8, iterations=2).write.format("noop").mode("overwrite").save()
        print(f"n={n}: {time.time() - t0:.1f}s")
        vecs.unpersist()


if __name__ == "__main__":
    main()
