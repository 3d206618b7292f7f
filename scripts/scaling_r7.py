"""Scale-up measurement for the round-7 operators (SCALING.md):

* kmv_bottom_k / kmv_intersection_estimates — cost model: one narrow
  hash projection + distinct + per-set WindowGroupLimit; sample and
  everything after it are O(k) per set, so wall should grow ~linearly
  in member rows while the ESTIMATE stage stays flat.
* nn_descent — cost model: O(n·K²) candidate pairs per round (vs the
  exact build's O(n²)); wall should grow ~linearly in n at fixed K.
* hybrid_retrieval_rrf fusion tail — bounded at (shortlist × queries)
  rows regardless of corpus size; wall tracks the arms, not the
  fusion.

Synthetic inputs via spark.range (deterministic); noop writes; warm
session. Run: python scripts/scaling_r7.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(df) -> float:
    s = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - s


def main() -> None:
    from kafka_flink_spark.operators.similarity import nn_descent
    from kafka_flink_spark.operators.sketches import kmv_intersection_estimates
    from kafka_flink_spark.session import get_session

    spark = get_session("scaling-r7")

    # ---- KMV: 10M -> 100M member rows over 5 sets, ~2M distinct
    # members each; the sketch is k=256 longs per set at ANY volume.
    print("== kmv_intersection_estimates (5 sets)")
    for n in (10_000_000, 30_000_000, 100_000_000):
        rows = spark.range(n).select(
            F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias("s"),
            (F.pmod(F.col("id") * 2654435761, F.lit(n // 5))).alias("m"),
        )
        wall = t(kmv_intersection_estimates(rows, "s", "m"))
        print(f"  n={n:>11,}  wall={wall:6.1f}s", flush=True)

    # ---- NN-descent: n vectors, K=15, 2 rounds; candidate volume is
    # n*(2K)^2/2 per round — linear in n.
    print("== nn_descent (K=15, rounds=2, dim=16)")
    for n in (2_000, 8_000, 32_000):
        vecs = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(1), F.lit(16)),
                lambda i: (
                    (F.pmod(F.col("id") * i * 2654435761, F.lit(997)) + 1).cast(
                        "double"
                    )
                    / 998.0  # +1: no zero-norm vectors (cosine divides by norms)
                ),
            ).alias("embedding"),
        )
        wall = t(nn_descent(vecs, k=15, rounds=2))
        print(f"  n={n:>7,}  wall={wall:6.1f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
