"""Round-8 synthetic scale-up probe: v15's QUERY path vs corpus size.

The claim under test (operators/similarity.graph_ann_search): with the
index pre-built, per-query search cost is beam x k_graph x rounds
id-joins + exact scores — independent of corpus size. The probe
builds the exact k-NN graph ONCE per n over deterministic synthetic
vectors (md5-derived components, contiguous ids), pins it with
localCheckpoint, then times ONLY the search at n = 500 / 2000 / 8000
(16x vector growth). For contrast it also times the index build,
which is the O(n^2) blocked-GEMM — the part a production deployment
amortizes once (or replaces with v14's NN-descent).

Usage: python scripts/scaling_r8.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def synth_vectors(spark, n: int, dim: int = 32):
    from kafka_flink_spark.functions.hashing import md5_long

    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            md5_long(
                F.concat(
                    F.lit("sv:"), F.col("id").cast("string"), F.lit(":"), i.cast("string")
                )
            )
            % 2001
            - 1000
        ).cast("double")
        / 1000.0,
    )
    return spark.range(n).select(
        F.col("id").alias("vec_id"), comp.alias("embedding")
    ).localCheckpoint()


def main() -> None:
    from kafka_flink_spark.operators.similarity import graph_ann_search, knn_graph
    from kafka_flink_spark.session import get_session

    spark = get_session("scaling-r8")
    qids = (0, 1, 2)
    # warm-up pass: JIT/codegen/Arrow init otherwise lands in row 1
    wv = synth_vectors(spark, 500)
    graph_ann_search(wv, qids, graph=knn_graph(wv, k=8).localCheckpoint()).count()
    print(f"{'n':>7} {'build_s':>8} {'search_s':>9} rows")
    for n in (500, 2000, 8000):
        vecs = synth_vectors(spark, n)
        t0 = time.perf_counter()
        g = knn_graph(vecs, k=8).localCheckpoint()  # pre-built index
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = graph_ann_search(vecs, qids, graph=g)
        rows = out.count()
        search = time.perf_counter() - t0
        print(f"{n:>7} {build:>8.2f} {search:>9.2f} {rows}")


if __name__ == "__main__":
    main()
