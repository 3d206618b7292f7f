"""Round-5 session-4 scale measurements: 1x/10x synthetic rows for the
session's operators (time-series, boilerplate, prefix filter, graph
family additions, skyline, lake maintenance).

Usage: python scripts/scaling_r5b.py
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def t(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def med3(make) -> float:
    """Median of 3 reps, cache cleared per rep (bench discipline)."""
    reps = []
    for _ in range(3):
        make.spark.catalog.clearCache() if hasattr(make, "spark") else None
        reps.append(t(make()))
    return sorted(reps)[1]


def synth_docs_sourced(spark, n: int, words: int = 120, n_sources: int = 32):
    """Docs with a source column; ~30% of each source's docs share a
    source-specific 12-word boilerplate block (t34's target shape)."""
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(words)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(F.col("id") * 1000 + i), F.lit(5000))
            ),
        ),
        " ",
    )
    src = F.pmod(F.col("id"), F.lit(n_sources))
    boiler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(12)),
            lambda i: F.concat(F.lit("nav"), src, F.lit("_"), i),
        ),
        " ",
    )
    text = F.when(
        F.pmod(F.xxhash64("id"), F.lit(10)) < 3, F.concat(boiler, F.lit(" "), body)
    ).otherwise(body)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), src).alias("source"),
        text.alias("text"),
    )


def synth_series(spark, n: int, n_keys: int = 1000):
    """Hourly series per key with ~1/3 of buckets missing (e13 shape);
    e14 consumes the same rows as a dense-enough ordered series."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("k"), F.col("id") % n_keys).alias("k"),
            F.timestamp_millis(
                F.lit(1704067200000) + (F.col("id") / n_keys).cast("long") * 3600000
            ).alias("ws"),
            (F.pmod(F.xxhash64("id"), F.lit(10000)) / 100.0).alias("close"),
        )
        .filter(F.pmod(F.xxhash64(F.col("k"), F.col("ws")), F.lit(3)) != 0)
    )


def synth_edges(spark, n_edges: int):
    """Ring + hashed chords over n_edges/10 nodes — connected-ish,
    skewed degrees."""
    n_nodes = max(n_edges // 10, 10)
    ring = spark.range(n_nodes).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n_nodes).alias("dst")
    )
    chords = spark.range(n_edges - n_nodes).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + 1), F.lit(n_nodes)).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    und = ring.unionByName(chords)
    return und.unionByName(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def main() -> None:
    from kafka_flink_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )
    from kafka_flink_spark.operators.graph import bfs_levels, label_propagation
    from kafka_flink_spark.operators.resample import gap_fill, interpolate_linear
    from kafka_flink_spark.operators.skyline import skyline_2d
    from kafka_flink_spark.operators.text import boilerplate_spans
    from kafka_flink_spark.operators.timeseries import ewma
    from kafka_flink_spark.session import get_session

    spark = get_session("scaling-r5b")

    print("== t34 boilerplate_spans (sourced docs, k=2, 15%) ==")
    for n in (50_000, 500_000):
        docs = synth_docs_sourced(spark, n)
        spark.catalog.clearCache()
        print(f"  {n}: {t(boilerplate_spans(docs, k=2, min_frac=0.15)):.1f}s")

    print("== d11 prefix filter vs plain inverted join (tau=0.5) ==")
    for n in (50_000, 500_000):
        docs = synth_docs_sourced(spark, n)
        spark.catalog.clearCache()
        wall_p = t(ngram_jaccard_pairs_prefix(docs, min_jaccard=0.5))
        line = f"  {n}: prefix {wall_p:.1f}s"
        if n <= 50_000:
            spark.catalog.clearCache()
            line += f", plain {t(ngram_jaccard_pairs(docs, min_jaccard=0.5)):.1f}s"
        print(line)

    print("== gr4 label_propagation / gr5 bfs_levels (2 rounds / 3 hops) ==")
    for n_e in (1_000_000, 10_000_000):
        edges = synth_edges(spark, n_e)
        nodes = edges.select(F.col("src").alias("id")).distinct()
        seed = nodes.limit(3)
        spark.catalog.clearCache()
        w_lpa = t(label_propagation(nodes, edges, "id", iterations=2))
        spark.catalog.clearCache()
        w_bfs = t(bfs_levels(nodes, edges, seed, "id", max_hops=3))
        print(f"  {n_e} edges: lpa {w_lpa:.1f}s, bfs {w_bfs:.1f}s")

    print("== g23 skyline_2d ==")
    for n in (1_000_000, 10_000_000):
        pts = spark.range(n).select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("x"),
            F.pmod(F.xxhash64(F.col("id") + 7), F.lit(1_000_000)).alias("y"),
        )
        spark.catalog.clearCache()
        print(f"  {n}: {t(skyline_2d(pts, 'x', 'y')):.1f}s")

    print("== e13 interpolate (gap_fill+lerp) / e14 ewma (48 lags) ==")
    for n in (1_000_000, 10_000_000):
        s = synth_series(spark, n)
        spark.catalog.clearCache()
        filled = gap_fill(s, ["k"], "ws", "1 hour")
        w_interp = t(interpolate_linear(filled, ["k"], "ws", "close"))
        spark.catalog.clearCache()
        w_ewma = t(ewma(s, ["k"], "ws", "close"))
        print(f"  {n} rows: interp {w_interp:.1f}s, ewma {w_ewma:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
