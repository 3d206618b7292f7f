"""Scale-up measurements for the round-4 operators: URL dedup,
winnowing fingerprints, BM25 scoring, Gopher rules, PQ-ADC top-k.

Synthesizes inputs at 1x / 10x with spark.range (parallel source) and
prints wall times for SCALING.md. cdc_chunk_dedup's round-4 rewrite is
measured in its own SCALING.md section.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from kafka_flink_spark.session import get_session  # noqa: E402
from scaling_r3 import synth_docs, t  # noqa: E402


def synth_urls(spark, n: int):
    d = F.col("id")
    url = F.concat(
        F.when(d % 3 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (d % 9973).cast("string"), F.lit(".Example.COM"),
        F.lit("/p/"), (d % 40411).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(d % 4 != 3, F.concat(F.lit("?utm_source=mail&id="), (d % 1009).cast("string"))).otherwise(F.lit("")),
        F.when(d % 6 == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )
    return spark.range(n).select(F.col("id").alias("doc_id"), url.alias("url"))


def synth_vectors(spark, n: int, dim: int = 64):
    v = F.array(*[
        (F.pmod(F.xxhash64(F.col("id") * 131 + i), F.lit(2_000_000)) / 1_000_000.0 - 1.0)
        for i in range(dim)
    ])
    return spark.range(n).select(F.col("id").alias("vec_id"), v.alias("embedding"))


def main() -> None:
    spark = get_session("scaling-r4")
    from kafka_flink_spark.operators.similarity import pq_adc_topk
    from kafka_flink_spark.operators.text import (
        bm25_scores,
        gopher_quality_rules,
        winnowing_fingerprints,
    )
    from kafka_flink_spark.operators.urls import url_dedup

    print("== url_dedup ==")
    for n in (1_000_000, 10_000_000):
        w = t(url_dedup(synth_urls(spark, n)))
        print(f"urls={n:>10,} wall={w:5.1f}s", flush=True)

    print("== winnowing_fingerprints / gopher_quality_rules / bm25_scores ==")
    for n in (5_000, 50_000):
        docs = synth_docs(spark, n)
        ww = t(winnowing_fingerprints(docs))
        wg = t(gopher_quality_rules(docs))
        wb = t(bm25_scores(docs, terms=("w1", "w2", "w3", "b1")))
        print(f"docs={n:>7,} winnow={ww:5.1f}s gopher={wg:5.1f}s bm25={wb:5.1f}s", flush=True)

    print("== pq_adc_topk (8 subspaces, 16 codes, 3 queries) ==")
    for n in (50_000, 500_000):
        emb = synth_vectors(spark, n)
        q = emb.filter("vec_id < 3")
        w = t(pq_adc_topk(emb, q, k=10))
        print(f"vectors={n:>8,} wall={w:5.1f}s", flush=True)


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "extra"):
    main()


def extra() -> None:
    """Round-4b additions: IVF+PQ and the model-quality filter."""
    spark = get_session("scaling-r4b")
    from kafka_flink_spark.operators.similarity import ivfpq_adc_topk
    from kafka_flink_spark.operators.text import model_quality_scores

    print("== ivfpq_adc_topk (8 cells / 2 probed / 8x16 codes, 3 queries) ==")
    for n in (50_000, 500_000):
        emb = synth_vectors(spark, n)
        q = emb.filter("vec_id < 3")
        w = t(ivfpq_adc_topk(emb, q, k=10))
        print(f"vectors={n:>8,} wall={w:5.1f}s", flush=True)

    print("== model_quality_scores (Arrow-batched stub scorer) ==")
    for n in (5_000, 50_000):
        docs = synth_docs(spark, n)
        w = t(model_quality_scores(docs))
        print(f"docs={n:>7,} wall={w:5.1f}s", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra":
    extra()
