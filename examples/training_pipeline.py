"""End-to-end training-data pipeline over the documents fixture —
the LLM-data half of the engine, composed from the registered
operators exactly as a 100 TB run would chain them:

    python examples/training_pipeline.py

1. temperature mixture sampling (pipe6: rates FROM corpus stats),
2. quality + language gates (t2/t3 features),
3. exact dedup, then MinHash+LSH near-dup pruning (d1/d3),
4. ExactSubstr duplicated-span rewrite (t27, keep-first policy),
5. BPE tokenizer training + encode stats (t25/t26),
6. sequence packing into 4096-token shards (t9),
7. deterministic epoch shuffle (t24).

Every stage is declarative; no step collects the corpus. Swap the
fixture read for the production parquet lake and this file IS the
job.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from kafka_flink_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from kafka_flink_spark.operators.text import (
        bpe_encode_stats,
        deterministic_shuffle,
        lang_scores,
        pack_documents,
        quality_scores,
        remove_duplicate_spans,
        temperature_mix,
    )
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.sources.fixtures import load_table

    spark = get_session("training-pipeline-example")
    docs = load_table(spark, SF_DIR, "documents")

    # 1. mixture: what WOULD each source contribute at alpha=0.5?
    print("--- temperature mix audit (p_s ∝ n_s^0.5)")
    temperature_mix(docs).orderBy("source").show(5)

    # 2. gates: quality + language features, filter in one pass
    gated = (
        lang_scores(quality_scores(docs))
        .filter((F.col("quality_score") > 0.3) & (F.col("pred_lang") == "en"))
        .select("doc_id", "text")
    )
    print(f"--- docs surviving quality+lang gates: {gated.count()}")

    # 3. dedup: exact first (cheap), then near-dup pairs for review
    keep = exact_dedup(gated).select(F.col("keep_id").alias("doc_id"))
    exact_kept = gated.join(keep, "doc_id", "left_semi")
    near = minhash_lsh_pairs(exact_kept, min_jaccard=0.5)
    print(f"--- exact-dedup survivors: {exact_kept.count()}; near-dup pairs: {near.count()}")

    # 4. substring-level rewrite (keep-first duplicated spans)
    rewritten = remove_duplicate_spans(exact_kept, k=8)
    print("--- ExactSubstr rewrite stats")
    rewritten.agg(
        F.sum("n_tokens").alias("tokens_in"),
        F.sum("n_removed").alias("tokens_removed"),
    ).show()

    # 5. tokenizer: train 8 BPE merges, report compression
    print("--- BPE encode stats (8 merges)")
    bpe_encode_stats(exact_kept, num_merges=8).show(truncate=False)

    # 6. pack into 4096-token sequences across 8 shards
    packed = pack_documents(exact_kept, capacity=4096, num_shards=8)
    packed.groupBy("shard").agg(
        F.count_distinct("pack_id").alias("n_packs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("shard").show(8)

    # 7. reproducible epoch order
    print("--- deterministic shuffle (first rows of shard 0)")
    deterministic_shuffle(exact_kept, n_shards=8).filter("shard = 0").orderBy(
        "pos_in_shard"
    ).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
