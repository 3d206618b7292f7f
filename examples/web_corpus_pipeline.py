"""Web-corpus ingest pipeline over the documents fixture — the
crawl-side front half that feeds examples/training_pipeline.py,
composed from the registered operators in production order (each
stage shrinks the corpus before the next pays its cost):

    python examples/web_corpus_pipeline.py

0. Unicode NFC normalization + script profiling (t38/t39 — the
   encoding/script gates every multilingual crawl applies first),
1. URL canonicalization + URL-level dedup (t28 — no content touched
   for recrawl variants),
2. Gopher quality rule battery (t29) + linear-classifier margin gate
   (fe6 — the pure-codegen fasttext-style quality filter),
3. exact content dedup (d1),
4. winnowing fingerprints for cross-doc overlap reporting (t30),
5. BM25 spot-check of a few probe terms (t31),
6. per-source corpus stats.

Every stage is declarative; no step collects the corpus. Swap the
synthesized URLs for the crawl index's real URL column and the
fixture read for the production lake and this file IS the job.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from kafka_flink_spark.operators.dedup import exact_dedup
    from kafka_flink_spark.operators.text import (
        bm25_scores,
        gopher_quality_rules,
        linear_model_score,
        script_profile,
        unicode_normalize,
        winnowing_fingerprints,
    )
    from kafka_flink_spark.operators.urls import url_dedup
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.sources.fixtures import load_table
    from kafka_flink_spark.suite.llm_queries import _url_synth_col

    spark = get_session("web-corpus-pipeline")
    docs = load_table(spark, SF_DIR, "documents")

    # 0. normalize encodings, then gate on script (the fixture is
    # ASCII, so everything profiles Latin — on a real crawl this drops
    # the documents the Latin stopword language-ID cannot score)
    docs = unicode_normalize(docs, "text", "NFC")
    scripts = script_profile(docs).filter("dominant_script = 'latin'")
    docs = docs.join(scripts.select("doc_id"), "doc_id")
    print(f"after NFC + Latin-script gate: {docs.count()} docs")

    # 1. URL-level dedup (synthesized URLs stand in for the crawl index)
    with_url = docs.select("doc_id", _url_synth_col().alias("url"))
    url_kept = url_dedup(with_url).select(F.col("keep_id").alias("doc_id"))
    survivors = docs.join(url_kept, "doc_id")
    print(f"after URL dedup: {survivors.count()} docs (of {docs.count()})")

    # 2. quality gates: rule battery, then the classifier margin
    quality = gopher_quality_rules(survivors).filter("keep").select("doc_id")
    clean = survivors.join(quality, "doc_id")
    print(f"after Gopher rules: {clean.count()} docs")
    scored = linear_model_score(clean).filter("keep").select("doc_id")
    clean = clean.join(scored, "doc_id")
    print(f"after classifier margin gate: {clean.count()} docs")

    # 3. exact content dedup
    reps = exact_dedup(clean).select(F.col("keep_id").alias("doc_id"))
    unique = clean.join(reps, "doc_id")
    print(f"after exact dedup: {unique.count()} docs")

    # 4. overlap fingerprints (winnowing) — corpus-level report
    fp = winnowing_fingerprints(unique)
    fp.orderBy(F.desc("n_fingerprints")).show(5, truncate=False)

    # 5. BM25 probe terms
    bm25_scores(unique).orderBy(F.desc("bm25")).show(5, truncate=False)

    # 6. per-source stats
    unique.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_words"),
    ).orderBy("source").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
