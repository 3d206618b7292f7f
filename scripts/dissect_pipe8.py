"""One-off breakdown of pipe8/d7's phases (measurement only, r12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_flink_spark.operators import dedup as D
from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect")
docs = load_table(spark, sf_dir, "documents")
print("docs:", docs.count())


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return r


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# warm
noop(docs)

for rep in range(2):
    spark.catalog.clearCache()
    t("simhash only", lambda: noop(D.simhash(docs)))
    spark.catalog.clearCache()
    t("simhash_near_pairs", lambda: noop(
        D.simhash_near_pairs(docs, max_hamming=6, bucket_cap=None)))
    spark.catalog.clearCache()
    pairs = D.simhash_near_pairs(docs, max_hamming=6, bucket_cap=None).select(
        "doc_a", "doc_b")
    t("pairs+dedup_clusters", lambda: noop(
        D.dedup_clusters(docs.select("doc_id"), pairs)))
    print("n pairs:", pairs.count())
spark.stop()
