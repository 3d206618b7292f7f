"""One-off: where does minhash_lsh_pairs time go (measurement only, r12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_flink_spark.operators import dedup as D
from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-lsh")
docs = load_table(spark, sf_dir, "documents")


def t(label, fn, reps=3):
    xs = []
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn()
        xs.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: {sorted(xs)}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(docs)

sigs = D.minhash_signatures(docs)
t("sigs only", lambda: noop(sigs))
t("lsh cap=None", lambda: noop(D.minhash_lsh_pairs(docs, min_jaccard=0.5, bucket_cap=None)))
t("lsh cap=512", lambda: noop(D.minhash_lsh_pairs(docs, min_jaccard=0.5, bucket_cap=512)))

# d13's corpus (with boilerplate family)
from kafka_flink_spark.suite.llm_queries import _D13_BASE, _D13_CAP, _D13_FAMILY_N

i = F.col("id").cast("string")
fam = spark.range(_D13_FAMILY_N).select(
    (F.lit(9000000) + F.col("id")).cast("long").alias("doc_id"),
    F.concat(
        F.lit(_D13_BASE),
        F.lit(" va"), i, F.lit(" vb"), i, F.lit(" vc"), i, F.lit(" vd"), i,
    ).alias("text"),
)
both = docs.select("doc_id", "text").unionByName(fam)
t("d13 corpus cap=16", lambda: noop(D.minhash_lsh_pairs(both, min_jaccard=0.5, bucket_cap=_D13_CAP)))
t("d13 corpus cap=None", lambda: noop(D.minhash_lsh_pairs(both, min_jaccard=0.5, bucket_cap=None)))
spark.stop()
