"""One-off: co-purchase edge build variants (measurement only, r12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table
from kafka_flink_spark.suite.relational_queries import _copurchase_edges

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-edges")
li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
li.write.format("noop").mode("overwrite").save()


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


def edges_hof():
    return _copurchase_edges(li)


def edges_explode2():
    per_order = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("ps"))
    return (
        per_order.select(F.explode("ps").alias("src"), F.col("ps"))
        .select("src", F.explode("ps").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


t("hof build", lambda: noop(edges_hof()))
t("explode2 build", lambda: noop(edges_explode2()))

a = {tuple(r) for r in edges_hof().collect()}
b = {tuple(r) for r in edges_explode2().collect()}
print("equal:", a == b, len(a))
spark.stop()
