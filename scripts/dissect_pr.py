"""One-off: pagerank (gr1) phase timing (measurement only, r12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table
from kafka_flink_spark.suite.relational_queries import _copurchase_edges

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-pr")
li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
li.write.format("noop").mode("overwrite").save()

t0 = time.perf_counter()
edges_plan = _copurchase_edges(li)
edges = edges_plan.localCheckpoint()
print(f"edge build+ck: {time.perf_counter()-t0:.3f} rows={edges.count()}")

t0 = time.perf_counter()
nodes = li.select(F.col("l_partkey").alias("id")).distinct().localCheckpoint()
n = nodes.count()
print(f"nodes ck: {time.perf_counter()-t0:.3f} n={n}")

from kafka_flink_spark.operators.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE

base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
t0 = time.perf_counter()
deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
out_e = edges.join(deg, "src").localCheckpoint()
print(f"out_e ck: {time.perf_counter()-t0:.3f}")
t0 = time.perf_counter()
pr = nodes.select(F.col("id"), F.lit(PR_SCALE // n).cast("long").alias("pr")).localCheckpoint()
print(f"pr init ck: {time.perf_counter()-t0:.3f}")

for it in range(5):
    t0 = time.perf_counter()
    prb = F.broadcast(pr)
    contrib = (
        out_e.join(prb, out_e.src == prb["id"])
        .select(
            F.col("dst"),
            F.expr(f"({PR_DAMP_NUM} * pr) div ({PR_DAMP_DEN} * deg)").alias("c"),
        )
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
    )
    contrib = F.broadcast(contrib)
    pr = nodes.join(contrib, nodes["id"] == contrib.dst, "left").select(
        F.col("id"),
        (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("pr"),
    )
    ck = (it + 1) % 2 == 0 or it == 4
    if ck:
        pr = pr.localCheckpoint()
    print(f"round {it}: {time.perf_counter()-t0:.3f} ck={ck}")
spark.stop()
