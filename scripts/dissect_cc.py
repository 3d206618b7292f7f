"""One-off: dedup_clusters loop cost breakdown (measurement only, r12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_flink_spark.operators import dedup as D
from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-cc")
docs = load_table(spark, sf_dir, "documents")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(docs)
pairs = D.simhash_near_pairs(docs, max_hamming=6, bucket_cap=None).select(
    "doc_a", "doc_b"
).localCheckpoint()
print("pairs:", pairs.count())

# instrumented copy of dedup_clusters
from kafka_flink_spark.operators.iterative import lineage_truncator

ids = docs.select("doc_id")
id_col = "doc_id"
_ck = lineage_truncator(spark, None)
t0 = time.perf_counter()
edges = (
    pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    .distinct()
    .transform(_ck)
)
print(f"edges ck: {time.perf_counter()-t0:.3f}")
t0 = time.perf_counter()
labels = ids.select(F.col(id_col), F.col(id_col).alias("cluster_id")).transform(_ck)
init_labels = labels
n_ids = init_labels.count()
print(f"labels ck + count: {time.perf_counter()-t0:.3f} n={n_ids}")
t0 = time.perf_counter()
ne = edges.count()
print(f"edges count: {time.perf_counter()-t0:.3f} e={ne}")
_bc = F.broadcast
for r in range(20):
    t0 = time.perf_counter()
    lb = _bc(labels)
    neighbor = edges.join(lb, edges.dst == lb[id_col]).select(
        F.col("src").alias(id_col), "cluster_id"
    )
    propagated = (
        labels.unionByName(neighbor)
        .groupBy(id_col)
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    parent = propagated.select(
        F.col(id_col).alias("_pid"), F.col("cluster_id").alias("_pcluster")
    )
    new_labels = (
        propagated.join(_bc(parent), propagated.cluster_id == F.col("_pid"), "left")
        .join(
            _bc(labels.select(F.col(id_col), F.col("cluster_id").alias("_old"))),
            id_col,
            "left",
        )
        .select(
            F.col(id_col),
            F.coalesce(F.col("_pcluster"), F.col("cluster_id")).alias("cluster_id"),
            "_old",
        )
        .transform(_ck)
    )
    t1 = time.perf_counter()
    changed = new_labels.filter(~F.col("cluster_id").eqNullSafe(F.col("_old"))).count()
    t2 = time.perf_counter()
    labels = new_labels.select(id_col, "cluster_id")
    print(f"round {r}: ck={t1-t0:.3f} count={t2-t1:.3f} changed={changed}")
    if changed == 0:
        break
t0 = time.perf_counter()
nl = labels.count()
print(f"final count: {time.perf_counter()-t0:.3f} ({nl})")
spark.stop()
