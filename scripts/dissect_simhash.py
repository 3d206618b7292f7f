"""One-off microbench of simhash stages (measurement only, r12)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from pyspark.sql import functions as F

from kafka_flink_spark.operators import dedup as D
from kafka_flink_spark.operators.dedup import SIMHASH_BITS, _md5_long_expr
from kafka_flink_spark.operators.partitioning import fan_out_narrow
from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-simhash")
docs = load_table(spark, sf_dir, "documents")


def t(label, fn, reps=3):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(time.perf_counter() - t0)
    print(f"{label}: {sorted(xs)}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(docs)  # warm

fo = fan_out_narrow(docs)
toks = F.split(F.col("text"), " ")
exploded = fo.select(F.col("doc_id"), F.explode(toks).alias("_t"))
hashed = exploded.select(F.col("doc_id"), _md5_long_expr(F.col("_t")).alias("h"))

t("A fan_out only", lambda: noop(fo))
t("B explode", lambda: noop(exploded))
print("n tokens:", exploded.count())
t("C explode+md5", lambda: noop(hashed))

ones = [
    F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1))).alias(f"o{i}")
    for i in range(SIMHASH_BITS)
]
voted = hashed.groupBy("doc_id").agg(F.count("*").alias("_n"), *ones)
t("D voted (60 sums)", lambda: noop(voted))

# E: full simhash
t("E simhash()", lambda: noop(D.simhash(docs)))

# F: single-array aggregate alternative: sum 60 bits as an array
arr = F.array(*[F.shiftright("h", i).bitwiseAND(F.lit(1)) for i in range(SIMHASH_BITS)])
voted_arr = (
    hashed.select("doc_id", arr.alias("bits"))
    .groupBy("doc_id")
    .agg(
        F.count("*").alias("_n"),
        F.reduce(
            F.collect_list("bits"),
            F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("ones"),
    )
)
# not value-checked; timing only
t("F collect+fold", lambda: noop(voted_arr))
spark.stop()
