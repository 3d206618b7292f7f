"""Isolate simhash's final-projection cost (measurement only, r12)."""

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from pyspark.sql import functions as F

from kafka_flink_spark.operators import dedup as D
from kafka_flink_spark.operators.dedup import SIMHASH_BITS, _md5_long_expr
from kafka_flink_spark.operators.partitioning import fan_out_narrow
from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-simhash2")
docs = load_table(spark, sf_dir, "documents")


def t(label, fn, reps=3):
    xs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        xs.append(round(time.perf_counter() - t0, 3))
    print(f"{label}: {sorted(xs)}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


noop(docs)

fo = fan_out_narrow(docs)
toks = F.split(F.col("text"), " ")
hashed = fo.select(F.col("doc_id"), F.explode(toks).alias("_t")).select(
    F.col("doc_id"), _md5_long_expr(F.col("_t")).alias("h")
)
ones = [
    F.sum(F.shiftright("h", i).bitwiseAND(F.lit(1))).alias(f"o{i}")
    for i in range(SIMHASH_BITS)
]
voted = hashed.groupBy("doc_id").agg(F.count("*").alias("_n"), *ones)

sig_when = reduce(
    lambda x, y: x + y,
    [
        F.when(
            F.col(f"o{i}") * 2 > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ],
)
cur = voted.select(F.col("doc_id"), sig_when.alias("simhash"))

# planning-only cost of current form
t("plan-only current", lambda: cur._jdf.queryExecution().executedPlan(), reps=2)
t("exec current", lambda: noop(cur))

# variant: array + single HOF fold
arr = F.array(*[F.col(f"o{i}") for i in range(SIMHASH_BITS)])
sig_hof = F.aggregate(
    F.zip_with(
        arr,
        F.array(*[F.lit(1 << i).cast("long") for i in range(SIMHASH_BITS)]),
        lambda o, bit: F.when(o * 2 > F.col("_n"), bit).otherwise(F.lit(0).cast("long")),
    ),
    F.lit(0).cast("long"),
    lambda acc, x: acc + x,
)
alt = voted.select(F.col("doc_id"), sig_hof.alias("simhash"))
t("plan-only hof", lambda: alt._jdf.queryExecution().executedPlan(), reps=2)
t("exec hof", lambda: noop(alt))

# value check
a = {r["doc_id"]: r["simhash"] for r in cur.collect()}
b = {r["doc_id"]: r["simhash"] for r in alt.collect()}
print("values equal:", a == b)
spark.stop()
