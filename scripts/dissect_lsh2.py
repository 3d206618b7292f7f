"""One-off: eager-vs-lazy persist variants of minhash_lsh_pairs
(measurement only, r12). Copies the operator with materialization
knobs; values cross-checked against the production operator."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_flink_spark.operators import dedup as D
from kafka_flink_spark.operators.dedup import NUM_BANDS, NUM_PERMS, shingle_array
from kafka_flink_spark.operators.partitioning import fan_out_narrow
from kafka_flink_spark.session import get_session
from kafka_flink_spark.sources.fixtures import load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session("dissect-lsh2")
docs = load_table(spark, sf_dir, "documents")


def variant(df, mode, min_jaccard=0.5, bucket_cap=None):
    """mode: 'lazy' (production), 'eager' (localCheckpoint the shared
    roots), 'barrier' (persist+count)."""
    id_col, col = "doc_id", "text"
    rows_per_band = NUM_PERMS // NUM_BANDS
    sig_cols = [f"mh{p}" for p in range(NUM_PERMS)]
    df = fan_out_narrow(df)
    sigs = D.minhash_signatures(df, col, id_col, NUM_PERMS, fan_out=False)
    sigs = sigs.withColumn(
        "_gfp", F.md5(F.concat_ws(":", *[F.col(c).cast("string") for c in sig_cols]))
    )
    if mode == "lazy":
        sigs = sigs.persist()
    elif mode == "eager":
        sigs = sigs.localCheckpoint()
    else:
        sigs = sigs.persist()
        sigs.count()
    members = sigs.select(F.col(id_col), "_gfp")
    reps = sigs.groupBy("_gfp").agg(
        F.min(id_col).alias("_rep"),
        F.count("*").alias("_n"),
        *[F.first(c).alias(c) for c in sig_cols],
    )
    if mode == "lazy":
        reps = reps.persist()
    elif mode == "eager":
        reps = reps.localCheckpoint()
    else:
        reps = reps.persist()
        reps.count()
    band_arr = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(NUM_BANDS)
        ]
    )
    banded = reps.select(
        "_gfp", F.col("_rep"), F.posexplode(band_arr).alias("band_id", "band_key")
    )
    small = banded
    star_pairs = None
    a = small.alias("a")
    b = small.alias("b")
    grp_pairs = a.join(
        b,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a._rep") < F.col("b._rep")),
    ).select(F.col("a._gfp").alias("_gfp_a"), F.col("b._gfp").alias("_gfp_b"))
    grp_pairs = grp_pairs.dropDuplicates(["_gfp_a", "_gfp_b"])
    ma = members.select(F.col(id_col).alias("_ida"), F.col("_gfp").alias("_gfp_a"))
    mb = members.select(F.col(id_col).alias("_idb"), F.col("_gfp").alias("_gfp_b"))
    cross = (
        grp_pairs.join(ma, "_gfp_a")
        .join(mb, "_gfp_b")
        .select(
            F.least("_ida", "_idb").alias("doc_a"),
            F.greatest("_ida", "_idb").alias("doc_b"),
        )
    )
    dup_groups = reps.filter(F.col("_n") > 1).select("_gfp")
    dup_members = members.join(dup_groups, "_gfp")
    wa = dup_members.select(F.col("_gfp"), F.col(id_col).alias("_ida"))
    wb = dup_members.select(F.col("_gfp"), F.col(id_col).alias("_idb"))
    within = (
        wa.join(wb, "_gfp")
        .filter(F.col("_ida") < F.col("_idb"))
        .select(F.col("_ida").alias("doc_a"), F.col("_idb").alias("doc_b"))
    )
    cand = cross.unionByName(within)
    if mode == "lazy":
        cand = cand.persist()
    elif mode == "eager":
        cand = cand.localCheckpoint()
    else:
        cand = cand.persist()
        cand.count()
    cand_ids = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    cand_sh = df.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), shingle_array(col).alias("sh")
    )
    if mode == "lazy":
        cand_sh = cand_sh.persist()
    elif mode == "eager":
        cand_sh = cand_sh.localCheckpoint()
    else:
        cand_sh = cand_sh.persist()
        cand_sh.count()
    sa = cand_sh.select(F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = cand_sh.select(F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(common / (F.size("sh_a") + F.size("sh_b") - common), 6),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


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
for mode in ("lazy", "eager", "barrier", "lazy"):
    t(f"cap=None {mode}", lambda m=mode: noop(variant(docs, m)))

# value check eager vs production
prod = {tuple(r) for r in D.minhash_lsh_pairs(docs, min_jaccard=0.5, bucket_cap=None).collect()}
eag = {tuple(r) for r in variant(docs, "eager").collect()}
print("values equal:", prod == eag, len(prod))
spark.stop()
