"""Mergeable frequency sketches — the count-min sketch, built from
plain DataFrame aggregates.

Completes the engine's sketch trio (HyperLogLog distinct counts =
``g7``, Greenwald-Khanna percentiles = ``g13``, CMS frequencies =
``g15``): the three bounded-memory summaries a 100 TB engine needs for
cardinality / quantiles / heavy-hitter frequency without exact
grouping.

Unlike HLL/GK (whose estimates are algorithm-implementation-specific),
a CMS built on explicit md5 hash rows is **fully deterministic**, so
the estimate itself is oracle-checkable in DuckDB: estimate(key) =
min over depths d of counter[d][md5_60bit(d:key) % width].

Scale design: the sketch table is ``depth x width`` rows (a few KB)
regardless of input size — produced by one map-side-combined
aggregation over the (row x depth) fan-out, then **broadcast** back to
score any key set. Sketches from disjoint data shards merge by adding
counters (the same groupBy), which is the property that matters on a
1000-executor cluster: no single-point exact count, constant-size
state, one narrow scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_flink_spark.functions.hashing import md5_long

CMS_DEPTH = 4
CMS_WIDTH = 256


def _bucket(key: Column, d: Column, width: int) -> Column:
    """Row d's counter index for ``key``: md5_60bit('cms:d:key') % width."""
    return F.pmod(
        md5_long(F.concat(F.lit("cms:"), d.cast("string"), F.lit(":"), key.cast("string"))),
        F.lit(width),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the count-min sketch table: one row per (d, bucket) with
    its collision-summed count. Each input row fans out to ``depth``
    (d, bucket) pairs (narrow explode), partial aggregation collapses
    them map-side, and the shuffled result is at most depth*width rows
    — constant-size whatever the input."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    fanned = df.select(df[key_col].alias("_k"), d).withColumn(
        "bucket", _bucket(F.col("_k"), F.col("d"), width)
    )
    return fanned.select("d", "bucket").groupBy("d", "bucket").agg(
        F.count("*").alias("c")
    )


def cms_estimate(
    df: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimate each key's frequency from the sketch: min over depths
    of the key's counter. The sketch side is depth*width rows —
    broadcast — so scoring any key set is a narrow map-side join plus
    a groupBy on the key. Guarantees: estimate >= true count always;
    estimate <= true + e/width * N with probability 1 - exp(-depth)
    (error bound pinned in tests/test_llm_ops.py)."""
    sketch = cms_build(df, key_col, depth, width)
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    probes = keys.select(F.col(key_col), d).withColumn(
        "bucket", _bucket(F.col(key_col), F.col("d"), width)
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").cast("long").alias("cms_est"))
    )
