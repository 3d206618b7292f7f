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
min over depths d of counter[d][byte d of md5_60bit('cms:' || key)].

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


def _key_hash(key: Column) -> Column:
    """One 60-bit md5 per key; every depth's bucket slices out of it."""
    return md5_long(F.concat(F.lit("cms:"), key.cast("string")))


def _buckets(h: Column, depth: int, width: int) -> Column:
    """Array of per-depth counter indices: byte d of the single md5
    digest (width must be a power of two <= 256 so the byte masks to a
    uniform bucket). One digest per row instead of one per (row,
    depth) — md5 dominates the sketch build cost, and the md5 bytes
    are independent uniform hashes, the standard CMS implementation
    trick."""
    if 256 % width != 0:
        raise ValueError(f"width ({width}) must divide 256 (byte-sliced buckets)")
    if depth > 7:
        raise ValueError(f"depth ({depth}) > 7 exhausts the 60-bit digest's bytes")
    return F.array(
        *[F.shiftright(h, 8 * d).bitwiseAND(F.lit(width - 1)) for d in range(depth)]
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
    return (
        df.select(_key_hash(df[key_col]).alias("_h"))
        .select(F.posexplode(_buckets(F.col("_h"), depth, width)).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("c"))
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
    probes = keys.select(
        F.col(key_col), _key_hash(F.col(key_col)).alias("_h")
    ).select(
        key_col, F.posexplode(_buckets(F.col("_h"), depth, width)).alias("d", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").cast("long").alias("cms_est"))
    )
