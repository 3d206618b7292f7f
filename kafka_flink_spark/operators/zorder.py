"""Z-order (Morton) clustering — multi-dimensional data-skipping
layout for the write side.

A range-partitioned + sorted write on ONE column gives parquet files
(near-)disjoint min/max ranges on that column only (pinned in
tests/test_plans.py::test_range_partitioned_write_produces_skippable_files);
a predicate on any OTHER column still touches every file. Interleaving
the bits of several key columns into one Morton code and
range-writing on THAT code keeps files local in every interleaved
dimension at once: a selective filter on either column prunes most
files from footer stats alone. This is the standard lakehouse
multi-dim clustering primitive (OPTIMIZE ... ZORDER BY), built here
from pure column algebra: bit-spread + shift + or — deterministic,
codegen'd, and oracle-checkable.

Scale: the code computation is narrow; the write pays one range
exchange (sampling + shuffle) — the same cost as any sorted write.
Skipping effectiveness falls off past ~3-4 interleaved dimensions
(each dimension halves the per-file bit budget); callers choose the
2-3 columns their predicates actually hit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(
    col: Column | str, lo: Column | int, hi: Column | int, bits: int = 10
) -> Column:
    """Rescale an integer column's [lo, hi] domain onto the full
    [0, 2^bits) bucket range — REQUIRED before interleaving: Morton
    locality comes from the high bits of each dimension, and a column
    whose natural domain only touches the low bits (e.g. a 0..99 key
    under 10-bit interleave) would contribute no high bits at all,
    leaving files unclustered in that dimension. Integer arithmetic
    (floor of exact products) — deterministic and oracle-reproducible.
    Bounds may be literals or columns (e.g. broadcast-joined min/max
    aggregates, keeping the whole computation lazy and cluster-side).
    """
    x = F.col(col) if isinstance(col, str) else col
    lo_c = F.lit(lo) if isinstance(lo, int) else lo
    hi_c = F.lit(hi) if isinstance(hi, int) else hi
    span = F.greatest(F.lit(1).cast("long"), (hi_c - lo_c).cast("long"))
    return F.floor((x - lo_c) * F.lit((1 << bits) - 1) / span).cast("long")


def morton_code(cols: list[Column | str], bits: int = 10) -> Column:
    """Interleave the low ``bits`` bits of each column round-robin:
    bit j of column c lands at position ``j * len(cols) + c``. Inputs
    are masked to ``bits`` bits first (callers rescale/bucket real
    domains into that range); the result fits ``bits * len(cols)``
    bits — keep it <= 62 for a long.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("morton_code needs at least one column")
    if bits * n > 62:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed long")
    code = F.lit(0).cast("long")
    for c, col in enumerate(cols):
        x = F.col(col) if isinstance(col, str) else col
        x = x.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
        for j in range(bits):
            bit = F.shiftright(x, j).bitwiseAND(F.lit(1))
            code = code + F.shiftleft(bit, j * n + c)
    return code


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 10,
    num_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered by the Morton code of
    ``cols``: rescale each key's observed [min, max] onto the bit
    range (one tiny agg scan), range-partition on the code (file =
    contiguous code range) and sort within partitions so row groups
    inherit the locality too. The code column itself is dropped from
    the output — it is a layout key, not data.

    The min/max pre-pass reads only the key columns (column-pruned
    footer-friendly scan) and joins back as a broadcast single-row
    relation — no value ever reaches the driver; production tables
    would take the bounds from catalog statistics instead.
    """
    bounds = df.agg(
        *[f for c in cols for f in (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))]
    )
    annotated = df.crossJoin(F.broadcast(bounds))
    scaled = [
        scale_to_bits(c, F.col(f"_lo_{c}"), F.col(f"_hi_{c}"), bits) for c in cols
    ]
    zcol = "_zorder"
    bound_cols = [f"_{side}_{c}" for c in cols for side in ("lo", "hi")]
    (
        annotated.withColumn(zcol, morton_code(scaled, bits))
        .drop(*bound_cols)
        .repartitionByRange(num_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )
