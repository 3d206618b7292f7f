"""Range (interval) joins for big×big relations — the join family the
reference's SQL layer lacks entirely and Spark only plans as a
broadcast-nested-loop unless the range predicate is rewritten.

The binning rewrite: bucket both sides by a coarse time bin sized to
the radius, explode the LEFT side to its bin ±1 neighbors, equi-join
on the bin (a plain shuffled hash join — partition-parallel, no
nested loop), then apply the exact range predicate as a post-filter.
Every qualifying pair appears EXACTLY once because the join key is
the RIGHT row's own bin (the left explosion covers all bins a
neighbor within the radius can live in; each right row has one bin).

At 100 TB this is the difference between a cartesian (never finishes)
and a shuffle join whose fan-in per bin is bounded by event density ×
radius. Skewed hot bins (traffic spikes) can be salted with
operators/skew.py like any hot equi-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_proximity_pairs(
    df: DataFrame,
    radius_seconds: int = 5,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Self range-join: all pairs of rows within ``radius_seconds`` of
    each other (pair emitted once, ``id_a < id_b``). Returns the raw
    pair relation (id_a, id_b, dt_us); callers aggregate.
    """
    us = F.unix_micros(F.col(ts_col))
    radius_us = radius_seconds * 1_000_000
    # Exact integer floor-division for the bin: long `/` goes through
    # double, so a timestamp within ~1 ulp of a bin boundary could
    # round across it and silently miss a pair. pmod + `div` stays in
    # bigint arithmetic end-to-end (pmod makes it floor semantics for
    # negative epochs too).
    binned = df.select(F.col(id_col).alias("_id"), us.alias("_us")).withColumn(
        "_bin",
        F.expr(
            f"(_us - pmod(_us, CAST({radius_us} AS BIGINT)))"
            f" div CAST({radius_us} AS BIGINT)"
        ),
    )
    left = binned.select(
        "_id",
        "_us",
        F.explode(
            F.array(F.col("_bin") - 1, F.col("_bin"), F.col("_bin") + 1)
        ).alias("_jbin"),
    )
    right = binned.select(
        F.col("_id").alias("_rid"), F.col("_us").alias("_rus"), F.col("_bin").alias("_jbin")
    )
    return (
        left.join(right, "_jbin")
        .filter(
            (F.col("_id") < F.col("_rid"))
            & (F.abs(F.col("_us") - F.col("_rus")) <= radius_us)
        )
        .select(
            F.col("_id").alias("id_a"),
            F.col("_rid").alias("id_b"),
            (F.col("_rus") - F.col("_us")).alias("dt_us"),
        )
    )
