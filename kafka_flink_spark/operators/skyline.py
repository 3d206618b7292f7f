"""Distributed 2D skyline (Pareto frontier) — dominance queries.

``skyline_2d`` returns the rows not DOMINATED under joint
minimization of two columns: p dominates q iff p.x ≤ q.x ∧ p.y ≤ q.y
∧ (p.x < q.x ∨ p.y < q.y). The classic "best tradeoff" query
(cheapest part at every size, fastest route at every cost, …) — the
reference family has no dominance surface at all; OLAP engines ship
it as SKYLINE OF / window tricks.

Scale design — the sorted-scan identity, distributed
-----------------------------------------------------
On a single machine the 2D skyline is a sort by x plus one running
min over y. The distributed form keeps that O(n log n) shape with no
self-join and no single-task global window:

1. **Value buckets.** One min/max aggregate of x (1 row, broadcast)
   defines B equal-width buckets — deterministic, no sampling, no
   driver round-trip beyond the broadcast itself.
2. **Within-bucket prev-min.** Per bucket, ``min(y)`` over
   ``ORDER BY x RANGE UNBOUNDED PRECEDING .. 1 PRECEDING`` (RANGE, so
   same-x rows are excluded) — a bucket-parallel window.
3. **Cross-bucket handoff.** Per-bucket ``min(y)`` aggregates (B
   rows) get an EXCLUSIVE running min over bucket index and broadcast
   back — the only cross-partition dependency, B rows total.
4. **Survive test.** A row survives iff ``y < least(within_prev_min,
   cross_prev_min)`` (strict: an equal y at smaller x dominates) and
   ``y = min(y) over same-x rows`` (a same-x smaller-y row
   dominates). Exact-duplicate (x, y) rows co-survive — neither
   dominates the other.

Everything is window + broadcast-join + codegen projection: one
shuffle of the (x, y, payload) rows into buckets, one B-row
broadcast. No crossJoin, no NOT EXISTS anti-join (the naive plan is
quadratic in the skyline's candidate set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_buckets: int = 64,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier under joint minimization
    of ``x_col`` and ``y_col`` (all other columns ride along)."""
    x, y = F.col(x_col), F.col(y_col)
    span = df.agg(
        F.min(x).cast("double").alias("_x0"), F.max(x).cast("double").alias("_x1")
    )
    b = df.crossJoin(F.broadcast(span)).withColumn(
        "_b",
        F.when(
            F.col("_x1") > F.col("_x0"),
            F.least(
                F.floor(
                    (x.cast("double") - F.col("_x0"))
                    / ((F.col("_x1") - F.col("_x0")) / num_buckets)
                ),
                F.lit(num_buckets - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).drop("_x0", "_x1")

    w_prev = (
        Window.partitionBy("_b")
        .orderBy(x)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_samex = Window.partitionBy("_b", x_col)
    b = b.withColumn("_prev_min", F.min(y).over(w_prev)).withColumn(
        "_samex_min", F.min(y).over(w_samex)
    )

    bucket_mins = b.groupBy("_b").agg(F.min(y).alias("_bm"))
    w_cum = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    cross = bucket_mins.select(
        "_b", F.min("_bm").over(w_cum).alias("_cross_min")
    )

    prev: Column = F.least(
        F.coalesce("_prev_min", "_cross_min"),
        F.coalesce("_cross_min", "_prev_min"),
    )
    survive = (prev.isNull() | (y < prev)) & (y == F.col("_samex_min"))
    return (
        b.join(F.broadcast(cross), "_b", "left")
        .filter(survive)
        .drop("_b", "_prev_min", "_samex_min", "_cross_min")
    )
