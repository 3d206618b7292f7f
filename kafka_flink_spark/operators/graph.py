"""Graph analytics over relation-derived edge sets — the iterative
family next to connected components (``operators/dedup.dedup_clusters``).

PageRank here is **integer fixed-point**: ranks are scaled longs
(SCALE = 1e12) and every update is integer multiply / integer divide —
``base + Σ (85 * pr_nbr) div (100 * deg_nbr)`` — so the result is
bit-identical under any partitioning, aggregation order, or engine
(float PageRank drifts in the last ulps per iteration and can't be
hash-compared against an oracle). The damping redistribution of
dangling-node mass is deliberately dropped (isolated nodes keep the
base rank only); both the operator and its oracle implement the same
simplified recurrence.

Scale shape: per iteration one join (edges ⋈ ranks, shuffled on the
edge key) and one aggregation — the Pregel cost model measured for
``dedup_clusters`` in SCALING.md (rounds × shuffle, flat in corpus
mass at fixed round count). ``localCheckpoint`` per round truncates
the growing lineage, which is otherwise the classic iterative-Spark
trap. Fixed iteration count (no convergence test) keeps the oracle
expressible as unrolled SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    iterations: int = 10,
) -> DataFrame:
    """Fixed-point PageRank: ``nodes`` one row per node (column
    ``id_col``), ``edges`` directed (columns ``src``/``dst``; pass
    both directions for an undirected graph). Returns (id, pr) with
    pr a long in units of 1/PR_SCALE."""
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank needs at least one node")
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # out-edges annotated with source degree, reused every round
    out_e = edges.join(deg, "src").localCheckpoint()
    pr = nodes.select(
        F.col(id_col), F.lit(PR_SCALE // n).cast("long").alias("pr")
    ).localCheckpoint()
    for _ in range(iterations):
        contrib = (
            out_e.join(pr, out_e.src == pr[id_col])
            .select(
                F.col("dst"),
                F.expr(
                    f"({PR_DAMP_NUM} * pr) div ({PR_DAMP_DEN} * deg)"
                ).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.join(contrib, nodes[id_col] == contrib.dst, "left")
            .select(
                F.col(id_col),
                (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("pr"),
            )
            .localCheckpoint()
        )
    return pr
