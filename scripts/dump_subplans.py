"""Dump pre-checkpoint sub-plans for checkpoint-hidden operators (r12).

Full-query explain() for pagerank/LPA/kcore/etc. shows a 13-line
``Scan ExistingRDD`` stub because localCheckpoint truncates the plan
(VERDICT r11 "what's wrong" #2). This dumps the interesting sub-plans
BEFORE they are checkpointed:

  * the co-purchase edge-build DataFrame (shared by gr1/gr4/gr5/gr6/
    gr7/gr9),
  * one pagerank loop-body round (contrib join + rank update) built on
    already-checkpointed inputs, so the dump shows exactly what one
    iteration executes.

Usage: python scripts/dump_subplans.py <tag>   # writes plans/r12/*_<tag>.txt

Measurement/evidence tool only — never feeds into query paths.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_spark.session import get_session  # noqa: E402
from kafka_flink_spark.sources.fixtures import load_table  # noqa: E402
from kafka_flink_spark.suite.relational_queries import _copurchase_edges  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("dump-subplans")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")

    edges_plan = _copurchase_edges(li)
    with open(os.path.join(out_dir, f"copurchase_edges_subplan_{tag}.txt"), "w") as fh:
        fh.write(plan_text(edges_plan))

    # One pagerank round built on checkpointed inputs — mirrors
    # operators/graph.pagerank's loop body at HEAD.
    from kafka_flink_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_SCALE,
        pagerank,
    )

    edges = edges_plan.localCheckpoint()
    nodes = li.select(F.col("l_partkey").alias("id")).distinct().localCheckpoint()
    n = nodes.count()
    base = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // (PR_DAMP_DEN * n)
    pr = nodes.select(F.col("id"), F.lit(PR_SCALE // n).cast("long").alias("pr")).localCheckpoint()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # Loop body exactly as pagerank() builds it; keep in sync by hand.
    import inspect

    src = inspect.getsource(pagerank)
    if "out_e" in src:
        out_e = edges.join(deg, "src").localCheckpoint()
        prb = F.broadcast(pr)
        contrib = (
            out_e.join(prb, out_e.src == prb["id"])
            .select(
                F.col("dst"),
                F.expr(f"({PR_DAMP_NUM} * pr) div ({PR_DAMP_DEN} * deg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
    else:
        degc = deg.localCheckpoint()
        fac = degc.join(F.broadcast(pr), degc.src == pr["id"]).select(
            degc.src,
            F.expr(f"({PR_DAMP_NUM} * pr) div ({PR_DAMP_DEN} * deg)").alias("_f"),
        )
        contrib = (
            edges.join(F.broadcast(fac), "src").groupBy("dst").agg(F.sum("_f").alias("s"))
        )
    upd = nodes.join(F.broadcast(contrib), nodes["id"] == contrib.dst, "left").select(
        F.col("id"),
        (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("pr"),
    )
    with open(os.path.join(out_dir, f"pagerank_loop_body_subplan_{tag}.txt"), "w") as fh:
        fh.write(plan_text(upd))
    spark.stop()


if __name__ == "__main__":
    main()
