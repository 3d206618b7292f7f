"""Graph + behavioral analytics over the TPC-H-ish fixtures — the
round-5 public surface, composed exactly as a production run would:

    python examples/graph_analytics.py

1. co-purchase graph build (parts sharing an order),
2. PageRank (integer fixed-point — bit-reproducible on any cluster),
3. triangle count (degree-ordered orientation),
4. weakly-connected components (min-label pointer doubling),
5. strict sequential funnel view -> click -> purchase with exact
   per-step latencies,
6. weighted priority sampling of documents by token count.

Every stage is declarative and bounded: the iterative ops truncate
lineage per round and read only scalar convergence counts on the
driver. Swap the fixture reads for the production lake and this file
IS the job.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from kafka_flink_spark.operators.graph import (
        bfs_levels,
        connected_components,
        label_propagation,
        pagerank,
        triangle_count,
    )
    from kafka_flink_spark.operators.text import weighted_priority_sample
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.sources.fixtures import load_table

    spark = get_session("graph-analytics-example")

    # 1. co-purchase edges: parts sharing an order (both directions for
    # PageRank; triangle/component ops canonicalize orientation).
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .distinct()
    )
    nodes = li.select(F.col("l_partkey").alias("id")).distinct()

    pr = pagerank(nodes, edges, "id", iterations=5)
    top = pr.orderBy(F.desc("pr")).limit(5).collect()
    print("top PageRank parts:", [(r.id, r.pr) for r in top])

    tri = triangle_count(edges).collect()[0]
    print(
        f"graph: {tri.n_nodes} nodes, {tri.n_edges} edges, "
        f"{tri.n_triangles} triangles"
    )

    cc = connected_components(nodes, edges, "id")
    comp_sizes = (
        cc.groupBy("component_id").count().orderBy(F.desc("count")).limit(3).collect()
    )
    print("largest components:", [(r.component_id, r["count"]) for r in comp_sizes])

    # 4b. communities (self-inclusive deterministic LPA) and hop
    # distances from the first order's parts — the rest of the family
    lp = label_propagation(nodes, edges, "id", iterations=2)
    comm = (
        lp.groupBy("community_id").count().orderBy(F.desc("count")).limit(3).collect()
    )
    print("largest communities:", [(r.community_id, r["count"]) for r in comm])

    seed = (
        li.join(
            F.broadcast(li.agg(F.min("l_orderkey").alias("k"))),
            li.l_orderkey == F.col("k"),
        )
        .select(F.col("l_partkey").alias("id"))
        .distinct()
    )
    hops = bfs_levels(nodes, edges, seed, "id", max_hops=3)
    hist = hops.groupBy("dist").count().orderBy("dist").collect()
    print("BFS hop histogram:", [(r.dist, r["count"]) for r in hist])

    # 5. behavioral funnel over the event stream
    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_type", "ts")
    us = F.unix_micros("ts")
    base = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(base, "user_id")
        .filter(us > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min(us).alias("c_us"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(us > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min(us).alias("p_us"))
    )
    funnel = (
        base.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .agg(
            F.count("v_us").alias("viewed"),
            F.count("c_us").alias("clicked_after_view"),
            F.count("p_us").alias("purchased_after_click"),
        )
        .collect()[0]
    )
    print(
        f"funnel: {funnel.viewed} viewed -> {funnel.clicked_after_view} "
        f"clicked -> {funnel.purchased_after_click} purchased"
    )

    # 6. weighted sample of documents, inclusion ∝ token count
    docs = load_table(spark, SF_DIR, "documents")
    sample = weighted_priority_sample(docs, k=5).collect()
    print("weighted sample:", [(r.doc_id, r.n_tokens) for r in sample])

    spark.stop()


if __name__ == "__main__":
    main()
