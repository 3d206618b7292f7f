"""Query suite registry.

Every implemented operator from SURVEY.md §2 (plus the LLM-data
extensions) registers here as a named pair:

* a Spark callable ``(spark, sf_dir) -> DataFrame`` — the engine path;
* an equivalent ANSI-SQL string for DuckDB — the differential oracle
  (omitted only for genuinely non-SQL-expressible operators, which the
  driver then checks rows-only).

Conventions that keep the driver's order-insensitive value-hash
comparison meaningful (driver contract, ``__spark_entry__.py``):

* every computed column is aliased identically on both sides;
* timestamps are rendered to ``yyyy-MM-dd HH:mm:ss[.SSSSSS]`` strings
  (UTC) on both sides — engine-native timestamp objects stringify
  differently across Spark/DuckDB/pandas;
* aggregated doubles are rounded to a fixed scale on both sides (sum
  order differs between engines; raw parquet doubles pass through
  un-rounded since both engines read identical bits);
* integer aggregates are cast to BIGINT on both sides (DuckDB SUM
  returns HUGEINT) — including window sums (``sum() OVER``) and any
  arithmetic derived from them, which otherwise leak HUGEINT into
  pandas as float64 while Spark sends int64;
* array columns render as delimiter-joined strings on both sides
  (Spark ``array_join``, DuckDB ``array_to_string``) — the driver's
  canonicalizer sorts every column in pandas, and numpy arrays are
  unhashable there.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_spark.session import apply_runtime_conf


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Suite modules; importing them populates the registry. Ordered so a
# time-budgeted consumer iterating queries() in insertion order hits
# the flagship candles, training-data ops, and streaming executions
# before the (large, conventional) relational tail.
_MODULES = (
    "kafka_flink_spark.suite.candles_queries",
    "kafka_flink_spark.suite.llm_queries",
    "kafka_flink_spark.suite.streaming_queries",
    "kafka_flink_spark.suite.events_queries",
    "kafka_flink_spark.suite.warehouse_queries",
    "kafka_flink_spark.suite.relational_queries",
    "kafka_flink_spark.suite.io_queries",
    "kafka_flink_spark.suite.rich_udf_queries",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name, wrapped, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(mod)


# Driver-verification rotation. The correctness driver samples the
# FIRST 50 queries in iteration order each round; rounds 1-6 covered
# 274 distinct driver-checked names, all green (CORRECTNESS_r0{1..6},
# VERDICT r6). Round 7 executes the queue VERDICT r6 tasks 1 and 7
# prescribe: the r6 run left NOTHING non-green, so the tuple leads
# with the only 3 registry names that have never had a driver row
# (io22/w31/w32, added after the r6 tuple froze; judge-verified 3/3
# and sim-attested at both SFs), then re-attests t28 (displaced from
# the rotation twice, r5 and r6) and the evidence tail: all 40
# queries whose only driver row is round 1, plus this round's new
# registration (w33 capped stream near-dup) and 5 load-bearing
# round-2 rows (the flagship candle pair, the exact/ngram dedup
# core, the as-of join) = 50.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- never driver-checked (3) — VERDICT r6 task 1 ----
    "io22_dynamic_partition_pruning",
    "w31_stream_simhash_dedup",
    "w32_allowed_lateness_refire",
    # ---- round-7 additions — never-checked beats re-attest, as in
    # r5/r6: the capped stream near-dup (VERDICT r6 task 3), then the
    # session-2 trio (KMV sketch + its streaming twin + NN-descent),
    # each sim-attested hash-green at sf0.001/0.01/0.1 before entering
    # the tuple. They displace four round-2-era re-attests (a2, d2,
    # j6, d1 -> r8 queue) under the 50-name budget. ----
    "w33_stream_simhash_dedup_capped",
    "g25_kmv_theta_intersection",
    "w34_stream_kmv_overlap",
    "v14_nn_descent_knn_graph",
    "w35_stream_cms_heavy_hitters",
    "e22_holt_forecast",
    "pipe11_hybrid_retrieval_rrf",
    "gr9_modularity",
    "w36_stream_ann_serving",
    # ---- twice-displaced re-attest ----
    "t28_url_dedup",
    # ---- oldest evidence: every round-1-only row (40) ----
    "f1_filter_project",
    "f2_null_semantics",
    "g1_pricing_summary",
    "g2_distinct_agg",
    "g3_rollup",
    "g4_cube",
    "g5_having",
    "g6_percentiles",
    "g8_pivot",
    "g9_unpivot",
    "j1_join_broadcast_inner",
    "j2_join_left_outer",
    "j3_join_semi",
    "j4_join_anti",
    "j5_join_range",
    "p4_passthrough",
    "q_customer_distribution",
    "q_disjunctive_parts",
    "q_forecast_revenue",
    "q_idle_rich_customers",
    "q_large_orders",
    "q_local_supplier_volume",
    "q_nation_trade_flows",
    "q_order_priority",
    "q_promo_revenue",
    "q_returned_items",
    "q_shipping_priority",
    "s1_sort_limit",
    "sc1_datetime_functions",
    "sc2_string_functions",
    "sc3_json_functions",
    "sc4_array_functions",
    "set1_union_distinct",
    "set2_intersect",
    "set3_except",
    "sub1_scalar_subquery",
    "sub2_correlated_subquery",
    # ---- round-2-era refresh: none left — a1 yielded its slot to
    # e22 (the flagship is smoke-checked through entry() every round);
    # w3 and w2 yielded the last round-1 slots to pipe11 and gr9. ----
    # ---- 50-query budget line (round 7): exactly 50 names ----
    # Round-8 rotation queue (replace this tuple at r8 start): lead
    # with any r7 non-green, then any new r8 registrations, then the
    # displaced w1/w2/w3/a1/a2/d1/d2/j6 and the remaining
    # round-2-only rows, oldest-first.
)


def all_queries() -> dict[str, Query]:
    _load()
    front = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    rest = {n: q for n, q in _REGISTRY.items() if n not in front}
    return {**front, **rest}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark_fn for q in all_queries().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
