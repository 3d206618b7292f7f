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
# FIRST 50 queries in iteration order each round; rounds 1-5 covered
# 230 distinct driver-checked names (227 hash-green + g7/g13/g16
# rows-only, 0 failing — CORRECTNESS_r0{1..5}.json, VERDICT r5).
# Round 6 closes the registry's evidence gap per VERDICT r5 task 1:
# all 44 names with no hash-green row anywhere lead (the 41
# session-4/5/6 additions VERDICT itemized, plus g7/g13/g16 which
# convert from rows-only to hash-green this round via deterministic
# within_bound booleans — VERDICT task 3). The two round-6 additions
# (d13 capped-bucket dedup per VERDICT task 4, pipe10 banded-LSH
# canonical selection per task 6) follow, and the 4 spare slots
# re-attest d4 (its banding core was extracted into
# dedup.hamming_near_pairs in round-5 session 6, after the r5 driver
# run froze — d5 re-earned its row through the shared path, d4 has
# not) and the three re-attests round 5 displaced (pipe3 exact-cap
# pin, pipe4 persist pin, t28 regex widening — all sim-green,
# never re-rowed).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- never hash-green (44) ----
    # U6 cogroup twin first (VERDICT: last §2 surface piece w/o a row)
    "u10_cogrouped_asof",
    # sketches, converted rows-only -> within_bound hash-green (task 3)
    "g7_approx_distinct_sketch",
    "g13_approx_percentile_sketch",
    "g16_hll_sketch_union",
    # session-4 additions
    "e13_linear_interpolation",
    "e14_ewma_smoothing",
    "e15_attribution_touch",
    "t34_boilerplate_removal",
    "t35_token_entropy",
    "d10_lsh_recall_eval",
    "d11_prefix_filter_jaccard",
    "gr4_label_propagation",
    "gr5_bfs_levels",
    "io19_incremental_join_maintenance",
    "io20_snapshot_diff",
    "g23_pareto_frontier",
    # session-5 additions
    "e16_cep_followed_by",
    "e17_ab_test_welch",
    "fe1_decile_binning",
    "fe2_target_encoding",
    "fe3_feature_hashing",
    "w27_stream_dynamic_gap_sessions",
    "w28_stream_psi_drift",
    "gr6_kcore_peeling",
    "gr7_personalized_pagerank",
    "qa3_psi_drift",
    "qa4_partition_skew_report",
    "v13_ivfpq_rerank_topk",
    "pipe8_canonical_selection",
    "d12_containment_pairs",
    # session-6 additions
    "t36_line_dedup",
    "t37_dsir_importance",
    "gr8_link_prediction",
    "e18_cusum_changepoint",
    "e19_seasonal_decompose",
    "e20_survival_km",
    "e21_top_paths",
    "fe4_robust_scaler",
    "fe5_rfm_segmentation",
    "w29_stream_cusum_monitor",
    "g24_association_rules",
    "m8_perceptual_near_dup",
    "cl2_silhouette_eval",
    "pipe9_entity_resolution",
    # ---- round-6 additions (2) ----
    "d13_minhash_capped_skew",
    "pipe10_canonical_selection_lsh",
    # w30 (round-6 addition: W9 event-time timers inside the value
    # hash) outranks the weakest re-attest (t28, whose round-5 regex
    # widening is mirrored verbatim on both sides and sim-green) —
    # the same never-checked-beats-re-attest judgment round 5 made.
    "w30_stream_event_timer_finals",
    # ---- re-attests (3) ----
    "d4_simhash_signatures",
    "pipe3_leakage_safe_split",
    "pipe4_quality_dedup_corpus",
    # ---- 50-query budget line (round 6): exactly 50 names ----
    # Round-7 rotation queue (replace this tuple at r7 start): lead
    # with any name the r6 CORRECTNESS run left non-green, then
    # w31_stream_simhash_dedup, io22_dynamic_partition_pruning and
    # w32_allowed_lateness_refire
    # (added after the r6 tuple froze; sim-attested both SFs), then
    # re-attest t28
    # (displaced twice) and the oldest r1/r2-era green rows so
    # cumulative evidence stays fresh.
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
