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
# FIRST 50 queries in iteration order each round; rounds 1–4 covered
# 187 unique names (182 full hash-green + 5 rows-only by design, 0
# failing — see CORRECTNESS_r0{1..4}.json and VERDICT round 4). Round
# 5 finishes the registry: the 32 queries that have never received a
# driver row lead (every late-round-4 addition plus the TPC-H
# relational tail the r4 budget line spilled), exactly the queue
# VERDICT r4 task 1 prescribed. The ~18 spare slots re-attest the
# five rows-only names (g7/g13/g16/t25/t26 — sketch/iterative ops
# whose pinning is error-bound or pure-Python-reference pytest, plus
# t26 which gained a frozen-merges oracle this round) and re-run the
# queries whose code or oracle changed in round 5 (d3/d5 bucket_cap
# pinned exact per ADVICE, gr1/gr2 edge-checkpoint perf fix, e11
# oracle tie-break, t28 tracking-param regex widened) so their green
# rows stay current.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # ---- never driver-checked (32) ----
    # late-round-4 additions, sim-verified in r4
    "t31_bm25_scores",
    "v11_pq_adc_topk",
    "io12_exactly_once_sink",
    "pipe7_web_corpus_pipeline",
    "g19_mode_median_minmax_by",
    "set4_bag_semantics",
    "g20_bitmap_distinct",
    "sc12_try_functions",
    "qa2_expectation_checks",
    "r2_recursive_bom_explosion",
    "e11_dynamic_session_gap",
    "g21_listagg_ordered",
    "w6_null_aware_window_nav",
    "io13_csv_malformed_handling",
    "t32_model_quality_filter",
    "v12_ivfpq_adc_topk",
    "io14_key_deletion_sweep",
    "sub4_not_in_null_semantics",
    # TPC-H relational tail (14 conventional shapes)
    "s2_sort_null_ordering",
    "sub3_lateral_topn",
    "r1_recursive_month_spine",
    "q_yoy_growth",
    "q_top_supplier",
    "q_market_share",
    "q_small_qty_revenue",
    "q_min_price_supplier",
    "q_product_profit",
    "q_shipping_delay_priority",
    "q_important_parts",
    "q_supplier_part_counts",
    "q_dominant_suppliers",
    "q_waiting_suppliers",
    # ---- rows-only re-attestation (t25/t26 now oracle-paired; the
    # unchanged g7/g16 sketches keep their earlier rows) ----
    "t26_bpe_encode_stats",
    "t25_bpe_train_merges",
    # ---- round-5 code/oracle changes: keep the green rows current ----
    "d3_minhash_lsh_pairs",
    "d5_simhash_near_pairs",
    "d7_dedup_clusters",
    # io16/s12 (K4 JDBC roundtrip; S7 streaming-generator replay —
    # both new) take gr1/gr2's re-attest slots: the graph ops'
    # round-5 change was a physical-only localCheckpoint pin
    # (identical results), so their r4 green rows stand and BENCH_r05
    # carries their perf re-measure.
    "io16_jdbc_roundtrip",
    "s12_streaming_generator_replay",
    # s11 (S2/S3 offset semantics, new this round) takes e10's
    # re-attest slot: e10's round-5 change was a default-preserving
    # parameterization on both sides, so its r4 green row stands.
    "s11_kafka_log_offset_replay",
    # round-5 operator additions
    "gr3_connected_components",
    "e12_funnel_steps",
    "t33_weighted_priority_sample",
    # round-5 one-pass/persist rewrites (semantics-identical; re-earn
    # rows; pipe7's rewrite is covered by its entry in the
    # never-checked block above)
    "pipe1_document_pipeline",
    "pipe2_training_mix",
    # round-5 tail additions (bucketed co-located join; salted skew
    # join). g13's re-attest slot went to io15 — its rows-only row
    # from r4 stands and neither its code nor check strength changed.
    "io15_bucketed_colocated_join",
    "j12_salted_skew_join",
    # late round-5 additions (CDC changelog apply, SCD2 build, salted
    # two-phase exact distinct) take the pipe3/pipe4/t28 re-attest
    # slots: pipe4's round-5 change is physical-only (multi-consumer
    # persist pin, r4 green row stands), pipe3's exact-cap pin is a
    # no-op at sf0.01 bucket sizes (r2 green row stands), and t28's
    # regex widening is mirrored verbatim on both engine and oracle
    # sides (sim-green) — never-checked new queries outrank all three.
    "io17_cdc_changelog_apply",
    "io18_scd2_dimension_build",
    "g22_hot_key_distinct_twophase",
    # ---- 50-query budget line (round 5): exactly 50 names ----
)

# Round-6 rotation plan (do NOT reorder the active tuple above this
# round): lead with the session-4 additions, none of which have a
# driver row yet — e13_linear_interpolation, e14_ewma_smoothing,
# t34_boilerplate_removal, d10_lsh_recall_eval,
# d11_prefix_filter_jaccard, gr4_label_propagation, gr5_bfs_levels,
# io19_incremental_join_maintenance, io20_snapshot_diff,
# g23_pareto_frontier, t35_token_entropy, e15_attribution_touch —
# plus the session-5 additions (e16_cep_followed_by,
# e17_ab_test_welch, fe1_decile_binning, fe2_target_encoding,
# w27_stream_dynamic_gap_sessions, gr6_kcore_peeling,
# qa3_psi_drift, v13_ivfpq_rerank_topk, pipe8_canonical_selection,
# fe3_feature_hashing, d12_containment_pairs,
# w28_stream_psi_drift, qa4_partition_skew_report,
# gr7_personalized_pagerank) and the session-6 additions
# (t36_line_dedup, gr8_link_prediction, e18_cusum_changepoint,
# fe4_robust_scaler, pipe9_entity_resolution, e19_seasonal_decompose,
# u10_cogrouped_asof, t37_dsir_importance, fe5_rfm_segmentation,
# w29_stream_cusum_monitor, g24_association_rules,
# m8_perceptual_near_dup, e20_survival_km, e21_top_paths,
# cl2_silhouette_eval — plus re-attest d5/d4 after the
# hamming_near_pairs extraction and gr8/pipe9 after their scale
# rewrites), then the three re-attests round 5
# displaced (pipe3, pipe4, t28), then spare slots re-attest the
# oldest green rows (r1/r2-era candles/relational) so cumulative
# evidence stays fresh.


def all_queries() -> dict[str, Query]:
    _load()
    front = {n: _REGISTRY[n] for n in _DRIVER_PRIORITY if n in _REGISTRY}
    rest = {n: q for n, q in _REGISTRY.items() if n not in front}
    return {**front, **rest}


def spark_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.spark_fn for q in all_queries().values()}


def oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}
