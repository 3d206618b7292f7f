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
# FIRST 50 queries in iteration order each round; rounds 1–3 covered
# 138 unique names (135 green — see CORRECTNESS_r01/r02/r03.json and
# VERDICT round 3). Round 4 leads with the 57 queries that have never
# received a driver row: the g13 fix-verification rerun first (round-3
# driver ERROR — raw array<double> output, now three scalar columns),
# then the streaming late-data/interval-join block (the only
# oracle-checkable surrogates for reference semantics W4/W6/W10), then
# every round-3 operator addition grouped by family, then the six
# round-4 operator additions (t28-t30, v10, w5, w26). The 14 TPC-H
# relational shapes (``s2_sort_null_ordering`` through
# ``q_waiting_suppliers`` below the 50-line) spill to round 5 — they
# are the lowest-risk conventional shapes in the registry, exactly the
# trade VERDICT r3 prescribed. All 50 are ALL-MATCH green under the local
# bare-session driver simulation at sf0.01 (scripts/driver_sim.py,
# round 4 — now with the strict raw-value canonicalizer probe that
# catches the g13 failure class even on rows-only checks).
_DRIVER_PRIORITY: tuple[str, ...] = (
    # fix-verification rerun (r3 driver ERROR: raw array output)
    "g13_approx_percentile_sketch",
    # streaming late-data / interval-join semantics (W4/W6/W10)
    "w21_stream_outer_interval_join",
    "w22_stream_dedup_within_watermark",
    "w23_stream_full_outer_interval_join",
    "w24_stream_semi_join",
    "w25_stream_corpus_ingest",
    # LLM text ops (round-3 additions)
    "t16_bpe_pair_counts",
    "t17_cdc_chunk_dedup",
    "t18_bigram_lm_score",
    "t19_ngram_novelty",
    "t20_inverted_index",
    "t21_pmi_collocations",
    "t22_stratified_exact_sample",
    "t23_dup_substring_spans",
    "t24_deterministic_shuffle",
    "t25_bpe_train_merges",
    "t26_bpe_encode_stats",
    "t27_substring_dedup_rewrite",
    # dedup / similarity / clustering / graph
    "d9_incremental_dedup",
    "v7_ann_knn_graph",
    "v8_ivf_learned_topk",
    "v9_random_projection",
    "cl1_kmeans_profile",
    "gr1_pagerank_copurchase",
    "gr2_triangle_count",
    # pipelines
    "pipe4_quality_dedup_corpus",
    "pipe5_curriculum_order",
    "pipe6_temperature_mix",
    # joins
    "j8_bloom_prune_semi_join",
    "j9_asof_join_forward",
    "j10_range_join_binned",
    "j11_fuzzy_name_match",
    # events / relational / scalar additions
    "e9_event_transitions",
    "e10_daily_anomalies",
    "g17_approx_top_k",
    "g18_exact_percentiles",
    "sc10_variant_functions",
    "sc11_collation_group",
    # io / UDF / multimodal
    "io8_xml_roundtrip",
    "io9_zorder_layout",
    "io10_schema_evolution_merge",
    "io11_dynamic_partition_overwrite",
    "u9_arrow_python_udf",
    "m7_real_media_probe",
    # round-4 operator additions (registered + sim-verified this round)
    "t28_url_dedup",
    "t29_gopher_quality_rules",
    "t30_winnowing_fingerprints",
    "v10_ann_recall_eval",
    "w5_distribution_ranks",
    "w26_stream_topk_complete",
    # ---- 50-query budget line (round 4) ----
    # late-round-4 additions (sim-verified; lead round 5's rotation)
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
    # TPC-H relational tail (14 conventional shapes; lowest-risk in
    # the registry — spill to round 5)
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
