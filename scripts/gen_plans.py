"""Regenerate PLANS.md: formatted physical plans for representative
queries with the scale-relevant properties called out. Run:
    python scripts/gen_plans.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SHOWCASE = (
    (
        "a1_ohlcv_tumbling_1h",
        "Partial (map-side) aggregate before the single Exchange: the shuffle "
        "carries candle-sized rows, not trades. min_by/max_by over a (ts, seq) "
        "struct plan as SortAggregate — still partial-aggregable, so "
        "deterministic open/close costs no extra shuffle.",
    ),
    (
        "j1_join_broadcast_inner",
        "part broadcasts (BroadcastExchange); lineitem never shuffles for "
        "the join. The only hash exchange is the final groupBy.",
    ),
    (
        "f1_filter_project",
        "Both predicates reach the scan (PushedFilters); ReadSchema shows "
        "column pruning; scan->filter->project fuses into one codegen span.",
    ),
    (
        "q_local_supplier_volume",
        "Five-way star join: every dimension broadcasts; one exchange total.",
    ),
    (
        "j6_asof_join_prev_close",
        "As-of join as union + ordered window: linear in |left|+|right|, "
        "no interval-join row explosion.",
    ),
    (
        "q_waiting_suppliers",
        "Q21 shape decorrelated: ONE lineitem scan; per-order counts are "
        "window aggregates over the per-(order,supplier) aggregate — the "
        "EXISTS/NOT-EXISTS formulation would scan the fact table three "
        "times.",
    ),
    (
        "w4_window_frames",
        "Four window specs over two orderings share a SINGLE o_custkey "
        "hash exchange; only the sort differs per spec.",
    ),
    (
        "t7_tfidf_top_terms",
        "tf-idf: shuffles carry (doc_id, token, tf) — raw document text "
        "never crosses an exchange; df is a window over the tf aggregate, "
        "not a second corpus scan.",
    ),
    (
        "d3_minhash_lsh_pairs",
        "MinHash+LSH: signatures are 16 codegen min-aggregates over a "
        "zero-shuffle per-row shingle explode (one md5 each); the cached "
        "signature relation feeds both sides of the banding self-join, which "
        "shuffles (id, band) pairs only; Jaccard verification compares the "
        "shingle ARRAYS of candidate docs behind a semi-join, so it is "
        "candidate-bounded, never corpus-wide.",
    ),
    (
        "cl1_kmeans_profile",
        "k-means assignment: each Lloyd round's argmin is an array_min over "
        "a BroadcastExchange of ONE row (the collapsed centroid array) — no "
        "join shuffle, no window, no driver round-trip; the update exchange "
        "carries partial (cid, pos) sums, at most k x dim cells per task.",
    ),
    (
        "j8_bloom_prune_semi_join",
        "Bloom join pruning: every probe is a BroadcastHashJoin LeftSemi on "
        "a hashed bit position — the fact side reaches the exact semi join "
        "without one shuffle; only Bloom survivors hit that join's exchange.",
    ),
    (
        "t17_cdc_chunk_dedup",
        "Content-defined chunking, round-4 codegen rewrite: exploded tokens, "
        "md5 boundary flag, running boundary-count window as the chunk key, "
        "hash-aggregate reassembly — zero interpreted lambdas. Exactly 3 "
        "exchanges: tokens hash-by-doc (window), whose partitioning the "
        "(doc, chunk) aggregate REUSES, then chunk fingerprints, final agg.",
    ),
    (
        "t30_winnowing_fingerprints",
        "Winnowing (MOSS): gram hashing via leads, rightmost-minimal "
        "selection via min(struct(hash,-pos)) over a 5-row frame, distinct, "
        "and the per-doc aggregate ALL reuse one hash-by-doc exchange — "
        "count_exchanges == 1 for the entire fingerprinting pipeline.",
    ),
    (
        "v11_pq_adc_topk",
        "Product quantization + ADC: the codebook broadcasts twice (encode "
        "+ query tables); the only corpus-sized exchange carries the 8-long "
        "code rows — the 8-byte compression is literally the shuffle "
        "payload. ADC totals are LONG sums of pre-scaled sub-distances, so "
        "the aggregate is partial-combinable and order-independent.",
    ),
    (
        "t23_dup_substring_spans",
        "ExactSubstr detect: k-gram hashes assembled from exploded tokens "
        "with k-1 leads sharing ONE per-doc sort — everything codegen, no "
        "interpreted higher-order lambdas (16x; SCALING.md). Exchanges "
        "carry (doc_id, pos, token/hash) — the raw text column appears in "
        "no exchange. Interval merge reuses the per-doc sort.",
    ),
    (
        "t33_weighted_priority_sample",
        "Weighted priority sampling: the priority computation is a narrow "
        "zero-shuffle projection fused with the scan, and the top-k plans "
        "as TakeOrderedAndProject — per-partition k-row heaps merged on "
        "the driver, never a global Sort (plan-gated). O(k) driver "
        "memory at any corpus size.",
    ),
    (
        "g25_kmv_theta_intersection",
        "KMV/theta sketch: the per-set bottom-k plans as a PARTIAL "
        "WindowGroupLimit below the exchange (per-partition top-k heaps), "
        "so the shuffle carries <= k hashes per set per input partition — "
        "8-byte hashes, never members. Everything after the bottom-k "
        "(theta table, pair join, estimates, exact audit) is "
        "broadcast-sized (plan-gated).",
    ),
    (
        "pipe11_hybrid_retrieval_rrf",
        "Hybrid RRF fusion: all four rank caps (query-term top-8, lex "
        "top-50, vec top-50, fused top-k) plan as WindowGroupLimit "
        "partial+final pairs — no RangePartitioning/global sort anywhere "
        "(plan-gated); query terms / df / corpus stats / query vectors all "
        "broadcast, so the only shuffle-requiring join is the full-outer "
        "fusion of two already-shortlisted arms.",
    ),
    (
        "fe6_linear_model_score",
        "Linear-classifier inference in pure codegen: explode -> signed "
        "hashing-trick encode -> partial-aggregable (doc, bucket) sums -> "
        "BroadcastHashJoin against the 256-row weight relation -> per-doc "
        "margin. No Python, no Arrow; the exchange payload is <= 256 rows "
        "per document regardless of document length.",
    ),
    (
        "t38_unicode_nfc",
        "Unicode NFC via Arrow-batched pandas_udf: ArrowEvalPython rides a "
        "zero-exchange narrow pipeline fused with the scan — the documented "
        "Python escape hatch costs batch transfer only, never a shuffle.",
    ),
)


def main() -> None:
    from kafka_flink_spark.plans import count_exchanges, plan_string
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import spark_queries

    spark = get_session("gen-plans", shuffle_partitions=8)
    qs = spark_queries()
    out = [
        "# PLANS — physical-plan quality of representative queries",
        "",
        "Generated by `python scripts/gen_plans.py` (sf0.001 fixtures; plan",
        "shape is scale-invariant). The properties below are enforced by",
        "`tests/test_plans.py`; this file makes them reviewable at a glance.",
        "",
    ]
    for name, note in SHOWCASE:
        df = qs[name](spark, "/root/testdata/sf0.001")
        plan = plan_string(df)
        # keep the tree section; details section truncated to scans
        tree = plan.split("\n\n")[0]
        scans = "\n\n".join(
            b for b in plan.split("\n\n") if "PushedFilters" in b or "ReadSchema" in b
        )
        out += [
            f"## {name}",
            "",
            note,
            f"(hash exchanges: {count_exchanges(df)})",
            "",
            "```",
            tree.strip(),
            "```",
        ]
        if scans:
            out += ["", "Scans:", "", "```", scans.strip()[:2000], "```"]
        out.append("")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
