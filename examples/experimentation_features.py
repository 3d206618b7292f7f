"""Experimentation + feature-engineering analytics over the fixtures —
the session-5 public surface, composed as a production run would:

    python examples/experimentation_features.py

1. CEP followed-by: every click matched to its next purchase within
   1h (one window function, no self-join),
2. A/B readout: hash-split variants, conversion rates, Welch t on
   per-user revenue — one conditional aggregation,
3. PSI drift monitor: reference-decile bins of `value` per event
   type, smoothed Population Stability Index between timeline halves,
4. decile binning + smoothed target encoding of the lineitem fact
   (broadcast percentile edges — no global sort),
5. hashing-trick featurization of documents (256 signed buckets,
   integer-exact sparse-vector stats),
6. canonical document selection: near-dup clusters keep their
   highest-quality member.

Swap the fixture reads for the production lake and this file IS the
job: every stage is declarative, broadcast-bounded, and reads nothing
to the driver except the small tables shown.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import spark_queries

    spark = get_session("experimentation-features-example")
    qs = spark_queries()

    cep = qs["e16_cep_followed_by"](spark, SF_DIR)
    matched = cep.filter("matched = 1").count()
    print(f"1. CEP followed-by: {cep.count()} clicks, {matched} converted within 1h")

    ab = qs["e17_ab_test_welch"](spark, SF_DIR).first()
    print(
        f"2. A/B: n={ab.n_a}/{ab.n_b}  rate={ab.rate_a}/{ab.rate_b}  "
        f"welch_t={ab.welch_t}"
    )

    print("3. PSI drift per event type (<0.1 stable, >0.25 action):")
    for r in qs["qa3_psi_drift"](spark, SF_DIR).orderBy("event_type").collect():
        print(f"   {r.event_type:10s} psi={r.psi}")

    print("4. price deciles -> return-rate profile:")
    for r in qs["fe1_decile_binning"](spark, SF_DIR).orderBy("bin").collect():
        print(f"   bin {r.bin:2d}  n={r.n:6d}  return_rate={r.return_rate}")
    enc = qs["fe2_target_encoding"](spark, SF_DIR)
    print(f"   target encoding: {enc.count()} brands (smoothed m=50)")

    fh = qs["fe3_feature_hashing"](spark, SF_DIR)
    stats = fh.agg({"nnz": "avg", "l2_sq": "avg"}).first()
    print(
        f"5. feature hashing: {fh.count()} docs, avg nnz={stats['avg(nnz)']:.1f}"
        f"/256 buckets"
    )

    keep = qs["pipe8_canonical_selection"](spark, SF_DIR)
    n_clusters = keep.count()
    n_multi = keep.filter("n_members > 1").count()
    print(
        f"6. canonical selection: {n_clusters} clusters "
        f"({n_multi} multi-member -> best-quality keeper chosen)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
