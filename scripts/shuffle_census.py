"""Whole-registry shuffle census (PLANS.md/SCALING.md evidence).

For every registered query, build the DataFrame at sf0.001 on the
engine session and count hash exchanges in the executed plan
(plan-level only for batch queries; streaming-replay queries EXECUTE
their availableNow replay during construction, so this is also a
whole-registry smoke). Cache is cleared per query — round-6 learned an
uncleared shared session inflates exchange counts with the previous
query's persisted relations.

Usage: python scripts/shuffle_census.py [sf_dir] > census.json
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from kafka_flink_spark.plans import count_exchanges
    from kafka_flink_spark.session import get_session
    from kafka_flink_spark.suite import all_queries

    spark = get_session("shuffle-census")
    out: dict[str, int | None] = {}
    for name, q in all_queries().items():
        spark.catalog.clearCache()
        try:
            df = q.spark_fn(spark, sf_dir)
            out[name] = count_exchanges(df)
        except Exception as exc:  # noqa: BLE001
            out[name] = None
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
        print(f"{name}: {out[name]}", file=sys.stderr)

    vals = [v for v in out.values() if v is not None]
    summary = {
        "n": len(out),
        "errors": sum(1 for v in out.values() if v is None),
        "zero_exchange": sum(1 for v in vals if v == 0),
        "one_exchange": sum(1 for v in vals if v == 1),
        "le_one": sum(1 for v in vals if v <= 1),
        "ge_10": sorted(
            [(k, v) for k, v in out.items() if v is not None and v >= 10],
            key=lambda t: -t[1],
        ),
        "per_query": out,
    }
    print(json.dumps(summary, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
