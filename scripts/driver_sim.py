"""Driver-faithful correctness simulation.

Runs the first N registry queries (the driver's per-round sample) at
sf0.01 with a bare SparkSession and compares each against its DuckDB
oracle with a comparison STRICTER than tests/helpers.py: in addition
to the order-insensitive canonicalized-value diff, it flags numeric
dtype-kind mismatches (int64 vs float64) between the Spark and oracle
pandas frames — the failure mode that produced the r2
``t9_pack_documents`` hash mismatch even though every value compared
equal after lenient canonicalization.

Usage: python scripts/driver_sim.py [N] [sf_dir]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from tests.helpers import canon_rows  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def dtype_kinds_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Columns whose numeric kind differs (int vs float) across sides."""
    bad = []
    for c in spark_pdf.columns:
        if c not in oracle_pdf.columns:
            continue
        sk = spark_pdf[c].dtype.kind
        ok = oracle_pdf[c].dtype.kind
        num = {"i", "u", "f"}
        if sk in num and ok in num and (sk in "iu") != (ok in "iu"):
            # All-null float columns on either side are a pandas
            # representation artifact, not an engine disagreement.
            s_nn = spark_pdf[c].dropna()
            o_nn = oracle_pdf[c].dropna()
            if len(s_nn) and len(o_nn):
                # Float side holding only integral values is exactly the
                # HUGEINT->float64 leak the driver hashes differently.
                bad.append(f"{c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}")
    return bad


def driver_canon_probe(pdf: pd.DataFrame) -> list[str]:
    """Emulate the external driver's canonicalizer on raw values.

    The driver pandas-sorts and hashes every column BEFORE any
    stringification — a raw array/map/struct column surfaces there as
    ``TypeError: unhashable type: 'numpy.ndarray'`` (the r2 t15 and r3
    g13 failure class) even on a rows-only check. ``canon_rows``
    stringifies first, so it cannot catch that; this probe can.
    """
    bad = []
    for c in pdf.columns:
        try:
            col = pdf[c]
            col.sort_values().reset_index(drop=True)
            pd.util.hash_pandas_object(col, index=False)
        except Exception as exc:  # noqa: BLE001
            bad.append(f"{c}: {type(exc).__name__}: {exc}")
    return bad


def main() -> None:
    # Usage: driver_sim.py [N|name1,name2,...] [sf_dir]
    sel = sys.argv[1] if len(sys.argv) > 1 else str(10**9)
    names_arg = None if sel.isdigit() else [s for s in sel.split(",") if s]
    n = int(sel) if sel.isdigit() else 10**9
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    # Bare session, NO engine confs — the registered query wrappers
    # must apply their own runtime conf (apply_runtime_conf), exactly
    # like the external verification driver's session.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()

    from kafka_flink_spark.suite import all_queries

    qs = all_queries()
    if names_arg:
        missing = [m for m in names_arg if m not in qs]
        if missing:
            sys.exit(f"unknown query names: {missing}")
        names = names_arg
    else:
        names = list(qs)[:n]

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name in names:
        q = qs[name]
        t0 = time.perf_counter()
        try:
            spark_pdf = q.spark_fn(spark, sf_dir).toPandas()
            canon_probs = driver_canon_probe(spark_pdf)
            if canon_probs:
                status = "FAIL driver-canon " + "; ".join(canon_probs)
                n_fail += 1
            elif q.oracle is None:
                status = f"PASS rows-only ({len(spark_pdf)} rows)"
                n_pass += 1
            else:
                oracle_pdf = duck.execute(q.oracle).fetchdf()
                probs = []
                if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
                    probs.append(
                        f"schema spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
                    )
                elif len(spark_pdf) != len(oracle_pdf):
                    probs.append(f"rows spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
                else:
                    if canon_rows(spark_pdf) != canon_rows(oracle_pdf):
                        s, o = canon_rows(spark_pdf), canon_rows(oracle_pdf)
                        diffs = [(a, b) for a, b in zip(s, o) if a != b][:2]
                        probs.append(f"values {diffs}")
                    probs.extend("dtype " + d for d in dtype_kinds_match(spark_pdf, oracle_pdf))
                if probs:
                    status = "FAIL " + "; ".join(probs)
                    n_fail += 1
                else:
                    status = f"PASS ({len(spark_pdf)} rows)"
                    n_pass += 1
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}: {exc}"
            traceback.print_exc()
            n_fail += 1
        print(f"{name:45s} {time.perf_counter() - t0:6.1f}s  {status}", flush=True)

    print(f"\n{n_pass} pass / {n_fail} fail of {len(names)}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
