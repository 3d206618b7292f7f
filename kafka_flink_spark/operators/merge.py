"""Batch MERGE / upsert — the data-lake maintenance primitive
(`MERGE INTO target USING source ON key ...`) expressed as one
declarative full-outer join, for engines without a transactional table
format.

Semantics implemented:

* **matched** (key in both): apply the caller's update expressions.
* **not matched** (source-only key): insert the caller's insert row.
* **not matched by source** (target-only key): keep the target row.

Scale design: one full-outer shuffle join on the merge key (AQE picks
broadcast automatically when the source — typically a day's changes —
is small relative to the target table; skew-join splitting applies on
hot keys). The output is the complete post-merge table, written back
with dynamic partition overwrite so only partitions containing touched
keys rewrite (see tests/test_kafka_io.py dynamic-overwrite coverage).
On a transactional format (Delta/Iceberg) the same plan feeds the
format's row-level MERGE; nothing upstream changes.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_set: Mapping[str, Column],
    insert_set: Mapping[str, Column],
    status_col: str | None = None,
) -> DataFrame:
    """Return the post-merge table.

    ``update_set``/``insert_set`` map output column name → expression;
    expressions may reference ``t.<col>`` (target side) and
    ``s.<col>`` (source side). Output columns are the union of the
    key, the mapped columns, and (optionally) a status column marking
    each row ``updated`` / ``inserted`` / ``kept``.
    """
    t, s = target.alias("t"), source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col(f"t.{key}").isNotNull() & F.col(f"s.{key}").isNotNull()
    inserted = F.col(f"t.{key}").isNull()
    cols = [F.coalesce(F.col(f"t.{key}"), F.col(f"s.{key}")).alias(key)]
    for name in update_set:
        cols.append(
            F.when(matched, update_set[name])
            .when(inserted, insert_set[name])
            .otherwise(F.col(f"t.{name}"))
            .alias(name)
        )
    if status_col:
        cols.append(
            F.when(matched, F.lit("updated"))
            .when(inserted, F.lit("inserted"))
            .otherwise(F.lit("kept"))
            .alias(status_col)
        )
    return joined.select(*cols)
