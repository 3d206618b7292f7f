"""Skew-mitigation tools: salted joins and two-phase aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions. These operators are the
*explicit* form for the cases AQE can't fix:

* a shuffle join where one key holds a double-digit percentage of the
  fact table (AQE splits the partition, but every split still joins
  the full matching build side);
* high-cardinality aggregation where a handful of hot keys serialize
  into single reducers and partial aggregation doesn't help because
  the aggregate state is large (e.g. collect_list/distinct-heavy).

Both use DETERMINISTIC salts (hash of row content, not rand()) so
retried/speculated tasks produce identical output — rand() salting
breaks exactly-once semantics under task retry.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact frame against a smaller frame with the
    hot-key pressure spread over ``num_salts`` sub-partitions.

    The skewed side computes a deterministic salt from its whole row
    (xxhash64 over all columns), the small side is replicated once per
    salt value, and the join key becomes (key, salt): each formerly-hot
    reducer becomes ``num_salts`` evenly-loaded ones. Replication cost
    is |small| × num_salts — use when |small| is dimension-sized and
    the skew is fact-sided (the common case).

    Only inner and left-sided joins are accepted: in a right/full
    join an unmatched SMALL-side row survives once per salt replica —
    ``num_salts`` duplicates. For right-skewed input flip the
    arguments and use the mirrored left join.
    """
    if how.replace("_", "").lower() not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti"
    ):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: a "
            "right/full join would duplicate unmatched small-side rows "
            "once per salt replica; flip the sides instead"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(num_salts))
    left = skewed.withColumn(_SALT, salt)
    right = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    return left.join(right, [on, _SALT], how).drop(_SALT)


def two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    num_salts: int = 16,
) -> DataFrame:
    """Aggregate in two shuffles: first on (keys..., salt) — hot keys
    spread over ``num_salts`` reducers — then on keys alone over the
    (tiny, pre-reduced) partials.

    ``partial_aggs`` run in phase 1 and must emit columns that
    ``final_aggs`` can re-reduce (the classic sum-of-sums /
    min-of-mins / sum-of-counts algebra). For ordinary algebraic
    aggregates Spark's own map-side partial aggregation already does
    this; reach for the explicit form when the aggregation state is
    too big for map-side combine to absorb a hot key (large
    collect-style or distinct-heavy states).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    phase1 = df.withColumn(_SALT, salt).groupBy(*keys, _SALT).agg(*partial_aggs)
    return phase1.groupBy(*keys).agg(*final_aggs)
