"""As-of (point-in-time) join — the time-series operator Spark lacks
natively, built as a composition of existing DataFrame ops (SURVEY.md
§2.6: the reference has no joins at all; trades × latest-known-state
is the canonical operator of its financial domain).

Semantics: for each left row, attach the most recent right row of the
same key whose timestamp is ≤ (or <, ``strict``) the left timestamp.

Implementation — union + ordered window, NOT a range join:

* tag both sides, union them (schemas aligned, right payload nulled on
  left rows and vice versa);
* one window pass per key ordered by (ts, side-priority):
  ``last(right_payload, ignoreNulls=True)`` over rows unbounded
  preceding → every left row sees the latest right values at its time;
* filter back to left rows.

Cost: ONE shuffle of |left| + |right| rows on the key — linear, no
interval explosion. The naive inequality join is |left| × |right|
per key before max_by; Spark's range-join optimizations don't cover
"latest per left row" without binning. At 100 TB the union-window form
is the only shape that survives: it is exactly a sort-merge pass, and
AQE handles per-key skew by splitting on (key) ranges after the sort.
DuckDB's native ``ASOF JOIN`` provides the differential oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    strict: bool = False,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Attach the latest right row (per ``key_col``, by time) to each
    left row. Right payload columns keep their names; rows with no
    prior right row carry nulls (left-outer as-of).

    ``strict=True`` matches only right rows strictly earlier than the
    left timestamp (right rows at the exact same instant are ignored).

    ``tolerance`` (a SQL interval string, e.g. ``"4 hours"``) bounds
    how stale the matched right row may be: a match older than
    ``left_ts - tolerance`` yields nulls instead — the pandas
    ``merge_asof(tolerance=...)`` semantics. Implemented as a post-fill
    conditional on the carried right timestamp: same single linear
    shuffle, no extra join.

    ``direction`` — ``"backward"`` (default, latest right row at or
    before the left timestamp) or ``"forward"`` (EARLIEST right row at
    or after it, pandas ``merge_asof(direction="forward")``): the same
    union + ordered-window pass traversed in descending time, with the
    tolerance gate flipped to ``right_ts <= left_ts + tolerance``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward or forward: {direction}")
    payload = [c for c in right.columns if c not in (key_col, right_ts)]
    lt = left.select(
        F.col(key_col),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload],
    )
    rt = right.select(
        F.col(key_col),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    # side-priority: at equal timestamps the right row sorts first, so
    # a left row at t sees a right row at t (non-strict); strict mode
    # flips the order so same-instant right rows come after. Forward
    # mode traverses time DESCENDING — "last right row seen" then means
    # "earliest right row at or after t" — with the same tie rules.
    ts_ord = F.col("_t") if direction == "backward" else F.desc("_t")
    order = [ts_ord] + ([F.col("_side")] if not strict else [F.desc("_side")])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = lt.unionByName(rt)
    # Fill the WHOLE matched right row as one struct, not column-by-column:
    # per-column last(..., ignorenulls) would mix values from different
    # right rows when the latest right row has a null payload column, and a
    # stale value could then pass the freshness gate that _rt satisfies.
    # The struct is non-null exactly on right rows, so last() carries the
    # latest right row intact — a null inside it stays null, matching
    # pandas merge_asof (the matched ROW's value, even when that is null).
    rrow = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_t").alias("_rt"),
            *[F.col(f"_r_{c}").alias(c) for c in payload],
        ),
    )
    filled = unioned.select(
        key_col,
        "_side",
        "_t",
        "_l",
        F.last(rrow, ignorenulls=True).over(w).alias("_r"),
    )
    if tolerance is None:
        fresh = F.col("_r").isNotNull()
    elif direction == "backward":
        fresh = F.col("_r._rt") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
    else:
        fresh = F.col("_r._rt") <= F.col("_t") + F.expr(f"INTERVAL {tolerance}")
    return filled.filter(F.col("_side") == 1).select(
        F.col("_l.*"),
        *[F.when(fresh, F.col(f"_r.{c}")).alias(c) for c in payload],
    )
