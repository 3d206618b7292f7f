"""Flink-SQL ``TUMBLE`` dialect sugar → Spark SQL.

The reference's SQL jobs group by
``TUMBLE(rowtime, INTERVAL '1' MINUTE)`` and project
``TUMBLE_START(...)`` plus ``FIRST_VALUE/LAST_VALUE`` aggregates
(``/root/reference/old/flink.py:42-67``, ``old/kfk.py:123-132``).
Spark expresses the same with ``window(ts, '1 minute')`` and
``min_by/max_by``; per SURVEY.md §4.2.4 the translation is a
Python-side string rewrite, not a Catalyst extension — the rewritten
query goes through the stock parser/optimizer.

Two deliberate semantic upgrades during translation:

* ``FIRST_VALUE(x)`` / ``LAST_VALUE(x)`` become ``min_by(x, rowtime)``
  / ``max_by(x, rowtime)``: Spark's ``first()/last()`` aggregates are
  order-nondeterministic, and the reference's versions depend on Kafka
  arrival order (SURVEY.md §4.2.1) — the rowtime-keyed forms are the
  deterministic semantics every other candle operator here uses.
* ``TUMBLE_START/TUMBLE_END`` become ``window(...).start/.end``
  projections of the same group key.
"""

from __future__ import annotations

import re

_UNITS = {
    "SECOND": "seconds",
    "MINUTE": "minutes",
    "HOUR": "hours",
    "DAY": "days",
}

_TUMBLE = re.compile(
    r"TUMBLE(_START|_END)?\s*\(\s*([A-Za-z_][A-Za-z0-9_.]*)\s*,\s*"
    r"INTERVAL\s*'(\d+)'\s*(SECOND|MINUTE|HOUR|DAY)\s*\)",
    re.IGNORECASE,
)


def expand_tumble_sql(sql: str, rowtime: str | None = None) -> str:
    """Rewrite Flink ``TUMBLE`` dialect into Spark SQL.

    ``rowtime`` (default: the column named inside the first TUMBLE
    call) keys the FIRST_VALUE/LAST_VALUE → min_by/max_by rewrite.

    Scope: the dialect surface the reference actually uses
    (``old/flink.py``, ``old/kfk.py``) — FIRST_VALUE/LAST_VALUE over a
    simple column/expression without nested parentheses. Anything
    beyond that should be written in Spark SQL directly; this is
    string sugar, not a parser.
    """

    def tumble_repl(m: re.Match) -> str:
        suffix, col, n, unit = m.groups()
        dur = f"'{n} {_UNITS[unit.upper()]}'"
        base = f"window({col}, {dur})"
        if suffix is None:
            return base
        return f"{base}.{'start' if suffix.upper() == '_START' else 'end'}"

    first_tumble = _TUMBLE.search(sql)
    if rowtime is None and first_tumble:
        rowtime = first_tumble.group(2)
    out = _TUMBLE.sub(tumble_repl, sql)
    if rowtime:
        out = re.sub(
            r"FIRST_VALUE\s*\(\s*([^()]+?)\s*\)",
            rf"min_by(\1, {rowtime})",
            out,
            flags=re.IGNORECASE,
        )
        out = re.sub(
            r"LAST_VALUE\s*\(\s*([^()]+?)\s*\)",
            rf"max_by(\1, {rowtime})",
            out,
            flags=re.IGNORECASE,
        )
    return out
