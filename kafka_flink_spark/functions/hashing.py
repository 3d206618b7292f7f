"""Deterministic, engine-portable hashing primitives.

Dedup/fingerprint operators need hashes that (a) are stable across
Spark executors and runs, and (b) can be reproduced bit-for-bit by the
DuckDB oracle for differential testing. Spark's ``xxhash64`` and
DuckDB's ``hash()`` differ, so the portable primitive is **md5**
(identical hex output in both engines): we take the first 16 hex chars
as an unsigned-ish 63-bit integer.

All helpers are native Column expressions (md5/conv/substring are
JVM-side, codegen'd) — no Python UDFs in dedup hot paths.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str, salt: str = "") -> Column:
    """First 60 bits of md5(salt || col) as a non-negative LONG.

    60 bits (15 hex chars) keeps the value inside a signed 64-bit
    range in both Spark (LONG) and DuckDB (BIGINT) without overflow
    games, while collision probability stays negligible for dedup
    banding (2^-60 per pair).

    DuckDB oracle equivalent::

        CAST(('0x' || substr(md5(<salt> || col), 1, 15)) AS BIGINT)
    """
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def minhash_value(col: Column | str, perm: int) -> Column:
    """One MinHash permutation: h_p(x) = md5_long(x) XOR K_p, where
    K_p is an md5-derived 60-bit constant (operators/dedup.
    perm_constant). One digest per input plus a xor per permutation —
    ~num_perms cheaper than salted re-hashing, still portable SQL
    (DuckDB ``xor(h, K)``); xor by a constant is a bijection, so the
    min is over a uniform relabeling. Production deployments that
    don't need cross-engine oracles can swap md5_long for Spark's
    native ``xxhash64`` (~6x faster digests) without touching the
    banding math."""
    from kafka_flink_spark.operators.dedup import perm_constant

    c = md5_long(col)
    return c.bitwiseXOR(F.lit(perm_constant(perm)).cast("long"))


def duckdb_md5_long(expr: str, salt: str = "") -> str:
    """The DuckDB SQL string mirroring :func:`md5_long` for oracles."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"
