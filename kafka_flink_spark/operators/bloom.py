"""Bloom-filter join pruning — drop fact rows that cannot match the
dim side BEFORE the expensive exchange, using a constant-size bit-set
summary of the dim keys.

This is the fourth mergeable summary next to the CMS/GK/HLL trio in
``operators/sketches.py``, and the one aimed straight at join cost: at
100 TB the dominant price of ``fact JOIN dim-subset`` is shuffling
fact rows that end up matching nothing. A Bloom filter of the dim keys
is a few hundred KB whatever the data size, so the membership test
runs map-side on the fact scan and the exchange only carries probable
matches. (Spark's own runtime-filter rule does this JVM-internally
when statistics allow; this operator is the explicit, plannable form —
usable across stages, persistable, and mergeable across shards by
unioning bit positions.)

Construction is pure DataFrame algebra, deterministic, and therefore
oracle-checkable end-to-end:

* the filter is the DISTINCT set of bit positions
  ``pmod(xxhash64(key, seed_s), num_bits)`` for seeds ``s < k`` —
  at most ``k * |dim|`` longs, aggregated with map-side partials;
* a fact row *may* match iff for EVERY seed its position is in the
  set: k chained **broadcast left-semi joins**, each a narrow map-side
  hash probe — the fact side is never shuffled;
* false positives (rows passing every probe without a real partner)
  are removed by the exact join that follows, so the composed operator
  returns exactly ``fact ⋉ dim`` — the Bloom stage only changes HOW
  MUCH data reaches that join's exchange.

Reference scope note: the reference has no joins at all (SURVEY.md
§2.6); this belongs to the engine's beyond-reference scale surface,
like the skew tools in ``operators/skew.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_bits(dim: DataFrame, key_col: str, num_bits: int, num_hashes: int) -> DataFrame:
    """The filter itself: one row per set bit (column ``pos``).

    Each dim key fans out to ``num_hashes`` positions (narrow array +
    explode), then one distinct-aggregation bounds the result at
    ``num_bits`` rows. Filters built on disjoint shards merge by
    unioning their ``pos`` sets — the property that lets a 1000-executor
    build avoid any single-point pass.
    """
    if num_bits <= 0 or num_hashes <= 0:
        raise ValueError(f"num_bits ({num_bits}) and num_hashes ({num_hashes}) must be positive")
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(num_bits))
            for s in range(num_hashes)
        ]
    )
    return (
        dim.select(F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bits: DataFrame,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Keep only fact rows whose every hashed position is a set bit —
    a superset of the true matches (Bloom filters have no false
    negatives; pinned by test).

    Each probe is a broadcast left-semi join on one hashed column: the
    fact side stays narrow and unshuffled through all ``num_hashes``
    probes, and the probe columns are dropped before returning.
    """
    pruned = fact
    for s in range(num_hashes):
        probe = f"_bloom_pos_{s}"
        pruned = (
            pruned.withColumn(
                probe, F.pmod(F.xxhash64(F.col(key_col), F.lit(s)), F.lit(num_bits))
            )
            .join(
                F.broadcast(bits.withColumnRenamed("pos", probe)),
                probe,
                "left_semi",
            )
            .drop(probe)
        )
    return pruned


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 3,
) -> DataFrame:
    """``fact ⋉ dim`` with a Bloom pre-prune: build the bit set from
    the dim keys, prune the fact map-side, then run the exact semi
    join to strip false positives. Result is exactly the plain semi
    join (oracle-checked); the win is that the exact join's exchange
    sees only Bloom survivors.

    Sizing: false-positive rate ≈ (1 - e^(-k*n/m))^k; the default
    1M bits / 3 hashes holds ~1% at n = 100k dim keys. The bit set is
    built once and reused by every probe (cached by Spark's broadcast
    machinery per probe; at most ``num_bits`` longs travel).
    """
    bits = bloom_bits(dim, dim_key, num_bits, num_hashes)
    pruned = bloom_prune(fact, fact_key, bits, num_bits, num_hashes)
    cond = pruned[fact_key] == dim[dim_key]
    return pruned.join(dim, cond, "left_semi")
