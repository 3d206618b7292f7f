"""Deduplication operators for training-data pipelines: exact
(hash-groupBy), n-gram Jaccard, MinHash+LSH banding, and SimHash.

Scale design
------------
* **Signatures are computed per-row with higher-order column
  expressions** (transform/aggregate over token arrays + portable md5
  hashing — functions/hashing.py): no explode, no Python, no shuffle
  until the actual candidate grouping. A 100 TB corpus streams through
  signature computation at scan speed.
* **Only signatures shuffle.** Exact dedup groups by a 16-byte hash,
  never the raw text. LSH shuffles (band_id, band_key) pairs — tens of
  bytes per doc per band — and joins candidates within buckets. The
  raw-text join for verification happens only on the candidate set,
  which is orders of magnitude smaller than the corpus.
* **Quadratic work is confined to buckets.** The all-pairs shingle
  join (ngram_jaccard_pairs) is the correctness baseline; MinHash+LSH
  is the scale path — band width tunes the detection-probability
  S-curve, and bucket sizes stay bounded because near-identical
  documents are rare by mass.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHINGLE_K = 3
NUM_PERMS = 16
NUM_BANDS = 8  # 8 bands × 2 rows: P(candidate) = 1-(1-j^2)^8 — 0.9 @ j≈0.5


def _md5_long_expr(c: Column, salt: str = "") -> Column:
    """Portable 60-bit hash of a column expression (see functions/hashing)."""
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def with_shingles(df: DataFrame, col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Distinct word k-gram shingles as an array column (narrow op)."""
    toks = F.split(F.col(col), " ")
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(1, k + 1)]
    )
    shingles = F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), F.size(toks) - k), lambda i: gram(i))
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return df.withColumn("shingles", shingles)


def exact_dedup(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: one representative (min id) per
    normalized-text md5; the shuffle key is the 32-char hash, not the
    document body."""
    norm = F.lower(F.trim(F.col(col)))
    return (
        df.select(F.md5(norm).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", num_perms: int = NUM_PERMS
) -> DataFrame:
    """MinHash signature per document: sig[p] = min over shingles of
    md5_long('mh{p}:' || shingle). Computed entirely per-row (array_min
    over a transform) — no explode, no shuffle."""
    out = with_shingles(df, col)

    # NB: bind the permutation index via an outer function, NOT a
    # defaulted lambda param — PySpark treats defaulted params as
    # extra lambda variables (transform would pass the element index).
    def perm_min(p: int):
        return F.array_min(
            F.transform(F.col("shingles"), lambda s: _md5_long_expr(s, salt=f"mh{p}:"))
        )

    sig_cols = {f"mh{p}": perm_min(p) for p in range(num_perms)}
    return out.withColumns(sig_cols).select(
        id_col, "shingles", *[f"mh{p}" for p in range(num_perms)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    num_perms: int = NUM_PERMS,
    num_bands: int = NUM_BANDS,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup detection.

    signature → band keys (rows-per-band consecutive perms) →
    self-join on (band_id, band_key) → distinct candidate pairs →
    verify with exact shingle Jaccard ≥ ``min_jaccard``.

    The self-join shuffles only band keys; verification joins shingle
    arrays for the candidate set only.
    """
    rows_per_band = num_perms // num_bands
    sigs = minhash_signatures(df, col, id_col, num_perms)
    band_arr = F.array(
        *[
            F.concat_ws(
                ":",
                *[
                    F.col(f"mh{b * rows_per_band + r}").cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(num_bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), "shingles", F.posexplode(band_arr).alias("band_id", "band_key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col(f"a.band_id") == F.col(f"b.band_id"))
            & (F.col(f"a.band_key") == F.col(f"b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - common
    return (
        cand.withColumn("jaccard", F.round(common / union, 6))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via a shingle inverted
    index: explode distinct shingles, self-join on shingle, count
    common shingles per pair, Jaccard = common / (|A|+|B|-common).

    This is the exact baseline the LSH path approximates. At scale the
    shingle join is the hot spot — standard mitigations (prefix
    filtering, dropping ultra-frequent shingles) apply before the
    join; fixture corpora don't need them.
    """
    sh = with_shingles(df, col).select(
        F.col(id_col), "shingles", F.size("shingles").alias("n_sh")
    )
    ex = sh.select(id_col, "n_sh", F.explode("shingles").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        common.withColumn(
            "jaccard", F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6)
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


SIMHASH_BITS = 60  # md5_long yields 60 usable bits


def simhash(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash document signatures: per token occurrence, each of the
    60 hash bits votes +1/-1; bit i of the signature is set when the
    vote is positive. One pass: tokens → md5_long array (each token
    hashed once), then 60 aggregate() folds over the cached array —
    all per-row expressions, no shuffle, no explode.
    """
    toks = F.split(F.col(col), " ")
    hashed = df.withColumn("hs", F.transform(toks, lambda t: _md5_long_expr(t)))

    # Bit index bound via closure (see perm_min note in
    # minhash_signatures: defaulted lambda params become lambda vars).
    def vote(i: int):
        return F.aggregate(
            "hs",
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    votes = [vote(i) for i in range(SIMHASH_BITS)]
    sig = reduce(
        lambda x, y: x + y,
        [
            F.when(votes[i] > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
            for i in range(SIMHASH_BITS)
        ],
    )
    return hashed.select(F.col(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    num_chunks: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via chunk banding (the pigeonhole trick):
    split the 60-bit signature into ``num_chunks`` disjoint bit ranges;
    a pair with hamming ≤ max_hamming has at most max_hamming differing
    bits, so with num_chunks > max_hamming at least one chunk is
    bit-identical — candidate generation by equi-join on equal chunks
    has FULL recall at the max_hamming threshold. Join on equal chunk,
    verify exact hamming with bit_count(xor).

    ``num_chunks`` defaults to ``max_hamming + 1`` (the smallest count
    that preserves the guarantee); passing fewer raises, since it would
    silently miss pairs between hamming num_chunks and max_hamming.
    Chunk widths differ by at most one bit when 60 % num_chunks != 0.
    """
    if num_chunks is None:
        num_chunks = max_hamming + 1
    if num_chunks <= max_hamming:
        raise ValueError(
            f"num_chunks ({num_chunks}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole recall guarantee"
        )
    sigs = simhash(df, col, id_col)
    base, extra = divmod(SIMHASH_BITS, num_chunks)
    chunk_cols, start = [], 0
    for c in range(num_chunks):
        width = base + (1 if c < extra else 0)
        mask = (1 << width) - 1
        chunk_cols.append(F.shiftright("simhash", start).bitwiseAND(F.lit(mask)))
        start += width
    chunks = F.array(*chunk_cols)
    banded = sigs.select(id_col, "simhash", F.posexplode(chunks).alias("chunk_id", "chunk_key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
