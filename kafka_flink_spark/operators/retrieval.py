"""Hybrid retrieval — the RAG serving shape: a lexical arm (BM25) and
a vector arm (embedding cosine) retrieve independently, and their
rankings fuse with Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher, SIGIR 2009):

    RRF(d) = Σ_arms 1 / (rrf_k + rank_arm(d))

RRF is the production default for hybrid search (Elasticsearch,
OpenSearch, Vespa, every RAG stack) because it needs NO score
calibration between arms — only ranks — and a document missing from
one arm simply contributes nothing there.

Determinism discipline: ranks are integers from (score DESC, id ASC)
windows; the fused score is computed in INTEGER fixed point —
``RRF_SCALE div (rrf_k + rank)`` per arm, summed as longs — so fusion
is bit-reproducible in any engine (a float 1/(k+r) sum would hang the
final ordering on addition order). The BM25 arm reuses the t31
exactness recipe (one division of exactly-representable integers for
tf saturation, 6dp-rounded ln idf), promoted from per-term rows to a
per-(query, doc) score by summing per-term scores as MICRO-UNIT LONGS
(each 6dp-rounded term score scales exactly to an integer), keeping
the cross-term sum order-independent. The vector arm is the v1
brute-force cosine contract (round 6, id tie-break).

Scale shape: query docs/vectors broadcast; the lexical arm's only
corpus-scale work is the token explode filtered to the (tiny) union
of query terms plus the doc-length count; the vector arm scores
|corpus| x |queries| via the broadcast join (swap in the IVF/LSH
shortlist of v2-v13 when the corpus outgrows brute force — the fusion
tail is arm-agnostic). Everything after ranking touches at most
(shortlist x queries) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60
RRF_SCALE = 10**12


def query_terms(
    docs: DataFrame,
    query_ids: tuple[int, ...],
    n_terms: int = 8,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The first ``n_terms`` DISTINCT tokens of each query document,
    in first-occurrence order — a deterministic stand-in for a user
    query string (the fixture has no separate query table). Returns
    (query_id, term)."""
    toks = F.split(F.col(col), " ")
    pos = (
        docs.filter(F.col(id_col).isin(*query_ids))
        .select(F.col(id_col).alias("query_id"), F.posexplode(toks).alias("pos", "term"))
        .groupBy("query_id", "term")
        .agg(F.min("pos").alias("first_pos"))
    )
    w = Window.partitionBy("query_id").orderBy("first_pos")
    return (
        pos.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_terms)
        .select("query_id", "term")
    )


def hybrid_retrieval_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_ids: tuple[int, ...],
    n_query_terms: int = 8,
    lex_shortlist: int = 50,
    vec_shortlist: int = 50,
    k: int = 10,
    rrf_k: int = RRF_K,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-arm hybrid retrieval fused with RRF; returns the top-``k``
    documents per query: (query_id, doc_id, lex_rank, vec_rank,
    rrf_e12, rn). ``emb`` rows are the corpus documents' embeddings
    (``vec_id`` == ``doc_id`` in the fixture). The query document
    itself is excluded from both arms."""
    from kafka_flink_spark.operators.similarity import _as_double, cosine_pre, norm

    qt = query_terms(docs, query_ids, n_query_terms, text_col, doc_id_col)

    # ---- lexical arm: BM25 against each query's term set ----
    toks = F.split(F.col(text_col), " ")
    dl_rel = docs.select(F.col(doc_id_col), F.size(toks).cast("long").alias("dl"))
    stats = dl_rel.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_w"),
    )
    all_terms = qt.select("term").distinct()
    term_rows = docs.select(
        F.col(doc_id_col), F.explode(toks).alias("term")
    ).join(F.broadcast(all_terms), "term")
    tf = term_rows.groupBy(doc_id_col, "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored_terms = (
        tf.join(F.broadcast(qt), "term")
        .filter(F.col(doc_id_col) != F.col("query_id"))
        .join(F.broadcast(df_t), "term")
        .join(dl_rel, doc_id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.round(
        F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0), 6
    )
    tfpart = F.round(
        (22 * F.col("total_w") * F.col("tf"))
        / (
            10 * F.col("total_w") * F.col("tf")
            + 3 * F.col("total_w")
            + 9 * F.col("dl") * F.col("n_docs")
        ),
        6,
    )
    # per-term 6dp score -> exact micro-unit long; cross-term sum is
    # then an integer aggregate, order-independent (t31 keeps per-term
    # rows for exactly this reason; the fusion needs one score per
    # (query, doc), so the sum must be integer).
    per_term_e6 = F.round(F.round(idf * tfpart, 6) * 1_000_000, 0).cast("long")
    lex_scores = scored_terms.select(
        "query_id", F.col(doc_id_col), per_term_e6.alias("s_e6")
    ).groupBy("query_id", doc_id_col).agg(F.sum("s_e6").cast("long").alias("lex_e6"))
    wl = Window.partitionBy("query_id").orderBy(F.desc("lex_e6"), F.asc(doc_id_col))
    # Shortlist BOTH arms: without the cap, one stopword-like query
    # term makes the lexical partition corpus-sized and the fusion
    # join/window processes corpus x queries rows, although only the
    # first ~k ranks can reach the fused top-k (1e12/(60+rank) decays
    # fast). The cap keeps the docstring's bound honest: everything
    # after ranking touches at most (shortlist x queries) rows.
    lex = (
        lex_scores.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= lex_shortlist)
        .select("query_id", doc_id_col, "lex_rank")
    )

    # ---- vector arm: brute-force cosine shortlist (v1 contract) ----
    # norms carried per vector row (cosine_pre): once per row, not
    # once per (query, doc) scored pair — value-identical
    base = emb.select(
        F.col(vec_id_col).alias(doc_id_col),
        _as_double(vec_col).alias("v"),
        norm(_as_double(vec_col)).alias("nv"),
    )
    qv = base.filter(F.col(doc_id_col).isin(*query_ids)).select(
        F.col(doc_id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nv").alias("qn"),
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("cos6"), F.asc(doc_id_col))
    vec = (
        base.crossJoin(F.broadcast(qv))
        .filter(F.col(doc_id_col) != F.col("query_id"))
        .select(
            "query_id",
            doc_id_col,
            F.round(
                cosine_pre(F.col("qv"), F.col("v"), F.col("qn"), F.col("nv")), 6
            ).alias("cos6"),
        )
        .withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= vec_shortlist)
        .select("query_id", doc_id_col, "vec_rank")
    )

    # ---- RRF fusion: integer fixed point, missing arm contributes 0 ----
    fused = lex.join(vec, ["query_id", doc_id_col], "full_outer").select(
        "query_id",
        doc_id_col,
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(
                F.expr(f"CAST({RRF_SCALE} div ({rrf_k} + lex_rank) AS BIGINT)"),
                F.lit(0),
            )
            + F.coalesce(
                F.expr(f"CAST({RRF_SCALE} div ({rrf_k} + vec_rank) AS BIGINT)"),
                F.lit(0),
            )
        ).alias("rrf_e12"),
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_e12"), F.asc(doc_id_col))
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            F.col(doc_id_col),
            "lex_rank",
            "vec_rank",
            "rrf_e12",
            F.col("rn").cast("int").alias("rn"),
        )
    )
