"""URL canonicalization + URL-level dedup.

The first dedup pass of every web-corpus pipeline (before any
content-based dedup): two crawls of the same page usually differ only
in URL noise — scheme case, ``www.``, trailing slashes, tracking
query parameters, fragments. Folding those variants collapses
re-crawls at zero content cost.

Everything here is native regexp/array expressions (JVM-side,
whole-stage codegen — no UDFs): at 100 TB this is a map stage fused
into the scan, and the dedup itself shuffles only the canonical-URL
string per row.

Canonicalization rules (deliberately conservative — each one is a
pure string rewrite mirrored exactly by the DuckDB oracle):

* drop the ``#fragment``;
* lowercase the scheme and host; strip a leading ``www.``;
* ports are dropped with the authority parse (host stops at ``:``);
* strip trailing ``/`` from the path (empty path -> ``/``);
* drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``) and SORT the survivors, so parameter order is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# '(=|$)' instead of '=': valueless tracking params ('?fbclid',
# '?utm_source') must fold too, or recrawl variants stay distinct.
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL as one codegen'd expression."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"://(?:[^/?#]*@)?([^/:?#]+)", 1)),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_extract(u, r"://[^/?#]*([^?#]*)", 1), "/+$", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(qs, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def duckdb_canonical_url(url_expr: str) -> str:
    """Oracle SQL mirroring :func:`canonical_url` rewrite-for-rewrite."""
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({u}, '://(?:[^/?#]*@)?([^/:?#]+)', 1)),"
        f" '^www\\.', '')"
    )
    path = f"regexp_replace(regexp_extract({u}, '://[^/?#]*([^?#]*)', 1), '/+$', '')"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    qs = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    # DuckDB array_to_string([]) is NULL where Spark array_join is ''
    kept = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split({qs}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&'), '')"
    )
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"(CASE WHEN {kept} = '' THEN '' ELSE '?' || {kept} END)"
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Collapse URL variants: one representative (min id) per
    canonical URL, with the variant count and the canonical form.
    One exchange, keyed on the canonical string."""
    return (
        df.select(F.col(id_col), canonical_url(F.col(url_col)).alias("canon_url"))
        .groupBy("canon_url")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count("*").cast("long").alias("n_variants"),
        )
    )
