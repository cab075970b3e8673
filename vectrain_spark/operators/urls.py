"""URL analytics for a web corpus: canonical URL normalization,
URL-keyed deduplication, and per-domain rollups.

A Common-Crawl-style pipeline sees the same page under many URL spellings
(scheme case, `www.` prefix, trailing slash, tracking query params); URL
normalization + dedup is the standard first pass before any content-level
dedup, and per-domain stats drive crawl-politeness and quality decisions.
The reference has no analog (its id story is a random UUID per upsert,
/root/reference/internal/app/storages/qdrant/store.go:32) — these
operators are the deterministic-key discipline applied to the URL axis.

All pure JVM expressions (regexp_replace / parse_url — whole-stage
codegen, zero Python), so each query carries an exact DuckDB oracle that
replays the identical normalization in RE2.

Scale: normalization is narrow per-row work fused into the scan;
`url_dedup` is one groupBy shuffle on the normalized key with map-side
partial aggregation; `domain_stats` is one groupBy on host (domain
cardinality ~10^7 at Common-Crawl scale — far below doc count, so the
shuffle is small; a hot mega-domain only skews if a single reducer key
exceeds task memory, which count/sum partial aggs prevent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

URL_TLDS = ["com", "org", "net", "io"]

# tracking params stripped by normalization (Java regex == RE2 subset)
_TRACKING = r"(\?|&)(utm_[a-z]+|ref|fbclid|gclid)=[^&#]*"


def url_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic URL-bearing fixture from `documents`: consecutive
    doc_id pairs (2k, 2k+1) point at the SAME logical page spelled two
    ways (www. prefix, trailing slash, tracking params differ), so the
    normalized key collides exactly per pair and the SQL oracle can
    reconstruct every step arithmetically."""
    d = F.col("doc_id")
    page = F.floor(d / 2)
    tld = F.element_at(
        F.array(*[F.lit(t) for t in URL_TLDS]), (page % 4 + 1).cast("int")
    )
    url = F.concat(
        F.lit("https://"),
        F.when(d % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"),
        (page % 37).cast("string"),
        F.lit(".example."),
        tld,
        F.lit("/page/"),
        page.cast("string"),
        F.when(d % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(
            d % 5 == 0, F.concat(F.lit("?utm_source=feed&ref="), (d % 5).cast("string"))
        )
        .when(d % 5 == 2, F.lit("?gclid=abc#frag"))
        .otherwise(F.lit("")),
    )
    return docs.select("doc_id", url.alias("url"), "lang", "n_chars")


def normalize_url(col: Column) -> Column:
    """Canonical URL: lowercase, fragment dropped, `www.` stripped,
    tracking query params (utm_*, ref, fbclid, gclid) removed, empty
    query and trailing slash trimmed. Every step is a Java-regex
    replacement with an exact RE2/DuckDB twin."""
    u = F.lower(col)
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    u = F.regexp_replace(u, _TRACKING, "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_dedup(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(doc_id, url, ...) -> (url_norm, keep_id, dup_cnt): group on the
    normalized URL, keep the smallest doc_id (deterministic survivor)."""
    return (
        pages.select(normalize_url(F.col(url_col)).alias("url_norm"), "doc_id")
        .groupBy("url_norm")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-domain corpus rollup over normalized URLs: host extracted with
    Spark's parse_url (JVM), TLD split off, doc/lang/char totals
    aggregated in one shuffle.

    -> (host, tld, n_docs, n_langs, total_chars, avg_chars)."""
    host = F.parse_url(normalize_url(F.col(url_col)), F.lit("HOST"))
    return (
        pages.select(
            host.alias("host"),
            "lang",
            "n_chars",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        )
        .select(
            "host",
            F.regexp_extract("host", r"\.([a-z]+)$", 1).alias("tld"),
            "n_docs",
            "n_langs",
            "total_chars",
            "avg_chars",
        )
    )
