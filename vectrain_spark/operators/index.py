"""Search-index construction over the document corpus: TF-IDF term
scoring and inverted-index (posting-list) materialization.

The reference's whole retrieval story is "upsert vectors into Qdrant and
let it answer" (/root/reference/internal/app/storages/qdrant/store.go:40-49);
a corpus engine also needs the LEXICAL retrieval half — term statistics
and posting lists — which, like the adjacency table (Z1), is a
materialized artifact derived in one aggregation pass.

Both operators are pure JVM (explode + two-phase groupBy, map-side
partial aggregation) with exact DuckDB oracles; doubles are rounded to 6
decimals BEFORE ranking so both engines rank identical values.

Scale: one (doc, term) shuffle for TF, one (term) shuffle for DF/postings
— both keyed on cardinalities that grow sublinearly with corpus bytes.
Hot terms (stopwords) are exactly the aggregation-skew case partial
aggregation collapses; posting lists are capped (top-k doc ids) so no
reducer materializes an unbounded list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalized_text, spread

TOP_TERMS = 3  # tf-idf terms kept per doc
POSTINGS_CAP = 5  # doc ids kept per posting list


def tfidf_top_terms(docs: DataFrame, k: int = TOP_TERMS) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    tf = occurrences of term in doc, df = docs containing term,
    idf = ln((N + 1) / (df + 1)) + 1 (smoothed), score = tf * idf
    rounded to 6 decimals; rank by (score desc, term asc) — fully
    deterministic. -> (doc_id, term, tf, df, score, rk).
    """
    words = spread(docs).select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0)),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id", "term", "tf", "df", "score", F.col("rk").cast("int").alias("rk")
        )
    )


def inverted_index(docs: DataFrame, cap: int = POSTINGS_CAP) -> DataFrame:
    """Posting-list materialization: per term, document frequency, total
    occurrences, and the first ``cap`` doc ids (ascending) as a CSV string
    (string form keeps the artifact engine-portable and hash-comparable).

    -> (term, df, total_tf, postings).
    """
    words = spread(docs).select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("term")
    )
    per_doc = words.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, cap),
                ",",
            ).alias("postings"),
        )
        .select("term", "df", F.col("total_tf").cast("long").alias("total_tf"), "postings")
    )
