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


BM25_QUERY = ("spark", "table", "merge")
BM25_TOP_K = 10


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOP_K,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Spärck Jones, k1=1.2 b=0.75) ->
    (doc_id, n_hits, score_micro, rank): the lexical ranking function
    every search stack pairs with the vector side the reference stores
    in Qdrant — scored ENTIRELY in BIGINT so both engines rank
    identically.

    Exact-integer form: with S = total corpus tokens, N = docs,
    avgdl = S/N, the per-term score

        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    multiplies through by 10*S into

        (idf_micro * 22 * tf * S) div (10*S*tf + 3*S + 9*dl*N)

    — numerator/denominator pure BIGINT (k1=12/10, b=3/4 as rationals),
    idf quantized once to micro-units (floor(ln((N-df+0.5)/(df+0.5)+1)
    * 1e6), the suite's quantized-log idiom). Safe while
    idf_micro*22*tf*S < 2^63 — ~2e14 corpus tokens at tf<=20; shard the
    scoring per partition-corpus beyond that (the sum is mergeable).

    Scale shape: query terms broadcast onto ONE pass of the (doc, term)
    TF table (semi-join — only matching postings survive the scan); DF
    and the global (S, N) scalars are one aggregate each; final top-k is
    a rank window over only the docs that matched at least one term.
    """
    words = spread(docs).select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("w")
    ).filter(F.col("w") != "")
    dl = words.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    glob = dl.agg(
        F.sum("dl").alias("s"), F.count(F.lit(1)).alias("n")
    )
    q = words.sparkSession.createDataFrame(
        [(t,) for t in query_terms], "w string"
    )
    tf = (
        words.join(F.broadcast(q), "w")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.crossJoin(F.broadcast(glob)).select(
        "w",
        F.floor(
            F.log(
                (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(1e6)
        )
        .cast("long")
        .alias("idf_micro"),
    )
    scored = (
        tf.join(F.broadcast(idf), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(glob))
        .select(
            "doc_id",
            F.expr(
                "idf_micro * 22 * tf * s div"
                " (10 * s * tf + 3 * s + 9 * dl * n)"
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.sum("term_score").cast("long").alias("score_micro"),
        )
    )
    # top-k as orderBy+limit (plans TakeOrderedAndProject — per-partition
    # heaps, never a single-reducer global sort); the rank window then
    # runs over only the k survivors
    top = scored.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


def bm25_oracle_sql(
    norm_sql: str,
    query_terms: tuple[str, ...] = BM25_QUERY,
    k: int = BM25_TOP_K,
) -> str:
    """DuckDB replay of :func:`bm25_topk` — identical rational BM25
    form and micro-unit idf quantization."""
    terms = ", ".join(f"('{t}')" for t in query_terms)
    return f"""
WITH bm_w AS (
  SELECT doc_id, unnest(string_split({norm_sql}, ' ')) AS w FROM documents
),
bm_wf AS (SELECT doc_id, w FROM bm_w WHERE w != ''),
bm_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM bm_wf GROUP BY 1),
bm_g AS (SELECT sum(dl)::BIGINT AS s, count(*)::BIGINT AS n FROM bm_dl),
bm_q(w) AS (VALUES {terms}),
bm_tf AS (
  SELECT doc_id, w, count(*)::BIGINT AS tf FROM bm_wf
  WHERE w IN (SELECT w FROM bm_q) GROUP BY 1, 2
),
bm_df AS (SELECT w, count(*)::BIGINT AS df FROM bm_tf GROUP BY 1),
bm_idf AS (
  SELECT w, floor(ln((n - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0)::BIGINT
           AS idf_micro
  FROM bm_df, bm_g
),
bm_sc AS (
  SELECT t.doc_id,
         (i.idf_micro * 22 * t.tf * g.s)
           // (10 * g.s * t.tf + 3 * g.s + 9 * d.dl * g.n) AS term_score
  FROM bm_tf t
  JOIN bm_idf i USING (w)
  JOIN bm_dl d USING (doc_id)
  CROSS JOIN bm_g g
),
bm_agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_hits,
         sum(term_score)::BIGINT AS score_micro
  FROM bm_sc GROUP BY 1
)
SELECT doc_id, n_hits, score_micro,
       rank::INT AS rank
FROM (
  SELECT *, row_number() OVER (
    ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM bm_agg
) WHERE rank <= {k}
"""
