"""Privacy-preserving release operators over the training corpus.

Training-data pipelines ship corpora derived from user-generated web
pages; before a release, quasi-identifier combinations (language x
source x size profile here; age x zip x gender in the classic setting)
must not isolate individual documents. `datafly_k_anon` implements the
Datafly-style generalization ladder (Sweeney 2002): each row is released
at the FINEST quasi-identifier level whose equivalence class reaches
size k, climbing a fixed generalization hierarchy, and suppressed only
when even the coarsest level fails.

Reference analog: none — vectrain stores payloads verbatim
(internal/domain/vector.go); this is the release gate a corpus
distribution step needs on top.

Scale shape: class-count tables are bounded by the generalization
lattice — the coarsest (per-language) level broadcasts; finer levels
scale with distinct (source x bucket) combinations, so they join
co-keyed and AQE promotes them to broadcast only when runtime-small.
The level choice is a pure projection (coalesce down the ladder).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_ANON_DEFAULT = 5


def datafly_k_anon(docs: DataFrame, k: int = K_ANON_DEFAULT) -> DataFrame:
    """Per-document k-anonymity verdict over the generalization ladder

        level 0: (lang, source, floor(n_chars/10))   — finest
        level 1: (lang, floor(n_chars/20))
        level 2: (lang,)                             — coarsest

    -> (doc_id, lang, source, b10, b20, anon_level, class_n): the finest
    level whose equivalence class holds >= k rows, with that class's
    size; anon_level 3 = suppressed (even per-language grouping is
    below k). Every count is exact BIGINT; bucket edges are integer
    division — nothing engine-sensitive anywhere.
    """
    base = docs.select(
        "doc_id",
        "lang",
        "source",
        F.floor(F.col("n_chars") / 10).cast("long").alias("b10"),
        F.floor(F.col("n_chars") / 20).cast("long").alias("b20"),
    )
    c0 = base.groupBy("lang", "source", "b10").agg(
        F.count(F.lit(1)).alias("n0")
    )
    c1 = base.groupBy("lang", "b20").agg(F.count(F.lit(1)).alias("n1"))
    c2 = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n2"))
    # c2 is language-sized -> broadcast unconditionally; c0/c1 grow with
    # distinct (source x bucket) combinations — up to corpus-sized on a
    # web crawl with millions of domains — so they join co-keyed (AQE
    # downgrades to broadcast from the RUNTIME size when they are small,
    # which is the only safe direction at 100 TB)
    j = (
        base.join(c0, ["lang", "source", "b10"])
        .join(c1, ["lang", "b20"])
        .join(F.broadcast(c2), ["lang"])
    )
    lvl = (
        F.when(F.col("n0") >= k, F.lit(0))
        .when(F.col("n1") >= k, F.lit(1))
        .when(F.col("n2") >= k, F.lit(2))
        .otherwise(F.lit(3))
    )
    cls = (
        F.when(F.col("n0") >= k, F.col("n0"))
        .when(F.col("n1") >= k, F.col("n1"))
        .when(F.col("n2") >= k, F.col("n2"))
        .otherwise(F.lit(0))
    )
    return j.select(
        "doc_id",
        "lang",
        "source",
        "b10",
        "b20",
        lvl.cast("int").alias("anon_level"),
        cls.cast("long").alias("class_n"),
    )


def datafly_oracle_sql(
    docs_table: str = "documents", k: int = K_ANON_DEFAULT
) -> str:
    """DuckDB replay of :func:`datafly_k_anon` — identical ladder,
    identical integer bucket edges."""
    return f"""
WITH ka_base AS (
  SELECT doc_id, lang, source,
         (n_chars // 10)::BIGINT AS b10,
         (n_chars // 20)::BIGINT AS b20
  FROM {docs_table}
),
ka_c0 AS (
  SELECT lang, source, b10, count(*)::BIGINT AS n0
  FROM ka_base GROUP BY 1, 2, 3
),
ka_c1 AS (
  SELECT lang, b20, count(*)::BIGINT AS n1 FROM ka_base GROUP BY 1, 2
),
ka_c2 AS (
  SELECT lang, count(*)::BIGINT AS n2 FROM ka_base GROUP BY 1
)
SELECT b.doc_id, b.lang, b.source, b.b10, b.b20,
       CASE WHEN n0 >= {k} THEN 0 WHEN n1 >= {k} THEN 1
            WHEN n2 >= {k} THEN 2 ELSE 3 END::INT AS anon_level,
       CASE WHEN n0 >= {k} THEN n0 WHEN n1 >= {k} THEN n1
            WHEN n2 >= {k} THEN n2 ELSE 0 END::BIGINT AS class_n
FROM ka_base b
JOIN ka_c0 USING (lang, source, b10)
JOIN ka_c1 USING (lang, b20)
JOIN ka_c2 USING (lang)
"""
