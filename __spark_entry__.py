"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG pipeline (extract -> link -> canonicalize
                -> dedup) over pages derived from sf0.001 documents.
queries()     — one entry per implemented operator (SURVEY.md §2.3 +
                training-data ops); each callable takes (spark, sf_dir).
oracle_sql()  — DuckDB-runnable ANSI SQL producing the same result set,
                column names/types aligned (values rounded identically on
                both sides). EVERY queries() entry has an oracle: the
                approximate operators (sim_ann_ivf, dedup_embedding_lsh)
                are deterministic by construction (seeded planes / rounded
                JVM cosines), so their oracles reconstruct the exact
                expected output rather than settling for rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectrain_spark.driver_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: canonical KG triples."""
    return QUERIES["kg_canonical_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
