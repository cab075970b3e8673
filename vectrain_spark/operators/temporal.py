"""Temporal fact versioning (SCD2) over snapshot observations.

A KG built from repeated crawls observes each fact (a key tuple such as
(url, subj, pred, obj)) at a subset of the snapshot timestamps. The
downstream consumer wants VALIDITY INTERVALS, not observations: when did
the fact appear, when did it disappear, did it come back — the
slowly-changing-dimension type-2 table every temporal knowledge base
(Wikidata qualifiers, Iceberg snapshot history) keys queries on.

Reference analogy: vectrain re-ingests a source and upserts entities by
id (internal/adapter/vector_db/weaviate/repository.go), so history is
overwritten; this operator is the deliberate delta — it keeps history as
first-class rows, derived with pure relational algebra.

Scale shape: the snapshot dimension is tiny by construction (one row per
crawl wave — tens, never millions), so it broadcasts everywhere. The
only corpus-sized exchange is one hash partition by fact key; run
detection is the classic gaps-and-islands window WITHIN a key (state =
that key's observation count, bounded by the number of snapshots).
Nothing collects to the driver; no global window exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fact_history(
    facts: DataFrame, key_cols: list[str], ts_col: str = "warc_ts"
) -> DataFrame:
    """Observations (key_cols..., ts_col) -> SCD2 validity intervals
    (key_cols..., valid_from, valid_to, is_current).

    A fact observed at consecutive snapshots forms ONE interval
    [first_ts, ts_of_first_snapshot_where_absent); an interval whose run
    reaches the newest snapshot is open (valid_to NULL, is_current). A
    fact that disappears and returns yields multiple rows — history is
    never overwritten.

    Algorithm: dense-index the (tiny) snapshot dimension, dedupe
    observations to (key, snapshot_idx), then gaps-and-islands: within a
    key ordered by idx, run_id = idx - row_number() is constant exactly
    along consecutive presence; one grouped aggregate per run emits the
    interval, and the run's last idx + 1 maps back through the snapshot
    dimension to the closing timestamp (absent for the newest snapshot
    -> open interval).
    """
    snaps = (
        facts.select(F.col(ts_col).alias("_ts"))
        .distinct()
        .withColumn(
            "_idx",
            F.row_number().over(Window.orderBy("_ts")) - 1,
        )
    )
    # the single-partition window above runs over the snapshot DIMENSION
    # (one row per crawl wave), never over facts
    obs = (
        facts.select(*key_cols, F.col(ts_col).alias("_ts"))
        .distinct()
        .join(F.broadcast(snaps), "_ts")
    )
    w = Window.partitionBy(*key_cols).orderBy("_idx")
    runs = (
        obs.withColumn("_run", F.col("_idx") - F.row_number().over(w))
        .groupBy(*key_cols, "_run")
        .agg(
            F.min("_ts").alias("valid_from"),
            F.max("_idx").alias("_last_idx"),
        )
    )
    closing = snaps.select(
        (F.col("_idx") - 1).alias("_last_idx"), F.col("_ts").alias("valid_to")
    )
    return (
        runs.join(F.broadcast(closing), "_last_idx", "left")
        .select(
            *key_cols,
            "valid_from",
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
