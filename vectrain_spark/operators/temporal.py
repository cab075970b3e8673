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


_TEMPORAL_INF = "9999-12-31 23:59:59"


def functional_conflicts(
    hist: DataFrame, key_cols: list[str], obj_col: str
) -> DataFrame:
    """Temporal functional-dependency violations over SCD2 history:
    pairs of fact versions that share ``key_cols`` (e.g. subj + a
    functional predicate) but assert DIFFERENT ``obj_col`` values over
    OVERLAPPING validity intervals -> (key_cols..., obj_a, obj_b,
    overlap_from, overlap_to) with obj_a < obj_b and open intervals
    (valid_to NULL) treated as unbounded.

    The KB-quality gate every fusion pipeline runs before publishing: a
    subject may change its value for a functional predicate over time,
    but two values alive AT THE SAME INSTANT is a contradiction to
    quarantine (cf. kg_fact_fusion, which picks a winner — this finds
    what needs picking).

    Scale shape: one self-equi-join HASH-keyed on key_cols. Input is
    FUSED entity-level history (fact_history on (key..., obj)), so
    versions per key are bounded by distinct-objects x presence-runs —
    schema-bounded for functional predicates, never corpus-sized; the
    interval-overlap predicate and the obj ordering are post-join
    filters on that bounded set. No range join, no window, no explode.
    """
    cols = [*key_cols, obj_col, "valid_from", "valid_to"]
    a = hist.select(*cols).toDF(*key_cols, "obj_a", "_fa", "_ta")
    b = hist.select(*cols).toDF(*key_cols, "obj_b", "_fb", "_tb")
    inf = F.lit(_TEMPORAL_INF).cast("timestamp")
    ta = F.coalesce(F.col("_ta"), inf)
    tb = F.coalesce(F.col("_tb"), inf)
    out_to = F.least(ta, tb)
    return (
        a.join(b, key_cols)
        .filter(F.col("obj_a") < F.col("obj_b"))
        .filter((F.col("_fa") < tb) & (F.col("_fb") < ta))
        .select(
            *key_cols,
            "obj_a",
            "obj_b",
            F.greatest(F.col("_fa"), F.col("_fb")).alias("overlap_from"),
            F.when(out_to == inf, F.lit(None).cast("timestamp"))
            .otherwise(out_to)
            .alias("overlap_to"),
        )
    )
