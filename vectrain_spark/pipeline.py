"""End-to-end KG construction pipeline: extract -> link -> canonicalize ->
materialize, with per-partition lineage (Z2) and resumable checkpoints (Z3).

Dataflow (mirrors the reference's consume->embed->store skeleton,
/root/reference/internal/app/pipeline/pipeline.go:69-103, re-expressed as a
Catalyst plan):

    pages (bucketed by xxhash64(url) into n_groups resume units)
      └─ per pending group (one Spark job; at cluster scale each group is
         a full partition-batch, the unit of checkpoint commit):
           extract (Arrow UDF) ── quarantine split
           triples (Arrow UDF, fused in the same stage — no shuffle yet)
           distinct mention surfaces (the ONLY shuffle before the sink)
           link (broadcast alias index probe, zero shuffle)
           canonical ids (broadcast mapping join)
           append snapshot: triples + quarantine + lineage
           commit group to checkpoint manifest
      └─ finalize: global dedup / edge aggregation over the triples table
         (replace snapshots for canonical_triples, edges, adjacency)

Group membership is ``pmod(xxhash64(url), n_groups)`` — stable across
cluster sizes and re-runs, so the resume manifest means the same thing at
any parallelism (SURVEY.md §4.2 partitioning note).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog, GroupManifest
from .operators.canonicalize import (
    apply_canonical,
    connected_components,
    dedup_triples,
    edges_from_aliases,
)
from .operators.extract import extract_pages, extract_triples_df, split_quarantine
from .operators.linking import (
    LINK_THRESHOLD,
    N_BANDS,
    N_BITS,
    AliasIndex,
    build_alias_index,
    link_mentions,
    mention_surfaces,
)
from .textops import EMBED_DIM


@dataclass
class PipelineConfig:
    n_groups: int = 4
    dim: int = EMBED_DIM
    n_bits: int = N_BITS
    n_bands: int = N_BANDS
    threshold: float = LINK_THRESHOLD

    def fingerprint(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


class InjectedFailure(RuntimeError):
    """Raised by the fail_after test hook to simulate a mid-run crash."""


def _canonical_mapping(spark: SparkSession, aliases_df: DataFrame, cat: Catalog) -> DataFrame:
    """Compute (or reuse) the entity -> canonical-id mapping (C2).

    Deterministic in the alias dictionary alone, so it is computed once per
    run and cached as a replace snapshot — resume reuses it bit-identically.
    """
    if cat.exists("entity_canon"):
        return cat.read(spark, "entity_canon")
    mapping = connected_components(edges_from_aliases(aliases_df))
    cat.write("entity_canon", mapping, mode="replace")
    return cat.read(spark, "entity_canon")


def _run_group(
    spark: SparkSession,
    pages: DataFrame,
    index: AliasIndex,
    mapping: DataFrame,
    group: int,
    n_groups: int,
    cat: Catalog,
) -> dict:
    """Process one bucket-group end-to-end and commit its snapshots."""
    t0 = time.time()
    sub = pages.filter(F.pmod(F.xxhash64("url"), F.lit(n_groups)) == group)
    ext = extract_pages(sub)
    good, quarantine = split_quarantine(ext)
    tri = extract_triples_df(good)

    surfaces = mention_surfaces(tri)
    linked_m = link_mentions(spark, surfaces, index)
    subj_map = linked_m.select(
        F.col("surface").alias("subj"),
        F.col("entity_id").alias("subj_id"),
        F.col("method").alias("subj_method"),
    )
    obj_map = linked_m.select(
        F.col("surface").alias("obj"), F.col("entity_id").alias("obj_id")
    )
    # linked-mention maps are distinct-surface-sized (bounded by dictionary
    # + tail) -> broadcast; triples never shuffle on their way to the sink
    linked = tri.join(F.broadcast(subj_map), "subj").join(F.broadcast(obj_map), "obj")
    canon = apply_canonical(linked, mapping).select(
        "url",
        "sent_idx",
        "subj",
        "pred",
        "obj",
        "subj_id",
        "obj_id",
        "subj_canon",
        "obj_canon",
        "part_id",
        F.lit(group).alias("group_id"),
    )

    # one pass: cache the group's extract output so triples/lineage/quarantine
    # don't re-extract (html decode is the expensive stage)
    ext = ext.persist()
    try:
        lineage_pages = ext.groupBy("part_id").agg(
            F.count(F.lit(1)).alias("pages"),
            F.count("error").alias("errors"),
            F.sum("html_bytes").alias("bytes"),
            F.sum("wall_share").alias("extract_wall_sec"),
        )
        lineage_tri = tri.groupBy("part_id").agg(F.count(F.lit(1)).alias("triples"))
        lineage = (
            lineage_pages.join(lineage_tri, "part_id", "left")
            .withColumn("triples", F.coalesce("triples", F.lit(0)))
            .withColumn("group_id", F.lit(group))
            .withColumn("committed_at", F.lit(time.time()))
        )

        n_triples = canon.count()
        cat.write("triples", canon, mode="append", meta={"group": group})
        cat.write(
            "quarantine",
            quarantine.withColumn("group_id", F.lit(group)),
            mode="append",
            meta={"group": group},
        )
        cat.write("lineage", lineage, mode="append", meta={"group": group})
    finally:
        ext.unpersist()
    return {"group": group, "triples": int(n_triples), "wall_sec": time.time() - t0}


def finalize(spark: SparkSession, cat: Catalog) -> dict:
    """Global aggregates over the committed triples table (C3 + Z1).

    Derived tables are replace snapshots — rebuildable from the fact table
    at any time, so a crash between group commits and finalize is harmless.
    """
    triples = cat.read(spark, "triples")
    canonical = dedup_triples(triples)
    cat.write("canonical_triples", canonical, mode="replace")
    canonical = cat.read(spark, "canonical_triples")

    edges = canonical.select(
        F.col("subj_canon").alias("src"),
        F.col("obj_canon").alias("dst"),
        "pred",
        "cnt",
    )
    cat.write("edges", edges, mode="replace")
    adjacency = (
        cat.read(spark, "edges")
        .groupBy("src")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("dst", "pred", "cnt"))
            ).alias("out_edges"),
            F.sum("cnt").alias("degree"),
        )
    )
    cat.write("adjacency", adjacency, mode="replace")
    return {
        "canonical_triples": cat.read(spark, "canonical_triples").count(),
        "edges": cat.read(spark, "edges").count(),
    }


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    out_root: str,
    cfg: PipelineConfig | None = None,
    fail_after_groups: int | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns run stats.

    ``fail_after_groups`` injects a crash after K committed groups — the
    resume test hook (SURVEY.md §5.2 item 4).
    """
    cfg = cfg or PipelineConfig()
    cat = Catalog(out_root)
    manifest = GroupManifest(out_root, cfg.fingerprint())

    # effectively-exactly-once: a group counts as done if EITHER the
    # checkpoint manifest says so OR its data snapshot already committed
    # (covers a crash between data commit and manifest commit)
    done = manifest.completed()
    if cat.exists("triples"):
        for snap in cat.snapshots("triples"):
            g = snap["meta"].get("group")
            if g is not None:
                done.add(int(g))

    alias_pdf = aliases.toPandas()
    index = build_alias_index(
        alias_pdf,
        dim=cfg.dim,
        n_bits=cfg.n_bits,
        n_bands=cfg.n_bands,
        threshold=cfg.threshold,
    )
    mapping = _canonical_mapping(spark, aliases, cat)

    stats: dict = {"groups": [], "resumed_from": sorted(done)}
    ran = 0
    for g in range(cfg.n_groups):
        if g in done:
            continue
        gstats = _run_group(spark, pages, index, mapping, g, cfg.n_groups, cat)
        manifest.mark_done(g, gstats)
        stats["groups"].append(gstats)
        ran += 1
        if fail_after_groups is not None and ran >= fail_after_groups:
            raise InjectedFailure(f"injected failure after {ran} groups")

    stats.update(finalize(spark, cat))
    return stats
