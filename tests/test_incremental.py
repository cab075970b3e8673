"""Incremental MERGE waves (run_incremental): overlap-safe append,
crash-resume within a wave, and no-op behavior on fully-seen input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectrain_spark.catalog import Catalog
from vectrain_spark.pipeline import (
    InjectedFailure,
    PipelineConfig,
    run_incremental,
    run_pipeline,
)

CFG = PipelineConfig(n_groups=4)


def _triples(spark, root):
    return set(
        map(
            tuple,
            Catalog(root)
            .read(spark, "triples")
            .select("url", "subj", "pred", "obj")
            .toPandas()
            .values,
        )
    )


@pytest.fixture(scope="module")
def oneshot(spark, pages_df, aliases_df, tmp_path_factory):
    """Reference: the same corpus through a single batch run."""
    root = str(tmp_path_factory.mktemp("incr_ref"))
    run_pipeline(spark, pages_df, aliases_df, root, CFG)
    return _triples(spark, root)


def _halves(pages_df):
    pid = F.regexp_extract("url", "([0-9]+)$", 1).cast("long")
    return pages_df.filter(pid % 2 == 0), pages_df


def test_incremental_overlap_merges_to_batch_result(
    spark, pages_df, aliases_df, tmp_path_factory, oneshot
):
    root = str(tmp_path_factory.mktemp("incr"))
    first, full = _halves(pages_df)
    run_pipeline(spark, first, aliases_df, root, CFG)
    stats = run_incremental(spark, full, aliases_df, root, CFG, wave="w2")
    assert _triples(spark, root) == oneshot
    # lineage conservation: every page processed exactly once across waves
    lin = Catalog(root).read(spark, "lineage").toPandas()
    assert lin["pages"].sum() == pages_df.count()
    # the wave reports only the delta pages' triples in its group stats
    assert stats["groups"], "wave should have processed pending groups"


def test_incremental_crash_mid_wave_resumes_losslessly(
    spark, pages_df, aliases_df, tmp_path_factory, oneshot
):
    root = str(tmp_path_factory.mktemp("incr_crash"))
    first, full = _halves(pages_df)
    run_pipeline(spark, first, aliases_df, root, CFG)
    with pytest.raises(InjectedFailure):
        run_incremental(
            spark, full, aliases_df, root, CFG, wave="w2", fail_after_groups=1
        )
    # resume the SAME wave: completed wave-groups skip, the rest process
    stats = run_incremental(spark, full, aliases_df, root, CFG, wave="w2")
    assert len(stats["resumed_from"]) == 1
    assert _triples(spark, root) == oneshot
    urls = Catalog(root).read(spark, "extracted").select("url").toPandas()["url"]
    assert urls.is_unique, "no page may be extracted twice across waves"


def test_incremental_no_new_pages_is_a_noop(
    spark, pages_df, aliases_df, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("incr_noop"))
    run_pipeline(spark, pages_df, aliases_df, root, CFG)
    before = _triples(spark, root)
    n_before = Catalog(root).read(spark, "extracted").count()
    run_incremental(spark, pages_df, aliases_df, root, CFG, wave="again")
    assert _triples(spark, root) == before
    assert Catalog(root).read(spark, "extracted").count() == n_before


def test_incremental_rejects_config_change(
    spark, pages_df, aliases_df, tmp_path_factory
):
    """A wave under a different n_groups must refuse instead of pruning the
    other config's committed data and merging only its own delta."""
    root = str(tmp_path_factory.mktemp("incr_cfgguard"))
    run_pipeline(spark, pages_df, aliases_df, root, PipelineConfig(n_groups=4))
    with pytest.raises(ValueError, match="different pipeline config"):
        run_incremental(
            spark, pages_df, aliases_df, root, PipelineConfig(n_groups=8), wave="w2"
        )
    # the warehouse is untouched: a matching-config re-run still no-ops
    stats = run_pipeline(spark, pages_df, aliases_df, root, PipelineConfig(n_groups=4))
    assert len(stats["resumed_from"]) == 4 and not stats["groups"]


def test_plain_run_after_wave_bootstrap_no_duplicates(
    spark, pages_df, aliases_df, tmp_path_factory, oneshot
):
    """Completion is wave-scoped, so a plain (wave=None) run over a
    warehouse bootstrapped via a wave must rely on the url anti-join —
    not re-append every page (review finding)."""
    root = str(tmp_path_factory.mktemp("incr_plain_after_wave"))
    run_incremental(spark, pages_df, aliases_df, root, CFG, wave="w1")
    assert _triples(spark, root) == oneshot
    run_pipeline(spark, pages_df, aliases_df, root, CFG)  # plain re-run
    assert _triples(spark, root) == oneshot
    urls = Catalog(root).read(spark, "extracted").select("url").toPandas()["url"]
    assert urls.is_unique


def test_wave_resume_after_crash_before_any_triples_commit(
    spark, pages_df, aliases_df, tmp_path_factory, oneshot
):
    """Worst-case crash: an extracted delta committed but NO triples commit
    exists yet. The staging sync prunes the orphan (possibly leaving an
    empty-manifest extracted table) and the wave must still run (review
    finding: the empty snapshot used to crash cat.read)."""
    from pyspark.sql import functions as F

    root = str(tmp_path_factory.mktemp("incr_orphan_bootstrap"))
    cat = Catalog(root)
    orphan = pages_df.limit(5).select(
        "url", "warc_ts", "lang",
        F.lit(None).cast("string").alias("error"),
        F.lit("x").alias("text"),
        F.lit(0).alias("part_id"),
        F.lit(1).cast("long").alias("html_bytes"),
        F.lit(0.0).alias("wall_share"),
        F.lit(0).alias("group_id"),
    )
    cat.write("extracted", orphan, mode="append", meta={"group": 0, "wave": "w1"})
    stats = run_incremental(spark, pages_df, aliases_df, root, CFG, wave="w1")
    assert len(stats["groups"]) == 4
    assert _triples(spark, root) == oneshot


def test_rerun_after_compaction_preserves_staging(
    spark, pages_df, aliases_df, tmp_path_factory, oneshot
):
    """Catalog.compact leaves live triples data with no (group, wave)
    attribution; the staging sync must then SKIP pruning instead of wiping
    the extracted table (review finding)."""
    root = str(tmp_path_factory.mktemp("incr_compacted"))
    run_pipeline(spark, pages_df, aliases_df, root, CFG)
    cat = Catalog(root)
    n_extracted = cat.read(spark, "extracted").count()
    cat.compact(spark, "triples", target_files=2)
    stats = run_pipeline(spark, pages_df, aliases_df, root, CFG)
    assert cat.read(spark, "extracted").count() == n_extracted
    assert _triples(spark, root) == oneshot
    assert not stats["groups"] or _triples(spark, root) == oneshot
