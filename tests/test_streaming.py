"""Structured Streaming ingestion: micro-batched pages through the same
operator graph, exactly-once commits, resume via streaming checkpoint."""

from __future__ import annotations

import os

import pytest

from vectrain_spark.catalog import Catalog
from vectrain_spark.operators.canonicalize import connected_components, edges_from_aliases
from vectrain_spark.operators.linking import build_alias_index
from vectrain_spark.oracle import oracle_pipeline, prf
from vectrain_spark.streaming import start_ingest


@pytest.mark.slow
def test_stream_ingest_matches_batch_oracle(
    spark, small_fixture, aliases_df, golden, tmp_path
):
    pages, _, aliases = small_fixture
    pages_dir = str(tmp_path / "pages_in")
    os.makedirs(pages_dir)
    # land pages as multiple files: each is a micro-batch discovery unit
    src = spark.createDataFrame(pages[["url", "warc_ts", "html", "lang"]])
    src.repartition(6).write.mode("overwrite").parquet(pages_dir)

    index = build_alias_index(aliases)
    mapping = connected_components(edges_from_aliases(aliases_df))
    out = str(tmp_path / "warehouse")
    q = start_ingest(
        spark,
        pages_dir,
        out,
        index,
        mapping,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    q.awaitTermination(300)

    cat = Catalog(out)
    got = set(
        map(
            tuple,
            cat.read(spark, "triples")
            .select("subj_canon", "pred", "obj_canon")
            .distinct()
            .toPandas()
            .values,
        )
    )
    want = set(
        map(
            tuple,
            golden["canonical_triples"][["subj_canon", "pred", "obj_canon"]].values,
        )
    )
    p, r = prf(got, want)
    assert p == 1.0 and r == 1.0
    # multiple micro-batches actually ran
    batches = {s["meta"]["stream_batch"] for s in cat.snapshots("triples")}
    assert len(batches) >= 2
    # quarantine captured the planted bad pages
    assert cat.read(spark, "quarantine").count() > 0

    # restart on the same checkpoint: no new data -> no new snapshots
    before = len(cat.snapshots("triples"))
    q2 = start_ingest(
        spark,
        pages_dir,
        out,
        index,
        mapping,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert len(cat.snapshots("triples")) == before


@pytest.mark.slow
def test_replay_after_crash_between_commits_loses_nothing(
    spark, small_fixture, aliases_df, tmp_path
):
    """Worst-case crash point: after a batch's triples commit, before its
    quarantine commit. Replay must restore the missing quarantine rows
    WITHOUT double-appending the triples (per-table replay guards)."""
    pages, _, aliases = small_fixture
    pages_dir = str(tmp_path / "pages_in")
    os.makedirs(pages_dir)
    src = spark.createDataFrame(pages[["url", "warc_ts", "html", "lang"]])
    src.repartition(4).write.mode("overwrite").parquet(pages_dir)
    index = build_alias_index(aliases)
    mapping = connected_components(edges_from_aliases(aliases_df))

    # uninterrupted reference run
    ref_out = str(tmp_path / "ref")
    q = start_ingest(
        spark, pages_dir, ref_out, index, mapping,
        checkpoint_dir=str(tmp_path / "ref_ckpt"), max_files_per_trigger=2,
    )
    q.awaitTermination(300)
    ref = Catalog(ref_out)
    want_tri = ref.read(spark, "triples").count()
    want_q = set(map(tuple, ref.read(spark, "quarantine").select("url", "error").toPandas().values))
    assert want_q  # fixture plants bad pages

    # crash-injected run: batch 0 commits triples then dies
    out = str(tmp_path / "crash")
    q2 = start_ingest(
        spark, pages_dir, out, index, mapping,
        checkpoint_dir=str(tmp_path / "crash_ckpt"), max_files_per_trigger=2,
        _test_fail_between_commits=0,
    )
    with pytest.raises(Exception):
        q2.awaitTermination(300)
    cat = Catalog(out)
    assert cat.exists("triples") and not cat.exists("quarantine")

    # replay: same checkpoint, no injection
    q3 = start_ingest(
        spark, pages_dir, out, index, mapping,
        checkpoint_dir=str(tmp_path / "crash_ckpt"), max_files_per_trigger=2,
    )
    q3.awaitTermination(300)
    assert cat.read(spark, "triples").count() == want_tri  # no double-append
    got_q = set(map(tuple, cat.read(spark, "quarantine").select("url", "error").toPandas().values))
    assert got_q == want_q  # no lost quarantine rows
