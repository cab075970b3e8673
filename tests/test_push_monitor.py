"""Push front-end (backpressure, validation) and the monitor surface."""

from __future__ import annotations

import json
import urllib.request

from vectrain_spark.monitor import job_status, render_metrics, serve_monitor
from vectrain_spark.push import PushGateway


def test_push_validation_and_backpressure(tmp_path):
    gw = PushGateway(str(tmp_path / "pages"), max_queue=5, batch_size=3)
    assert gw.push({"html": b"<p>x</p>"}) == (400, "missing_url")
    assert gw.push({"url": "u0", "html": b""}) == (400, "empty_text")
    assert gw.push({"url": "u0"}) == (400, "empty_text")
    for i in range(5):
        assert gw.push({"url": f"u{i}", "html": b"<p>ok</p>"}) == (202, "accepted")
    # queue full -> 429, nothing lost
    assert gw.push({"url": "u5", "html": b"<p>ok</p>"}) == (429, "queue_full")
    assert gw.pending() == 5
    # drain writes one full batch (3 rows), leaving room again
    assert gw.drain() == 1
    assert gw.pending() == 2
    assert gw.push({"url": "u5", "html": b"<p>ok</p>"}) == (202, "accepted")
    gw.close()  # flush-on-shutdown
    assert gw.pending() == 0
    s = gw.stats()
    assert (s["accepted"], s["rejected"], s["throttled"]) == (6, 3, 1)
    assert s["files_written"] >= 2


def test_pushed_files_feed_the_streaming_schema(spark, small_fixture, tmp_path):
    """Files landed by the gateway batch-read with the exact pages schema
    the streaming source declares, and extraction runs on them."""
    from vectrain_spark.operators.extract import extract_pages
    from vectrain_spark.streaming import PAGES_SCHEMA

    pages, _, _ = small_fixture
    pages_dir = str(tmp_path / "pages")
    gw = PushGateway(pages_dir, batch_size=16)
    n_ok = 0
    for row in pages.head(40).itertuples():
        code, _ = gw.push(
            {"url": row.url, "warc_ts": row.warc_ts, "html": row.html, "lang": row.lang}
        )
        if code == 202:
            n_ok += 1
    gw.close()
    df = spark.read.schema(PAGES_SCHEMA).parquet(pages_dir)
    assert df.count() == n_ok == 40
    ext = extract_pages(df)
    assert ext.filter("text IS NOT NULL OR error IS NOT NULL").count() == 40


def test_monitor_reports_committed_state(spark, pages_df, aliases_df, tmp_path):
    from vectrain_spark.pipeline import PipelineConfig, run_pipeline

    root = str(tmp_path / "wh")
    run_pipeline(spark, pages_df, aliases_df, root, PipelineConfig(n_groups=2))
    status = job_status(root)
    assert status["groups_done"] == [0, 1]
    assert {"triples", "lineage", "canonical_triples"} <= set(status["tables"])
    metrics = render_metrics(status)
    assert "vectrain_groups_done 2" in metrics
    assert 'vectrain_table_snapshots{table="triples"}' in metrics

    server, port = serve_monitor(root)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert json.load(r) == {"status": "ok"}
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/progress", timeout=10) as r:
            assert json.load(r)["groups_done"] == [0, 1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
            assert b"vectrain_groups_done 2" in r.read()
    finally:
        server.shutdown()


def test_graceful_stop_and_resume(spark, pages_df, aliases_df, tmp_path):
    """POST /stop analog: the STOP sentinel halts the run between groups
    (committed groups stay durable, finalize deferred); POST /start clears
    it and the re-submit resumes to the exact uninterrupted result."""
    import urllib.request

    from vectrain_spark.monitor import clear_stop, request_stop, serve_monitor, stop_requested
    from vectrain_spark.pipeline import PipelineConfig, run_pipeline

    root = str(tmp_path / "wh")
    ref_root = str(tmp_path / "wh_ref")
    cfg = PipelineConfig(n_groups=2)

    request_stop(root)
    stats = run_pipeline(spark, pages_df, aliases_df, root, cfg)
    assert stats["stopped_early"] is True
    assert stats["groups"] == [] and stats["total_triples"] is None

    # clear via the HTTP control surface (the reference's POST /api/start)
    server, port = serve_monitor(root)
    try:
        req = urllib.request.Request(f"http://127.0.0.1:{port}/start", method="POST")
        assert urllib.request.urlopen(req).status == 202
    finally:
        server.shutdown()
    assert not stop_requested(root)

    stats2 = run_pipeline(spark, pages_df, aliases_df, root, cfg)
    want = run_pipeline(spark, pages_df, aliases_df, ref_root, cfg)
    assert stats2.get("stopped_early", False) is False
    assert stats2["total_triples"] == want["total_triples"]
    assert stats2["canonical_triples"] == want["canonical_triples"]

    # POST /stop writes the sentinel too
    server, port = serve_monitor(root)
    try:
        req = urllib.request.Request(f"http://127.0.0.1:{port}/stop", method="POST")
        assert urllib.request.urlopen(req).status == 202
    finally:
        server.shutdown()
    assert stop_requested(root)
    clear_stop(root)
