"""Launch-mode contract (north_rule): the job runs via
``spark-submit --py-files dist/job.zip main.py`` in a clean process, and a
re-submit resumes as a no-op."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit():
    from pyspark import find_spark_home

    return os.path.join(find_spark_home._find_spark_home(), "bin", "spark-submit")


@pytest.mark.slow
def test_spark_submit_roundtrip(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    import package

    zip_path = package.build(str(tmp_path / "job.zip"))
    out_dir = str(tmp_path / "warehouse")
    cmd = [
        _spark_submit(),
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(ROOT, "main.py"),
        "--generate", "300",
        "--out", out_dir,
        "--n-groups", "2",
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert r.returncode == 0, r.stderr[-4000:]
    stats = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert stats["groups_run"] == 2
    assert stats["total_triples"] > 0
    assert stats["canonical_triples"] > 0

    # re-submit: resumes and re-processes nothing
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=420, env=env)
    assert r2.returncode == 0, r2.stderr[-4000:]
    stats2 = json.loads([l for l in r2.stdout.splitlines() if l.startswith("{")][-1])
    assert stats2["groups_run"] == 0
    assert stats2["resumed_from"] == [0, 1]
    assert stats2["canonical_triples"] == stats["canonical_triples"]


def test_cli_list_queries_enumerates_registry():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "main.py"), "--list-queries"],
        capture_output=True,
        text=True,
        cwd=ROOT,
        check=True,
    )
    names = out.stdout.split()
    assert "kg_canonical_triples" in names
    assert "olap_pricing_summary" in names
    assert len(names) >= 200


def test_cli_query_runner_writes_parquet(tmp_path):
    out_dir = str(tmp_path / "w")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "main.py"),
            "--query", "corpus_stats",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir,
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=env,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["query"] == "corpus_stats"
    assert rec["rows"] > 0
    assert os.path.isdir(rec["out"])


def test_cli_query_unknown_name_errors(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "main.py"),
            "--query", "no_such_query",
            "--out", str(tmp_path / "w"),
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    assert out.returncode == 2
    assert "unknown query" in out.stderr


def test_cli_query_explain_prints_plan_without_executing(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "main.py"),
            "--query", "olap_pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "w"),
            "--explain",
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        check=True,
    )
    assert "Physical Plan" in out.stdout
    assert "PushedFilters" in out.stdout
    assert not os.path.exists(str(tmp_path / "w" / "queries"))


def test_cli_explain_needs_no_sink(tmp_path):
    """--explain is plan-only: it must work without --out/--config, and
    --query WITHOUT --explain must still demand a sink."""
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "main.py"),
            "--query", "olap_pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
            "--explain",
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=dict(os.environ, SPARK_GRAFT_CPUS="4"),
        check=True,
    )
    assert "Physical Plan" in out.stdout

    bad = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "main.py"),
            "--query", "olap_pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    assert bad.returncode == 2
    assert "needs a sink" in bad.stderr
