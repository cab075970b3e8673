"""KMV sketch, JSONL round-trip fidelity, and crawl-drift unit tests."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from vectrain_spark.operators.ingest import (
    DOCS_JSONL_SCHEMA,
    read_jsonl,
    write_jsonl,
)
from vectrain_spark.operators.sketch import kmv_distinct
from vectrain_spark.operators.webcorpus import crawl_drift


def test_kmv_small_group_is_exact(spark):
    rows = [("a", f"v{i}") for i in range(9)] + [("a", "v0"), ("a", "v1")]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = kmv_distinct(df, "grp", "val", k=16).collect()
    assert len(out) == 1
    assert out[0]["n_hashes"] == 9
    assert out[0]["est_distinct"] == 9  # sketch saw everything -> exact


def test_kmv_estimate_within_error_bound(spark):
    # 5000 distinct values, k=64 -> relative std error ~ 1/sqrt(k-2) ~ 13%
    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("value-"), "id").alias("val")
    )
    out = kmv_distinct(df, "grp", "val", k=64).collect()[0]
    assert out["n_hashes"] == 64
    assert abs(out["est_distinct"] - 5000) / 5000 < 0.5


def test_kmv_plan_uses_window_group_limit(spark):
    """The rn <= k filter must be pushed into a WindowGroupLimit (partial
    per-partition top-k BEFORE the exchange) — this is the sketch's whole
    scale story."""
    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("grp"),
        F.concat(F.lit("v"), "id").alias("val"),
    )
    plan = (
        kmv_distinct(df, "grp", "val")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_kmv_deterministic_across_partitioning(spark):
    df = spark.range(2000).select(
        (F.col("id") % 2).cast("string").alias("grp"),
        F.concat(F.lit("x"), "id").alias("val"),
    )
    a = sorted(map(tuple, kmv_distinct(df.repartition(1), "grp", "val").collect()))
    b = sorted(map(tuple, kmv_distinct(df.repartition(13), "grp", "val").collect()))
    assert a == b


EVIL_TEXTS = [
    'line1\nline2\r\nline3',
    'quote " backslash \\ slash / end',
    'tab\there éü中文 emoji \U0001f600',
    '{"looks": "like json"}',
    "   leading and trailing   ",
    "",
]


def test_jsonl_roundtrip_byte_fidelity(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(EVIL_TEXTS)),
            "text": EVIL_TEXTS,
            "lang": ["en"] * len(EVIL_TEXTS),
            "source": ["web"] * len(EVIL_TEXTS),
            "n_chars": [len(t) for t in EVIL_TEXTS],
        }
    )
    df = spark.createDataFrame(pdf)
    stage = str(tmp_path / "jsonl")
    write_jsonl(df, stage)
    back = read_jsonl(spark, stage, DOCS_JSONL_SCHEMA)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    want = dict(zip(pdf["doc_id"], pdf["text"]))
    # Spark's JSON writer serializes empty strings fine; every byte must
    # survive writer-escape -> reader-unescape
    assert got == want


def test_crawl_drift_statuses(spark):
    t1, t2 = "2024-01-01 00:00:00", "2024-03-01 00:00:00"
    rows = [
        ("u/stable", t1, "same"), ("u/stable", t2, "same"),
        ("u/edited", t1, "old"), ("u/edited", t2, "new"),
        ("u/gone", t1, "x"),
        ("u/fresh", t2, "y"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string").select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"), "text"
    )
    got = {r["url"]: (r["status"], r["n_crawls"]) for r in crawl_drift(df).collect()}
    assert got == {
        "u/stable": ("unchanged", 2),
        "u/edited": ("changed", 2),
        "u/gone": ("removed", 1),
        "u/fresh": ("added", 1),
    }


def test_csv_roundtrip_byte_fidelity(spark, tmp_path):
    from vectrain_spark.operators.ingest import read_csv, write_csv

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(EVIL_TEXTS)),
            "text": EVIL_TEXTS,
            "lang": ["en"] * len(EVIL_TEXTS),
            "source": ["web"] * len(EVIL_TEXTS),
            "n_chars": [len(t) for t in EVIL_TEXTS],
        }
    )
    df = spark.createDataFrame(pdf)
    stage = str(tmp_path / "csv")
    write_csv(df, stage)
    back = read_csv(spark, stage, DOCS_JSONL_SCHEMA)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    # full fidelity incl. embedded newlines/quotes, leading/trailing
    # whitespace (writer-side trimming disabled) and the empty string
    # (sentinel nullValue)
    assert got == dict(zip(pdf["doc_id"], pdf["text"]))


def test_jsonl_malformed_lines_quarantine(spark, tmp_path):
    """PERMISSIVE mode surfaces malformed lines as all-null rows — the
    ingestion analog of the pipeline's quarantine gate (the reference
    400s empty-text pushes; we filter instead of failing the batch)."""
    import os

    from vectrain_spark.operators.ingest import DOCS_JSONL_SCHEMA, read_jsonl

    stage = tmp_path / "jl"
    os.makedirs(stage)
    (stage / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "fine", "lang": "de", "source": "web", "n_chars": 4}\n'
    )
    back = read_jsonl(spark, str(stage), DOCS_JSONL_SCHEMA)
    good = back.filter(F.col("doc_id").isNotNull())
    bad = back.filter(F.col("doc_id").isNull())
    assert good.count() == 2 and bad.count() == 1


def test_hll_estimate_accuracy_and_registers(spark):
    from vectrain_spark.operators.sketch import hll_distinct, hll_registers

    n = 5000
    df = spark.range(n).selectExpr("'g' AS g", "concat('v', id) AS v")
    out = hll_distinct(df, "g", "v").collect()[0]
    # raw HLL with m=64: ~13% std error; accept 3 sigma
    assert abs(out["est_distinct"] - n) < 0.4 * n
    assert out["n_registers"] == 64  # 5000 values fill all 64 buckets
    regs = hll_registers(df, "g", "v").collect()
    assert all(1 <= r["max_rank"] <= 55 for r in regs)


def test_hll_registers_merge_across_corpora(spark):
    from pyspark.sql import functions as F
    from vectrain_spark.operators.sketch import hll_registers

    a = spark.range(0, 400).selectExpr("'g' AS g", "concat('v', id) AS v")
    b = spark.range(200, 600).selectExpr("'g' AS g", "concat('v', id) AS v")
    both = a.unionAll(b)
    merged = (
        hll_registers(a, "g", "v")
        .unionAll(hll_registers(b, "g", "v"))
        .groupBy("g", "bucket")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    direct = hll_registers(both, "g", "v")
    got = {(r["bucket"]): r["max_rank"] for r in merged.collect()}
    want = {(r["bucket"]): r["max_rank"] for r in direct.collect()}
    assert got == want
