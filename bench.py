#!/usr/bin/env python
"""Benchmark harness.

Default mode (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline is the full KG pipeline (extract -> link -> canonicalize ->
materialize) over a synthetic pages corpus generated DISTRIBUTED at a size
proportional to the scale factor (sf0.1 -> 50,000 pages), plus the
training-data operators over the driver tables. Extra keys report absolute
triples/sec and pages/sec (BASELINE.json "metric").

--scaling mode: re-runs the KG pipeline at local[8] and local[32] in fresh
subprocesses (same input, same shuffle-partitions-per-core ratio) and
writes BENCH/BASELINE.md with throughput at both levels and the N->4N
scaling efficiency E = (thr_32 / thr_8) / 4 (sandbox proxy for the
north_rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_OUT = os.environ.get("SPARK_GRAFT_BENCH_OUT", "/tmp/vectrain_bench_out")

HEADLINE_QUERIES = [
    "kg_canonical_triples",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "text_langid",
    "text_quality",
    "text_tokens",
    "text_fingerprint",
    "sim_knn",
    "sim_ann_ivf",
]


def _sf_of(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def _n_pages(sf: float) -> int:
    return max(500, int(2_000_000 * sf))


def run_kg_pipeline(spark, n_pages: int, out_root: str) -> dict:
    """Synthetic-corpus KG pipeline run; returns timing + triple counts."""
    from pyspark.sql import functions as F

    from vectrain_spark.fixtures import pages_spark
    from vectrain_spark.pipeline import PipelineConfig, run_pipeline

    shutil.rmtree(out_root, ignore_errors=True)
    # bench pages are Common-Crawl-weight (~40 KB html, mostly boilerplate,
    # 40-120 sentences) so measured throughput reflects per-byte compute,
    # not per-page job overhead
    pages, aliases = pages_spark(
        spark, n_pages, min_sent=40, max_sent=120, junk_blocks=30
    )
    # materialize the corpus first so generation cost is excluded from the
    # measured pipeline throughput (the corpus is the "Iceberg pages table")
    corpus_dir = os.path.join(out_root, "_pages")
    pages.write.mode("overwrite").parquet(corpus_dir)
    pages_df = spark.read.parquet(corpus_dir)
    aliases_df = spark.createDataFrame(aliases[["entity_id", "alias"]])

    t0 = time.time()
    stats = run_pipeline(
        spark, pages_df, aliases_df, out_root, PipelineConfig(n_groups=4)
    )
    wall = time.time() - t0
    n_triples = stats["total_triples"]
    return {
        "wall_sec": wall,
        "pages": n_pages,
        "triples": n_triples,
        "canonical_triples": stats["canonical_triples"],
        "triples_per_sec": n_triples / wall if wall > 0 else 0.0,
        "pages_per_sec": n_pages / wall if wall > 0 else 0.0,
    }


def run_default(cores: int = CPUS, kg_only: bool = False) -> dict:
    from vectrain_spark.driver_queries import QUERIES
    from vectrain_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    spark = get_spark(app_name="bench", cores=cores)
    timings: dict[str, float] = {}
    try:
        kg = run_kg_pipeline(spark, _n_pages(sf), BENCH_OUT)
        timings["kg_pipeline"] = round(kg["wall_sec"], 3)
        if not kg_only:
            for name in HEADLINE_QUERIES:
                t0 = time.time()
                QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                timings[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()
    total = round(sum(timings.values()), 3)
    return {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "kg_pages": kg["pages"],
        "kg_triples": kg["triples"],
        "kg_canonical_triples": kg["canonical_triples"],
        "triples_per_sec": round(kg["triples_per_sec"], 1),
        "pages_per_sec": round(kg["pages_per_sec"], 1),
    }


def run_scaling() -> None:
    """local[8] vs local[32] on the identical corpus -> BENCH/BASELINE.md."""
    results = {}
    for cores in (8, 32):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cores)
        env["SPARK_GRAFT_BENCH_OUT"] = f"/tmp/vectrain_bench_scale_{cores}"
        out = subprocess.run(
            [sys.executable, __file__, "--kg-only"],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
    thr8 = results[8]["triples_per_sec"]
    thr32 = results[32]["triples_per_sec"]
    eff = (thr32 / thr8) / 4 if thr8 else 0.0
    os.makedirs("BENCH", exist_ok=True)
    sf = results[32]["sf"]
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH baseline — measured

KG pipeline (extract -> link -> canonicalize -> materialize) over
{results[32]['kg_pages']} synthetic pages (sf{sf} scale, deterministic
corpus, generation excluded from timing; identical input at both levels).

Sandbox proxy for the north_rule's N -> 4N executor criterion:
`local[8]` vs `local[32]` on the same host (32 physical cores), same
shuffle-partitions-per-core ratio.

| parallelism | wall sec | triples | triples/sec | pages/sec |
|---|---|---|---|---|
| local[8]  (N)  | {results[8]['queries']['kg_pipeline']} | {results[8]['kg_triples']} | {thr8} | {results[8]['pages_per_sec']} |
| local[32] (4N) | {results[32]['queries']['kg_pipeline']} | {results[32]['kg_triples']} | {thr32} | {results[32]['pages_per_sec']} |

**Scaling efficiency E = (thr_4N / thr_N) / 4 = {eff:.3f}** (target >= 0.8).

Determinism: both runs emit the same triple count ({results[8]['kg_triples']}
== {results[32]['kg_triples']}: {results[8]['kg_triples'] == results[32]['kg_triples']}).
"""
        )
    print(json.dumps({"eff": eff, "thr8": thr8, "thr32": thr32}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_default(kg_only="--kg-only" in sys.argv)))
