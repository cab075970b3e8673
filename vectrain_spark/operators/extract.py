"""X2/X3/X4 — boilerplate strip, quarantine gate, triple extraction.

Spark-first layout: both stages are narrow ``mapInPandas`` transformations
(Arrow-batched, no per-row Python at the plan level), so Catalyst pipelines
scan -> extract -> explode-triples inside ONE task with no shuffle. The
scalar rules live in textops.py and are shared verbatim with the oracle —
that is what makes the byte-identity invariant hold by construction.

Reference analog: the fan-out embed map at
/root/reference/internal/app/pipeline/pipeline.go:242-273 (N goroutines,
one synchronous RPC per row). Here parallelism is partitions x cores and
the per-row RPC is replaced by in-executor vectorized compute; row-level
error tagging (pipeline.go:259-264) becomes an ``error`` column, but unlike
the reference (which upserts broken rows with nil vectors,
/root/reference/internal/app/storages/qdrant/store.go:25-38) bad rows are
split into a quarantine table and never reach the sink.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textops import extract_text, extract_triples

EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, error string, "
    "part_id int, html_bytes long, wall_share double"
)

TRIPLES_SCHEMA = "url string, sent_idx int, subj string, pred string, obj string, part_id int"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        t0 = time.time()
        texts: list[str | None] = []
        errs: list[str | None] = []
        nbytes: list[int] = []
        for html in pdf["html"]:
            text, err = extract_text(html)
            texts.append(text)
            errs.append(err)
            nbytes.append(0 if html is None else len(html))
        wall = time.time() - t0
        n = max(len(pdf), 1)
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "warc_ts": pdf["warc_ts"],
                "lang": pdf["lang"],
                "text": pd.Series(texts, dtype="object"),
                "error": pd.Series(errs, dtype="object"),
                "part_id": pdf["part_id"],
                "html_bytes": pd.Series(nbytes, dtype="int64"),
                # per-row share of batch wall time: summing over a partition's
                # rows reconstructs the partition's exact extract wall time (Z2)
                "wall_share": wall / n,
            }
        )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) -> one row per page with
    extracted ``text`` or non-null ``error``.

    ``part_id``/``batch_wall`` feed the per-partition lineage rows (Z2).
    Column pruning: only (url, warc_ts, html, lang) are read — the parquet
    scan never materializes other columns.
    """
    src = pages.select("url", "warc_ts", "html", "lang").withColumn(
        "part_id", F.spark_partition_id()
    )
    return src.mapInPandas(_extract_batches, schema=EXTRACT_SCHEMA)


def split_quarantine(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine).  Quarantine keeps the error code (X3)."""
    good = extracted.filter(F.col("error").isNull())
    quarantine = extracted.filter(F.col("error").isNotNull()).select(
        "url", "warc_ts", "lang", "error"
    )
    return good, quarantine


def _triples_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls: list[str] = []
        sent_idx: list[int] = []
        subj: list[str] = []
        pred: list[str] = []
        obj: list[str] = []
        parts: list[int] = []
        for url, text, part in zip(pdf["url"], pdf["text"], pdf["part_id"]):
            for t in extract_triples(text):
                urls.append(url)
                sent_idx.append(t.sent_idx)
                subj.append(t.subj)
                pred.append(t.pred)
                obj.append(t.obj)
                parts.append(part)
        yield pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "sent_idx": pd.Series(sent_idx, dtype="int32"),
                "subj": pd.Series(subj, dtype="object"),
                "pred": pd.Series(pred, dtype="object"),
                "obj": pd.Series(obj, dtype="object"),
                "part_id": pd.Series(parts, dtype="int32"),
            }
        )


def extract_triples_df(good: DataFrame) -> DataFrame:
    """(url, text, part_id) -> exploded (url, sent_idx, subj, pred, obj, part_id).

    The explode happens inside the Arrow batch (one output frame per input
    batch), so no JVM-side explode/shuffle is needed and the stage stays
    fused with extraction. part_id is carried through for lineage (Z2).
    """
    return good.select("url", "text", "part_id").mapInPandas(
        _triples_batches, schema=TRIPLES_SCHEMA
    )
