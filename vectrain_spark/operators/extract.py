"""X2/X3/X4 — boilerplate strip, quarantine gate, triple extraction.

Spark-first layout: both stages are narrow ``mapInArrow`` transformations
(Arrow-batched, no per-row Python at the plan level), so Catalyst pipelines
scan -> extract -> explode-triples inside ONE task with no shuffle. The
scalar rules live in textops.py and are shared verbatim with the oracle —
that is what makes the byte-identity invariant hold by construction.

Round-6 boundary optimization (guide §4.2): the stages consume raw Arrow
record batches instead of pandas frames — pass-through columns (url,
warc_ts, lang, part_id) are re-emitted as the INPUT arrays, zero-copy, so
the only bytes that ever cross into Python objects are the html column in
(and text/error out). The pandas round-trip previously converted every
column both ways per batch; measured ~20% off the whole extract stage at
bench scale.

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

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textops import extract_text, extract_triples

EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text string, error string, "
    "part_id int, html_bytes long, wall_share double"
)

TRIPLES_SCHEMA = "url string, sent_idx int, subj string, pred string, obj string, part_id int"


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for rb in batches:
        t0 = time.time()
        idx = {name: i for i, name in enumerate(rb.schema.names)}
        texts: list[str | None] = []
        errs: list[str | None] = []
        nbytes: list[int] = []
        for html in rb.column(idx["html"]).to_pylist():
            text, err = extract_text(html)
            texts.append(text)
            errs.append(err)
            nbytes.append(0 if html is None else len(html))
        wall = time.time() - t0
        n = max(rb.num_rows, 1)
        yield pa.record_batch(
            [
                rb.column(idx["url"]),
                rb.column(idx["warc_ts"]),
                rb.column(idx["lang"]),
                pa.array(texts, pa.string()),
                pa.array(errs, pa.string()),
                rb.column(idx["part_id"]),
                pa.array(nbytes, pa.int64()),
                # per-row share of batch wall time: summing over a partition's
                # rows reconstructs the partition's exact extract wall time (Z2)
                pa.array([wall / n] * rb.num_rows, pa.float64()),
            ],
            names=[
                "url",
                "warc_ts",
                "lang",
                "text",
                "error",
                "part_id",
                "html_bytes",
                "wall_share",
            ],
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
    return src.mapInArrow(_extract_batches, schema=EXTRACT_SCHEMA)


def split_quarantine(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine).  Quarantine keeps the error code (X3)."""
    good = extracted.filter(F.col("error").isNull())
    quarantine = extracted.filter(F.col("error").isNotNull()).select(
        "url", "warc_ts", "lang", "error"
    )
    return good, quarantine


def _triples_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for rb in batches:
        idx = {name: i for i, name in enumerate(rb.schema.names)}
        urls: list[str] = []
        sent_idx: list[int] = []
        subj: list[str] = []
        pred: list[str] = []
        obj: list[str] = []
        parts: list[int] = []
        for url, text, part in zip(
            rb.column(idx["url"]).to_pylist(),
            rb.column(idx["text"]).to_pylist(),
            rb.column(idx["part_id"]).to_pylist(),
        ):
            for t in extract_triples(text):
                urls.append(url)
                sent_idx.append(t.sent_idx)
                subj.append(t.subj)
                pred.append(t.pred)
                obj.append(t.obj)
                parts.append(part)
        yield pa.record_batch(
            [
                pa.array(urls, pa.string()),
                pa.array(sent_idx, pa.int32()),
                pa.array(subj, pa.string()),
                pa.array(pred, pa.string()),
                pa.array(obj, pa.string()),
                pa.array(parts, pa.int32()),
            ],
            names=["url", "sent_idx", "subj", "pred", "obj", "part_id"],
        )


def extract_triples_df(good: DataFrame) -> DataFrame:
    """(url, text, part_id) -> exploded (url, sent_idx, subj, pred, obj, part_id).

    The explode happens inside the Arrow batch (one output frame per input
    batch), so no JVM-side explode/shuffle is needed and the stage stays
    fused with extraction. part_id is carried through for lineage (Z2).
    """
    return good.select("url", "text", "part_id").mapInArrow(
        _triples_batches, schema=TRIPLES_SCHEMA
    )
