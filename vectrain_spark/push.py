"""Push-ingestion front-end with backpressure — the reference's HTTP source.

Reference analog: vectrain's HTTP source accepts single-entity POSTs into a
bounded queue and a background worker drains the queue into batches for the
pipeline; a full queue returns 429 ``queue_full`` and an empty text body
400 (/root/reference/internal/app/sources/http/client.go:78-112,
handlers/entity.go). The Spark re-expression keeps the exact same
semantics in front of the Structured Streaming file source:

* ``push(page)``  — validate (empty/undecodable text -> 400 ``empty_text``,
  missing url -> 400 ``missing_url``), enqueue into a bounded in-memory
  queue, 429 ``queue_full`` when the drainer is behind;
* ``drain()``     — batch the queue into parquet files landed in the pages
  directory that ``streaming.pages_stream`` watches; each file is one
  micro-batch discovery unit, so Spark-side backpressure
  (``maxFilesPerTrigger``) composes with the queue bound end-to-end;
* ``start_drainer()`` — optional background thread calling drain on an
  interval (the reference's worker goroutine).

Write failures retry under a real :class:`~vectrain_spark.config.
RetryPolicy` (exponential backoff, then re-queue the batch at the FRONT
of the queue so no accepted row is ever dropped — backpressure propagates
to pushers as 429 instead). The reference declares this policy in its
YAML (max_retries/backoff, /root/reference/internal/config/config.go:43-46)
but never wires it to a component; here it is live.

Files are written with pyarrow directly (no Spark session on the hot
path): the gateway is the kind of thin edge process you'd run NEXT to the
cluster, feeding the streaming job through storage.
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from collections import deque
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.parquet as pq

_PAGES_ARROW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("lang", pa.string()),
    ]
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


class PushGateway:
    """Bounded push queue -> parquet micro-batch files.

    Status codes mirror the reference: 202 accepted, 400 rejected
    (validation), 429 queue_full (backpressure).
    """

    def __init__(
        self,
        pages_dir: str,
        max_queue: int = 1000,
        batch_size: int = 300,
        retry_policy=None,
    ):
        from .config import RetryPolicy

        os.makedirs(pages_dir, exist_ok=True)
        self.pages_dir = pages_dir
        self.max_queue = max_queue
        self.batch_size = batch_size
        self.retry_policy = retry_policy or RetryPolicy()
        self._q: deque[dict] = deque()
        self._lock = threading.Lock()
        self._drainer: threading.Thread | None = None
        self._stop = threading.Event()
        self.accepted = 0
        self.rejected = 0
        self.throttled = 0
        self.files_written = 0
        self.write_retries = 0
        self.write_failures = 0

    # -- ingress ---------------------------------------------------------
    def push(self, page: dict) -> tuple[int, str]:
        """Accept one page dict (url, html[, warc_ts, lang])."""
        url = page.get("url")
        if not url:
            with self._lock:
                self.rejected += 1
            return 400, "missing_url"
        html = page.get("html")
        # validate-at-edge contract: any malformed payload is a 400 status,
        # never an exception out of push(). JSON senders naturally produce
        # str html — encode it; anything else non-bytes is rejected.
        if isinstance(html, str):
            html = html.encode("utf-8")
        if html is not None and not isinstance(html, (bytes, bytearray, memoryview)):
            with self._lock:
                self.rejected += 1
            return 400, "invalid_html_type"
        if html is None or len(html) == 0:
            # the reference rejects empty text at the edge
            # (http/client.go:89-97) rather than shipping a junk row
            with self._lock:
                self.rejected += 1
            return 400, "empty_text"
        with self._lock:
            if len(self._q) >= self.max_queue:
                self.throttled += 1
                return 429, "queue_full"
            self._q.append(
                {
                    "url": str(url),
                    "warc_ts": page.get("warc_ts") or _EPOCH,
                    "html": bytes(html),
                    "lang": page.get("lang") or "und",
                }
            )
            self.accepted += 1
        return 202, "accepted"

    def pending(self) -> int:
        with self._lock:
            return len(self._q)

    # -- egress ----------------------------------------------------------
    def _take_batch(self, force: bool) -> list[dict]:
        with self._lock:
            if not self._q:
                return []
            if len(self._q) < self.batch_size and not force:
                return []
            return [self._q.popleft() for _ in range(min(self.batch_size, len(self._q)))]

    def _write_batch(self, batch: list[dict]) -> None:
        table = pa.Table.from_pylist(batch, schema=_PAGES_ARROW_SCHEMA)
        tmp = os.path.join(self.pages_dir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(table, tmp)
        # rename so the streaming file source never sees partial files
        os.rename(tmp, os.path.join(self.pages_dir, f"push-{uuid.uuid4().hex}.parquet"))

    def drain(self, force: bool = False) -> int:
        """Write full batches (all remaining rows when ``force``) as parquet
        files into the watched pages directory. Returns files written.

        A failed write retries under ``retry_policy`` (exponential
        backoff); when retries are exhausted the batch goes BACK to the
        front of the queue — accepted rows are never dropped, the queue
        fills, and pushers see 429 until the sink recovers."""
        n = 0
        while True:
            batch = self._take_batch(force)
            if not batch:
                return n
            try:
                self._write_batch(batch)
            except OSError:
                recovered = False
                for delay in self.retry_policy.delays():
                    with self._lock:
                        self.write_retries += 1
                    if delay > 0:
                        time.sleep(delay)
                    try:
                        self._write_batch(batch)
                        recovered = True
                        break
                    except OSError:
                        continue
                if not recovered:
                    with self._lock:
                        self.write_failures += 1
                        self._q.extendleft(reversed(batch))
                    return n
            with self._lock:
                self.files_written += 1
            n += 1

    # -- background worker -------------------------------------------------
    def start_drainer(self, interval_sec: float = 0.5) -> None:
        if self._drainer is not None:
            return

        def _loop() -> None:
            while not self._stop.wait(interval_sec):
                self.drain()

        self._drainer = threading.Thread(target=_loop, daemon=True)
        self._drainer.start()

    def close(self) -> None:
        """Stop the drainer and flush everything (the reference's
        flush-on-shutdown contract)."""
        self._stop.set()
        if self._drainer is not None:
            self._drainer.join(timeout=5)
            self._drainer = None
        self.drain(force=True)

    def stats(self) -> dict:
        return {
            "accepted": self.accepted,
            "rejected": self.rejected,
            "throttled": self.throttled,
            "pending": self.pending(),
            "files_written": self.files_written,
            "write_retries": self.write_retries,
            "write_failures": self.write_failures,
        }
