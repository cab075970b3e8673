"""Runtime health / progress / metrics surface.

Reference analog: vectrain exposes /health and config routes over HTTP
(/root/reference/internal/http/routes.go:17-23, handlers/health.go:18-28)
and counts processed messages in Prometheus
(/root/reference/internal/infra/monitoring/prometheus.go:17-32). The Spark
re-expression reads the SAME durable state the pipeline already commits —
the group manifest and the catalog snapshot manifests — so the monitor is a
zero-coupling sidecar: it can run in the driver, in a separate process, or
after a crash, and always reports exactly what has been durably committed.

* ``job_status(out_root)``   -> dict (groups done, per-table snapshot
  counts/last-commit, lineage totals if committed)
* ``render_metrics(status)`` -> Prometheus text exposition format
* ``serve_monitor(out_root)``-> stdlib HTTP server (daemon thread) with
  /health, /progress (JSON), /metrics (Prometheus text)
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .catalog import Catalog


def _stop_path(out_root: str) -> str:
    return os.path.join(out_root, "_checkpoint", "STOP")


def request_stop(out_root: str) -> None:
    """Ask a running pipeline to stop gracefully: it finishes the groups
    already in flight, commits them, and returns with stopped_early=True —
    the run resumes from exactly that point on the next spark-submit
    (the reference's POST /api/stop analog, /root/reference/internal/http/
    routes.go:17-23, made crash-equivalent-safe by the group manifest)."""
    os.makedirs(os.path.dirname(_stop_path(out_root)), exist_ok=True)
    with open(_stop_path(out_root), "w") as f:
        f.write("stop")


def clear_stop(out_root: str) -> None:
    """POST /api/start analog: allow the next run to proceed."""
    try:
        os.remove(_stop_path(out_root))
    except FileNotFoundError:
        pass


def stop_requested(out_root: str) -> bool:
    return os.path.exists(_stop_path(out_root))


def job_status(out_root: str) -> dict:
    """Durable-state snapshot of a (possibly running, possibly crashed)
    pipeline run rooted at ``out_root``."""
    status: dict = {"out_root": out_root, "tables": {}, "groups_done": []}
    ckpt = os.path.join(out_root, "_checkpoint", "groups.json")
    if os.path.exists(ckpt):
        with open(ckpt) as f:
            state = json.load(f)
        status["groups_done"] = sorted(state.get("done", []))
        status["fingerprint"] = state.get("fingerprint")
    cat = Catalog(out_root)
    for table in ("extracted", "triples", "quarantine", "lineage",
                  "canonical_triples", "edges", "adjacency", "entity_canon"):
        if not cat.exists(table):
            continue
        snaps = cat.snapshots(table)
        status["tables"][table] = {
            "snapshots": len(snaps),
            "last_committed_at": snaps[-1]["committed_at"],
            "last_op": snaps[-1]["op"],
        }
    return status


def render_metrics(status: dict) -> str:
    """Prometheus text exposition of the counters the reference tracks
    (processed totals) plus commit progress."""
    lines = [
        "# TYPE vectrain_groups_done gauge",
        f"vectrain_groups_done {len(status['groups_done'])}",
    ]
    for table, info in status["tables"].items():
        lines.append(f'vectrain_table_snapshots{{table="{table}"}} {info["snapshots"]}')
        lines.append(
            f'vectrain_table_last_commit_ts{{table="{table}"}} {info["last_committed_at"]}'
        )
    return "\n".join(lines) + "\n"


def serve_monitor(out_root: str, port: int = 0) -> tuple[ThreadingHTTPServer, int]:
    """Start the monitor HTTP server on a daemon thread; returns
    (server, bound_port). Routes: /health, /progress, /metrics."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API)
            if self.path == "/health":
                body, ctype = b'{"status":"ok"}', "application/json"
            elif self.path == "/progress":
                body = json.dumps(job_status(out_root)).encode()
                ctype = "application/json"
            elif self.path == "/metrics":
                body = render_metrics(job_status(out_root)).encode()
                ctype = "text/plain; version=0.0.4"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (stdlib API)
            if self.path == "/stop":
                request_stop(out_root)
            elif self.path == "/start":
                clear_stop(out_root)
            else:
                self.send_response(404)
                self.end_headers()
                return
            body = b'{"status":"accepted"}'
            self.send_response(202)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence per-request stderr noise
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]
