"""Operational surface: stats + failure policy
(SURVEY.md §2.6 K9/K11, §3.4).

- K9 stats: the reference indexes bulk counters (flushed/indexed/
  failed...) on an interval (doIndexStats monstache.go:3510-3527) and
  serves /stats over HTTP (monstache.go:4211-4224). Spark-first: a
  StreamingQueryListener records each micro-batch's progress rows to
  a stats table — queryable like any other.
- K11 failure backoff: the reference's bulk after-callback backs off
  exponentially 1 min → 1 h and pauses the source (monstache.go:
  559-632, 5382-5383); 409 conflicts are ignored (idempotent replays).
  Structured Streaming already retries the failed micro-batch; the
  policy object below adds bounded exponential retry around the sink
  body inside foreachBatch — conflict-like errors are classified
  ignorable by the caller's predicate."""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


class StatsRecorder(StreamingQueryListener):
    """Records per-micro-batch progress (rows, duration, state) as
    JSON lines — the engine's stats index."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def onQueryStarted(self, event) -> None:
        self._write({"event": "started", "id": str(event.id)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._write(
            {
                "event": "progress",
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def _write(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def rows(self) -> list[dict]:
        try:
            with open(self.path) as f:
                return [json.loads(line) for line in f]
        except FileNotFoundError:
            return []


class StatsServer:
    """§3.4 observability sidecar (enable-http-server,
    monstache.go:4188-4285): /healthz, /started, /stats, /instance
    over a stdlib HTTP server on a daemon thread. Backed by a
    StatsRecorder plus a status callback supplying live query state —
    the Spark-side analogue of the reference's statusReqC handshake
    (monstache.go:4225-4271)."""

    def __init__(self, recorder: StatsRecorder, status_fn=None, addr: str = "127.0.0.1", port: int = 0):
        import http.server
        import threading

        recorder_ref = recorder
        status_ref = status_fn or (lambda: {})

        class Handler(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _reply(self, code: int, payload) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
                rows = recorder_ref.rows()
                if self.path == "/healthz":
                    self._reply(200, {"ok": True})
                elif self.path == "/started":
                    started = any(r["event"] == "started" for r in rows)
                    self._reply(200 if started else 503, {"started": started})
                elif self.path == "/stats":
                    progress = [r for r in rows if r["event"] == "progress"]
                    self._reply(
                        200,
                        {
                            "batches": len(progress),
                            "rows_processed": sum(r.get("numInputRows", 0) for r in progress),
                            "last": progress[-1] if progress else None,
                        },
                    )
                elif self.path == "/instance":
                    self._reply(200, {"events": len(rows), **status_ref()})
                else:
                    self._reply(404, {"error": "not found"})

        self._httpd = http.server.ThreadingHTTPServer((addr, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def start(self) -> "StatsServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


@dataclass
class BackoffPolicy:
    """Bounded exponential retry for the sink body (K11).

    Defaults mirror the reference's shape (exponential, capped) but
    with test-friendly magnitudes; production config would use
    base=60s cap=3600s like monstache.go:5382-5383."""

    base_seconds: float = 1.0
    cap_seconds: float = 60.0
    max_retries: int = 5
    fail_fast: bool = False
    attempts: list[float] = field(default_factory=list)

    def run(self, fn, is_ignorable=lambda e: False):
        """Call ``fn()``; on error retry with exponential backoff.
        Ignorable errors (the 409-conflict analogue,
        monstache.go:566-571) succeed immediately."""
        delay = self.base_seconds
        for attempt in range(self.max_retries + 1):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — sink errors are data-dependent
                if is_ignorable(e):
                    return None
                if self.fail_fast or attempt == self.max_retries:
                    raise
                self.attempts.append(delay)
                time.sleep(delay)
                delay = min(delay * 2, self.cap_seconds)
        return None
