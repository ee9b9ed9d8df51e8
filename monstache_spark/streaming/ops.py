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
