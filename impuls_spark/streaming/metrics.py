"""Streaming observability: per-batch progress as JSONL sidecars.

A long-running ingest (``ingest_with_dedup`` / ``stream_to_corpus``)
is an operational system — the questions a user asks at 3 a.m. are
"how many rows per batch", "how long did the batch take", "is the
query falling behind" — and Spark already emits all of it through
``StreamingQueryProgress``. This module attaches a
:class:`StreamingQueryListener` that appends one JSON line per
micro-batch to a local sidecar file, so progress history survives the
session and tails with standard tools (``tail -f``, ``jq``).

Driver-side by design: listener callbacks run on the driver, and the
sidecar is driver-local state (like the checkpoint's own metadata).
On an object-store deployment, point ``path`` at a mounted volume or
swap the appender for the store's append/log client — the listener
shape is unchanged.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class JsonlProgressListener(StreamingQueryListener):
    """Appends one line per progress event:
    ``{query_id, run_id, batch_id, timestamp, num_input_rows,
    duration_ms, sink}`` plus lifecycle markers for start/stop."""

    def __init__(self, path: str) -> None:
        self.path = path
        self._lock = threading.Lock()
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)

    def _append(self, record: dict) -> None:
        with self._lock, open(self.path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(record) + "\n")

    def onQueryStarted(self, event) -> None:
        self._append({
            "event": "started", "query_id": str(event.id),
            "run_id": str(event.runId), "name": event.name,
        })

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._append({
            "event": "progress",
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": p.batchId,
            "timestamp": p.timestamp,
            "num_input_rows": p.numInputRows,
            "duration_ms": dict(p.durationMs or {}),
            "sink": getattr(p.sink, "description", None),
        })

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        self._append({
            "event": "idle", "query_id": str(event.id),
            "run_id": str(event.runId), "timestamp": event.timestamp,
        })

    def onQueryTerminated(self, event) -> None:
        self._append({
            "event": "terminated", "query_id": str(event.id),
            "run_id": str(event.runId),
            "exception": event.exception,
        })


def attach_progress_log(
    spark: SparkSession, path: str
) -> JsonlProgressListener:
    """Attach (and return) a progress logger for every streaming query
    on this session. Detach with :func:`detach_progress_log` when done
    — listeners outlive individual queries by design."""
    listener = JsonlProgressListener(path)
    spark.streams.addListener(listener)
    return listener


def detach_progress_log(
    spark: SparkSession, listener: JsonlProgressListener
) -> None:
    spark.streams.removeListener(listener)


def read_progress_log(path: str) -> "list[dict]":
    """Parse a sidecar back into records (malformed lines skipped —
    the file may be mid-append when read)."""
    out: list[dict] = []
    try:
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except ValueError:
                    continue
    except OSError:
        return out
    return out
