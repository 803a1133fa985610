"""Metrics listener — the Prometheus/health surface (S6/S7/T10).

The reference exports counters/gauges/histograms via a custom registry
+ warp HTTP endpoints (``src/utils/metrics.rs:85-125``,
``src/http_server.rs:41-88``).  Spark already tracks every number the
reference computes by hand; this listener persists the per-epoch
progress (rows/sec, batch duration, state-store size, watermark) as
JSON lines — the machine-readable twin of `/metrics`."""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql.streaming import StreamingQueryListener


class JsonMetricsListener(StreamingQueryListener):
    def __init__(self, out_path: str):
        self.out_path = out_path
        self._lock = threading.Lock()
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    def onQueryStarted(self, event):
        self._write({"event": "started", "id": str(event.id), "name": event.name})

    def onQueryProgress(self, event):
        p = event.progress
        rec = {
            "event": "progress",
            "name": p.name,
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            "eventTime": dict(p.eventTime) if p.eventTime else {},
            "stateOperators": [
                {
                    "numRowsTotal": s.numRowsTotal,
                    "numRowsUpdated": s.numRowsUpdated,
                    "memoryUsedBytes": s.memoryUsedBytes,
                }
                for s in (p.stateOperators or [])
            ],
        }
        self._write(rec)

    def onQueryTerminated(self, event):
        self._write({"event": "terminated", "id": str(event.id)})

    def onQueryIdle(self, event):
        pass

    def _write(self, rec: dict) -> None:
        with self._lock:
            with open(self.out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
