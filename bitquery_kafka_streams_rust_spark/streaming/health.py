"""Health/readiness/metrics HTTP endpoints (S7/T10).

The reference serves ``/health``, ``/ready``, ``/live``, ``/metrics``
and ``/version`` from a warp HTTP server wired to its health monitor
and metrics registry (``src/http_server.rs:41-88,105-267``):
healthy/degraded both answer 200 on ``/health`` (degraded still serves
traffic), only unhealthy is 503; ``/live`` stays 200 unless unhealthy.

This is the Spark-native twin, stdlib-only (``http.server`` in a daemon
thread — no web framework, nothing to install on a cluster edge node):

- ``/health``  — JSON report; 200 while the SparkContext is alive and
  no streaming query has died with an exception (zero active queries is
  ``degraded`` but still 200, matching the reference), 503 otherwise.
- ``/ready``   — 200 only when at least one streaming query is active
  and exception-free (the k8s readiness gate: don't route work here
  before the pipeline runs).
- ``/live``    — 200 unless the context is stopped or a query died
  (even a degraded service is alive, ``http_server.rs:220-221``).
- ``/metrics`` — per-active-query ``lastProgress`` JSON: Spark already
  tracks every counter the reference computes by hand (rows/sec, batch
  durations, state rows/bytes, watermark).
- ``/version`` — engine + Spark versions.

The server binds once and reads LIVE state per request (no polling
thread, no state of its own); it is driver-local — at cluster scale
each driver exposes its own endpoints, exactly like the reference's
per-process server.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

ENGINE_VERSION = "0.4.0"


def _query_state(spark) -> dict:
    """One live snapshot: active queries + any terminated-by-exception."""
    sc_alive = not spark.sparkContext._jsc.sc().isStopped()
    active, dead = [], []
    if sc_alive:
        for q in spark.streams.active:
            exc = q.exception()
            row = {"name": q.name, "id": str(q.id), "isActive": q.isActive}
            if exc is not None:
                row["exception"] = str(exc.desc) if hasattr(exc, "desc") else str(exc)
                dead.append(row)
            else:
                active.append(row)
    if not sc_alive:
        status = "unhealthy"
    elif dead:
        status = "unhealthy"
    elif not active:
        status = "degraded"  # alive, but no pipeline running yet
    else:
        status = "healthy"
    return {"status": status, "active": active, "failed": dead, "context_alive": sc_alive}


class HealthServer:
    """Start with ``HealthServer(spark).start()`` → returns the bound
    port (pass ``port=0`` for an ephemeral one).  ``stop()`` shuts the
    socket down; the serving thread is a daemon either way."""

    def __init__(self, spark, *, host: str = "127.0.0.1", port: int = 0):
        self.spark = spark
        self.host = host
        self.port = port
        self._httpd: ThreadingHTTPServer | None = None

    def start(self) -> int:
        spark = self.spark

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: health probes are chatty
                pass

            def _send(self, code: int, payload: dict) -> None:
                # default=str: Spark progress dicts carry UUID/timestamp
                # objects — render them as strings rather than 500ing
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (http.server API)
                try:
                    st = _query_state(spark)
                except Exception as e:  # context torn down mid-request
                    self._send(503, {"status": "unhealthy", "error": str(e)})
                    return
                if self.path == "/health":
                    code = 503 if st["status"] == "unhealthy" else 200
                    self._send(code, st)
                elif self.path == "/ready":
                    ready = st["status"] == "healthy"
                    self._send(200 if ready else 503, {"ready": ready})
                elif self.path == "/live":
                    alive = st["status"] != "unhealthy"
                    self._send(200 if alive else 503, {"alive": alive})
                elif self.path == "/metrics":
                    progress = {}
                    if st["context_alive"]:
                        for q in spark.streams.active:
                            lp = q.lastProgress
                            progress[q.name or str(q.id)] = lp if lp else {}
                    self._send(200, {"queries": progress})
                elif self.path == "/version":
                    self._send(
                        200,
                        {"engine": ENGINE_VERSION, "spark": spark.version},
                    )
                else:
                    self._send(404, {"error": "unknown path"})

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_address[1]
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
