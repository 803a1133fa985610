"""Health/readiness endpoints (streaming/health.py): live state through
the degraded → healthy → degraded lifecycle, metrics passthrough."""

from __future__ import annotations

import json
import urllib.request

from bitquery_kafka_streams_rust_spark.streaming.health import HealthServer


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_endpoints_lifecycle(spark, tmp_path):
    srv = HealthServer(spark)
    port = srv.start()
    try:
        # no active pipeline: alive + degraded, NOT ready
        code, body = _get(port, "/health")
        assert code == 200 and body["status"] == "degraded"
        assert _get(port, "/ready")[0] == 503
        assert _get(port, "/live") == (200, {"alive": True})
        code, body = _get(port, "/version")
        assert code == 200 and body["spark"] == spark.version

        # start a pipeline: healthy + ready; /metrics carries progress
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 10)
            .load()
            .writeStream.format("memory")
            .queryName("health_probe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            code, body = _get(port, "/health")
            assert code == 200 and body["status"] == "healthy"
            assert any(a["name"] == "health_probe" for a in body["active"])
            assert _get(port, "/ready") == (200, {"ready": True})
            code, body = _get(port, "/metrics")
            assert code == 200 and "health_probe" in body["queries"]
        finally:
            q.stop()
        # stream stopped: degraded again, not ready, still alive
        code, body = _get(port, "/health")
        assert code == 200 and body["status"] == "degraded"
        assert _get(port, "/ready")[0] == 503
        assert _get(port, "/live")[0] == 200
        assert _get(port, "/nope")[0] == 404
    finally:
        srv.stop()
