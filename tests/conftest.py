from __future__ import annotations

import signal
import sys
import threading

import pytest

sys.path.insert(0, "/root/repo")

from bitquery_kafka_streams_rust_spark.session import get_spark  # noqa: E402

# Per-test watchdog (pytest-timeout is not in the sandbox): a streaming
# query that never drains (e.g. a timer-driven micro-batch spin) must
# fail ONE test, not wedge the whole suite.  SIGALRM interrupts the
# blocking py4j socket read; override per-test with
# @pytest.mark.watchdog_timeout(seconds).
WATCHDOG_DEFAULT_S = 600


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "watchdog_timeout(seconds): per-test wall-clock limit"
    )


@pytest.fixture(autouse=True)
def _watchdog(request):
    if threading.current_thread() is not threading.main_thread():
        yield
        return
    marker = request.node.get_closest_marker("watchdog_timeout")
    limit = int(marker.args[0]) if marker and marker.args else WATCHDOG_DEFAULT_S

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"watchdog: {request.node.nodeid} exceeded {limit}s wall clock"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(limit)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF
