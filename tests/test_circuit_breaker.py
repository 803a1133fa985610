"""Circuit breaker state machine (circuit_breaker.rs:128-219 parity)."""

from __future__ import annotations

import pytest

from bitquery_kafka_streams_rust_spark.streaming.retry import CircuitBreakerSink, CircuitOpen


class Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def mk(fail_first_n, clock, threshold=3, reset_s=30.0):
    state = {"n": 0}

    def sink(df, bid):
        state["n"] += 1
        if state["n"] <= fail_first_n:
            raise IOError("down")

    return CircuitBreakerSink(sink, failure_threshold=threshold, reset_s=reset_s, clock=clock), state


def test_opens_at_threshold():
    clock = Clock()
    cb, _ = mk(fail_first_n=99, clock=clock)
    for _ in range(3):
        with pytest.raises(IOError):
            cb(None, 0)
    assert cb.state == cb.OPEN
    with pytest.raises(CircuitOpen):  # fail fast, sink NOT called
        cb(None, 1)


def test_timed_reset_half_open_then_close():
    clock = Clock()
    cb, state = mk(fail_first_n=3, clock=clock)
    for _ in range(3):
        with pytest.raises(IOError):
            cb(None, 0)
    assert cb.state == cb.OPEN
    clock.t = 31.0           # past reset window → half-open probe allowed
    cb(None, 1)              # probe succeeds (4th call works)
    assert cb.state == cb.CLOSED and cb.failures == 0
    cb(None, 2)              # normal operation resumes
    assert state["n"] == 5


def test_half_open_failure_reopens():
    clock = Clock()
    cb, _ = mk(fail_first_n=99, clock=clock)
    for _ in range(3):
        with pytest.raises(IOError):
            cb(None, 0)
    clock.t = 31.0
    with pytest.raises(IOError):   # half-open probe fails
        cb(None, 1)
    assert cb.state == cb.OPEN
    assert cb.opened_at == 31.0    # window restarted
    with pytest.raises(CircuitOpen):
        cb(None, 2)


def test_success_resets_failure_count():
    clock = Clock()
    calls = {"n": 0}

    def sink(df, bid):
        calls["n"] += 1
        if calls["n"] in (1, 2, 4, 5):  # never 3 consecutive
            raise IOError("flaky")

    cb = CircuitBreakerSink(sink, failure_threshold=3, clock=clock)
    for i, should_fail in enumerate([True, True, False, True, True, False]):
        if should_fail:
            with pytest.raises(IOError):
                cb(None, i)
        else:
            cb(None, i)
    assert cb.state == cb.CLOSED  # consecutive count reset by successes
