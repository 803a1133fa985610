"""Sink retry with exponential backoff — T8.

The reference wraps transient failures in ``RetryStrategy::retry``
(multiplier 2.0, cap 30 s, ≤10% jitter — ``src/core/utils/retry.rs:
73-132``; defaults ``src/config.rs:358-364``).  Spark already retries
TASKS (``spark.task.maxFailures``); what it does not retry is the
driver-side body of ``foreachBatch`` (e.g. a sink commit hitting a
transient object-store error).  This wrapper adds that, preserving
exactly-once: the wrapped sink is idempotent in batchId, so a retried
epoch overwrites its own partial output.

Deterministic backoff (attempt-indexed, no RNG): the reference's jitter
exists to de-correlate many consumers; a Spark job has ONE driver, so
determinism wins (restart-identical behavior, SURVEY §7 hard-part 1).
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame


class RetryExhausted(RuntimeError):
    pass


class CircuitOpen(RuntimeError):
    pass


class CircuitBreakerSink:
    """Closed → Open → HalfOpen state machine around a sink — the
    reference's circuit breaker (``src/core/utils/circuit_breaker.rs:
    17-126``): opens after ``failure_threshold`` consecutive failures,
    fails fast while open, admits one probe call after ``reset_s`` and
    closes again on success.

    Driver-side (one instance per query), so plain attributes suffice —
    no atomics needed, unlike the reference.

    Deployment contract: a raised sink exception FAILS the streaming
    query (Spark submits no further epochs), so consecutive-failure
    accounting across epochs requires the instance to outlive query
    restarts — compose as ``CircuitBreakerSink(RetryingSink(sink))``
    inside a supervisor loop that restarts the query from its
    checkpoint and reuses this object (restart-from-checkpoint replays
    the failed epoch idempotently; see ``ExactlyOnceParquetSink``).
    Within one epoch, ``RetryingSink`` is what absorbs transient
    failures; the breaker's job is to stop a restart-storm against a
    down dependency — exactly the reference's split
    (``retry_handler.rs`` vs ``circuit_breaker.rs``)."""

    CLOSED, OPEN, HALF_OPEN = "closed", "open", "half_open"

    def __init__(
        self,
        sink,
        failure_threshold: int = 3,
        reset_s: float = 30.0,
        clock=time.monotonic,
    ):
        self.sink = sink
        self.failure_threshold = failure_threshold
        self.reset_s = reset_s
        self.clock = clock
        self.state = self.CLOSED
        self.failures = 0
        self.opened_at: float | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.state == self.OPEN:
            if self.clock() - self.opened_at >= self.reset_s:
                self.state = self.HALF_OPEN  # timed reset → single probe
            else:
                raise CircuitOpen(f"circuit open; epoch {batch_id} rejected")
        try:
            self.sink(batch_df, batch_id)
        except Exception:
            self.failures += 1
            if self.state == self.HALF_OPEN or self.failures >= self.failure_threshold:
                self.state = self.OPEN
                self.opened_at = self.clock()
            raise
        else:
            self.state = self.CLOSED
            self.failures = 0


class RetryingSink:
    def __init__(
        self,
        sink: Callable[[DataFrame, int], None],
        max_retries: int = 5,
        initial_delay_s: float = 0.1,
        max_delay_s: float = 30.0,
        multiplier: float = 2.0,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.sink = sink
        self.max_retries = max_retries
        self.initial_delay_s = initial_delay_s
        self.max_delay_s = max_delay_s
        self.multiplier = multiplier
        self.sleep = sleep
        self.attempts: list[int] = []  # per-epoch attempt counts (observability)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        delay = self.initial_delay_s
        last: Exception | None = None
        for attempt in range(1, self.max_retries + 2):
            try:
                self.sink(batch_df, batch_id)
                self.attempts.append(attempt)
                return
            except Exception as e:  # transient sink failure
                last = e
                if attempt > self.max_retries:
                    break
                self.sleep(delay)
                delay = min(delay * self.multiplier, self.max_delay_s)
        self.attempts.append(self.max_retries + 1)
        raise RetryExhausted(
            f"sink failed after {self.max_retries} retries for epoch {batch_id}"
        ) from last
