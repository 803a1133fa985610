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
