"""Streaming session aggregation via keyed state + event-time timeout.

T6 (north rule): session windows implemented with
flatMapGroupsWithState-style keyed state (``applyInPandasWithState``
with ``EventTimeTimeout``), not the built-in ``session_window`` — this
is the extension point for arbitrary CEP (the reference's closest
analogs are its per-key caches and the circuit-breaker state machine,
``src/core/utils/circuit_breaker.rs:17-126``).

Semantics: per key, events within ``gap_s`` of each other merge into a
session ``[min_ts, last_ts + gap)``; a session CLOSES (and emits exactly
one row) when the watermark passes ``last_ts + gap``.  Closed sessions
match the batch ``F.session_window`` aggregation bit-for-bit — tested in
tests/test_sessions.py.

State per key is O(#open sessions): (start, last, count, sum) tuples —
vectorized pandas inside the batch, no per-row Python in the plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, sess_start timestamp, sess_end timestamp, n long, sum_tok long"
)
# open sessions as parallel lists (arbitrary-length state)
STATE_SCHEMA = (
    "starts array<double>, lasts array<double>, counts array<long>, sums array<long>"
)


def _session_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState, gap_s: float):
    (source,) = key
    if state.exists:
        starts, lasts, counts, sums = (list(x) for x in state.get)
    else:
        starts, lasts, counts, sums = [], [], [], []

    for pdf in pdfs:
        ts_series = pd.to_datetime(pd.Series(pdf["ts"]))
        ts_epoch = (ts_series - pd.Timestamp("1970-01-01")) / pd.Timedelta(seconds=1)
        for ts, n_tok in zip(ts_epoch, pdf["n_tok"].astype("int64")):
            # merge into any session whose [start-gap, last+gap] covers ts
            hit = None
            for i in range(len(starts)):
                if starts[i] - gap_s <= ts <= lasts[i] + gap_s:  # boundary ts MERGES (matches F.session_window)
                    hit = i
                    break
            if hit is None:
                starts.append(ts)
                lasts.append(ts)
                counts.append(1)
                sums.append(int(n_tok))
            else:
                starts[hit] = min(starts[hit], ts)
                lasts[hit] = max(lasts[hit], ts)
                counts[hit] += 1
                sums[hit] += int(n_tok)
        # merge overlapping sessions (a late event can bridge two)
        order = sorted(range(len(starts)), key=lambda i: starts[i])
        m_s, m_l, m_c, m_t = [], [], [], []
        for i in order:
            if m_s and starts[i] <= m_l[-1] + gap_s:
                m_l[-1] = max(m_l[-1], lasts[i])
                m_c[-1] += counts[i]
                m_t[-1] += sums[i]
            else:
                m_s.append(starts[i])
                m_l.append(lasts[i])
                m_c.append(counts[i])
                m_t.append(sums[i])
        starts, lasts, counts, sums = m_s, m_l, m_c, m_t

    # close sessions the watermark has passed (last + gap <= wm)
    wm = state.getCurrentWatermarkMs() / 1000.0
    closed = []
    keep = ([], [], [], [])
    for i in range(len(starts)):
        if lasts[i] + gap_s <= wm:
            closed.append(
                (
                    source,
                    pd.Timestamp(starts[i], unit="s"),
                    pd.Timestamp(lasts[i] + gap_s, unit="s"),
                    counts[i],
                    sums[i],
                )
            )
        else:
            keep[0].append(starts[i])
            keep[1].append(lasts[i])
            keep[2].append(counts[i])
            keep[3].append(sums[i])

    if keep[0]:
        state.update(tuple(list(x) for x in keep))
        # wake up when the earliest open session could close
        state.setTimeoutTimestamp(int((min(keep[1]) + gap_s) * 1000))
    else:
        state.remove()

    if closed:
        yield pd.DataFrame(closed, columns=["source", "sess_start", "sess_end", "n", "sum_tok"])


def session_aggregate(events: DataFrame, gap_s: int = 120, watermark_s: int = 300) -> DataFrame:
    """Streaming session rollup per source with event-time timeout.

    Input: streaming frame with (source, ts, n_tok).  Output: one row
    per CLOSED session — append semantics, restart-deterministic."""
    return (
        events.withWatermark("ts", f"{watermark_s} seconds")
        .groupBy("source")
        .applyInPandasWithState(
            lambda key, pdfs, state: _session_fn(key, pdfs, state, float(gap_s)),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
