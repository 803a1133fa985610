"""Streaming windowed top-k via keyed state + event-time timeout.

The streaming twin of the batch ``events_windowed_topk`` contract
query (rank-over-window → WindowGroupLimit): ranking inside an OPEN
window is not expressible as a built-in streaming aggregate (rank
needs the window's final content), so this is the T6 keyed-state shape
— ``applyInPandasWithState`` keyed by (window start, type), a bounded
top-k heap as state, emission exactly when the event-time watermark
closes the window.  Reference analog: the per-key "largest trades"
cache of ``src/processors/dex_processor.rs`` counter maps, windowed.

Semantics pinned by tests/test_topk_stream.py: once the watermark
passes ``win_start + window_s``, the key emits its top-``k`` rows by
(value DESC, id ASC) — bit-identical to the batch WindowGroupLimit
output for the same input, regardless of arrival order or micro-batch
boundaries (the heap is merge-commutative), and restart-identical from
checkpoint.

State per key is O(k) — two parallel arrays — no matter how many rows
the window sees: the 10^12-row stream keeps top-k per (window, type)
in kilobytes.  The batch rows fold into the heap VECTORIZED (one
pandas concat+sort per micro-batch per key, no per-row Python).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "win_start_s long, event_type string, event_id long, value double, rk int"
)
STATE_SCHEMA = "vals array<double>, ids array<long>"


def _topk_fn(
    key,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    k: int,
    window_s: int,
    value_col: str,
    id_col: str,
):
    win_start_s, etype = int(key[0]), key[1]
    if state.exists:
        vals, ids = list(state.get[0]), list(state.get[1])
    else:
        vals, ids = [], []
    rows = {c: [] for c in ("win_start_s", "event_type", "event_id", "value", "rk")}

    if state.hasTimedOut:
        # watermark passed the window end: rank and emit, exactly once
        for rk, (v, i) in enumerate(
            sorted(zip(vals, ids), key=lambda t: (-t[0], t[1])), 1
        ):
            rows["win_start_s"].append(win_start_s)
            rows["event_type"].append(etype)
            rows["event_id"].append(int(i))
            rows["value"].append(float(v))
            rows["rk"].append(rk)
        state.remove()
        yield pd.DataFrame(rows)
        return

    for pdf in pdfs:
        if len(pdf):
            vals.extend(pdf[value_col].astype("float64").tolist())
            ids.extend(pdf[id_col].astype("int64").tolist())
    # keep only the top-k candidates — merge-commutative, so arrival
    # order and micro-batch boundaries cannot change the final set
    best = sorted(zip(vals, ids), key=lambda t: (-t[0], t[1]))[:k]
    state.update(([v for v, _ in best], [i for _, i in best]))
    deadline_ms = (win_start_s + window_s) * 1000 + 1
    state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
    yield pd.DataFrame(rows)


def windowed_topk_stream(
    events: DataFrame,
    *,
    k: int = 3,
    window_s: int = 600,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Top-``k`` rows by (value DESC, id ASC) per (tumbling window,
    type), emitted when the watermark closes the window.  ``events``
    must already carry ``withWatermark(ts_col, ...)``."""
    win = F.window(ts_col, f"{window_s} seconds").getField("start")
    keyed = events.select(
        F.unix_timestamp(win).alias("win_start_s"),
        F.col(type_col).alias("event_type"),
        F.col(id_col),
        F.col(value_col),
        F.col(ts_col),
    )

    def fn(key, pdfs, state):
        yield from _topk_fn(key, pdfs, state, k, window_s, value_col, id_col)

    return keyed.groupBy("win_start_s", "event_type").applyInPandasWithState(
        fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
