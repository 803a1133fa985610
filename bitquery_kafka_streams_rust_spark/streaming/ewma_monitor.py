"""Streaming EWMA monitor — the online twin of operators/timeseries.ewma.

Keyed ``applyInPandasWithState``: per key, carry the last
``window - 1`` values and emit one smoothed row per event — the
adaptive-baseline feed an alerting gate compares fresh values against
(the reference's every-N flat means, upgraded to an exponential
smoother that updates per event instead of per epoch).

Bit-exact parity with the batch operator is a design invariant, not an
aspiration: the batch side folds ``acc = (acc + x) / 2`` over a
(ts, id)-ordered bounded frame and divides by ``1 - 2^-m`` — all
dyadic IEEE arithmetic — so this state function replays the SAME fold
in Python (CPython doubles are the same IEEE 64-bit ops) and rounds
with the HALF_UP decimal helper F.round uses, NOT builtin round's
banker's mode (dyadic folds CAN land on exact .5e-9 ties).  Given
per-key in-event-time-order arrival (the repo's ordered-batch stream
contract, same as the CEP operators), streamed rows == batch rows,
value for value — pinned by the parity test.

State is O(window) doubles per key, constant regardless of stream
length.  Per-batch work is pandas over Arrow batches (no per-row
Python in the PLAN; the per-row fold here is over a <=16-element
deque).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import _round_half_up

OUTPUT_SCHEMA = "user_id long, event_id long, value double, ewma double"
STATE_SCHEMA = "vals array<double>"


def _ewma_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, window: int
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    vals: list[float] = list(state.get[0]) if state.exists else []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True)
    # a group's micro-batch may span Arrow chunks in shuffle order; the
    # fold is order-sensitive, so sort the WHOLE batch (ts, event_id)
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    out = []
    for eid, v in zip(pdf["event_id"], pdf["value"]):
        frame = (vals + [float(v)])[-window:]
        acc = 0.0
        for x in frame:
            acc = (acc + x) / 2.0
        m = len(frame)
        out.append(
            (int(user_id), int(eid), float(v),
             _round_half_up(acc / (1.0 - 2.0 ** -m), 9))
        )
        vals = (vals + [float(v)])[-(window - 1):]
    state.update((vals,))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "value", "ewma"])


def ewma_stream(events: DataFrame, *, window: int = 16) -> DataFrame:
    """Attach the EWMA monitor to a (streaming or batch-testable) event
    frame with columns (event_id, ts, user_id, value)."""
    return events.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _ewma_update(key, pdfs, state, window),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
