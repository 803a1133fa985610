"""Streaming CUSUM level-shift monitor — the online twin of
``operators/drift.cusum_changepoint(target=...)``.

Keyed ``applyInPandasWithState``: per key, carry the two one-sided
CUSUM statistics plus the alarm bookkeeping as NINE LONGS and fold
each arriving value through Page's recursion
``s_hi = max(0, s_hi + e - kq)`` / ``s_lo = max(0, s_lo - e - kq)``
against the FIXED target level — the sequential upgrade of the
reference's static per-event thresholds
(``src/processors/dex_processor.rs:156-164``): instead of "this event
exceeded X", the monitor says "this key's level has SHIFTED", with
Page-optimal detection delay.

Bit-exact parity with the batch operator is a design invariant, not
an aspiration: values quantize to the same integer grid the batch
side uses (``_round_half_up(v*scale, 0)`` == ``F.round`` == DuckDB
``round``), the recursion runs in exact Python ints (== the batch
closed form ``P_i - min(0, min_{j<=i} P_j)`` in exact longs), and the
readout divides/rounds identically — so after any prefix of batches
the emitted row per key equals ``cusum_changepoint(target=...)`` over
the union of those batches, ``==``, no tolerance (pinned by the
parity + restart tests).  Requires per-key in-event-time-order
arrival (the repo's ordered-batch stream contract, same as the CEP
and EWMA monitors).

State is O(1) per key — nine longs — regardless of stream length; the
per-batch emit is ONE summary row per key that saw data, so the sink
receives a key-cardinality-bounded readout per epoch, not the stream.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import _round_half_up

OUTPUT_SCHEMA = (
    "key string, n long, n_alarm_hi long, n_alarm_lo long, "
    "first_alarm_hi_x long, first_alarm_lo_x long, "
    "max_cusum_hi double, max_cusum_lo double"
)
STATE_SCHEMA = (
    "sh long, sl long, n long, nhi long, nlo long, "
    "fhi long, flo long, mh long, ml long"
)


def _cusum_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    tq: int,
    kq: int,
    hq: int,
    scale: int,
    out_dp: int,
) -> Iterator[pd.DataFrame]:
    (key_val,) = key
    sh, sl, n, nhi, nlo, fhi, flo, mh, ml = (
        state.get if state.exists else (0, 0, 0, 0, 0, -1, -1, 0, 0)
    )
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True)
    # a group's micro-batch may span Arrow chunks in shuffle order; the
    # recursion is order-sensitive, so sort the WHOLE batch (x, tb)
    pdf = pdf.sort_values(["x", "tb"], ignore_index=True)
    for x, v in zip(pdf["x"], pdf["v"]):
        # same grid as the batch side: F.round(v*scale, 0) is HALF_UP
        e = int(_round_half_up(float(v) * scale, 0)) - tq
        sh = max(0, sh + e - kq)
        sl = max(0, sl - e - kq)
        mh, ml = max(mh, sh), max(ml, sl)
        n += 1
        if sh > hq:
            nhi += 1
            if fhi < 0:
                fhi = int(x)
        if sl > hq:
            nlo += 1
            if flo < 0:
                flo = int(x)
    state.update((sh, sl, n, nhi, nlo, fhi, flo, mh, ml))
    yield pd.DataFrame(
        [
            (
                str(key_val),
                n,
                nhi,
                nlo,
                fhi,
                flo,
                _round_half_up(mh / float(scale), out_dp),
                _round_half_up(ml / float(scale), out_dp),
            )
        ],
        columns=[
            "key",
            "n",
            "n_alarm_hi",
            "n_alarm_lo",
            "first_alarm_hi_x",
            "first_alarm_lo_x",
            "max_cusum_hi",
            "max_cusum_lo",
        ],
    )


def cusum_stream(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str,
    *,
    target: float,
    k: float = 0.25,
    h: float = 2.0,
    scale: int = 1000,
    out_dp: int = 6,
) -> DataFrame:
    """Attach the CUSUM monitor to a (streaming or batch-testable)
    frame; emits one ``(key, n, alarm counts, first-alarm order
    values, max statistics)`` summary row per key per micro-batch —
    identical to ``cusum_changepoint(target=...)`` over everything
    seen so far.  ``order_col`` must be an epoch-style long (the batch
    twin's -1 no-alarm sentinel contract)."""
    tq = round(float(target) * scale)
    kq = round(k * scale)
    hq = round(h * scale)
    src = events.select(
        events[key_col].cast("string").alias("key"),
        events[order_col].alias("x"),
        events[tiebreak_col].alias("tb"),
        events[value_col].cast("double").alias("v"),
    )
    return src.groupBy("key").applyInPandasWithState(
        lambda key, pdfs, state: _cusum_update(
            key, pdfs, state, tq, kq, hq, scale, out_dp
        ),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
