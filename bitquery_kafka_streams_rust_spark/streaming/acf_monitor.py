"""Streaming lag-k autocorrelation monitor — the online twin of
``operators/timeseries.acf``.

Keyed ``applyInPandasWithState``: per key, carry a RING BUFFER of the
last max(lags) quantized values plus five exact-integer moments per
lag (n, Σy, Σy_lag, Σy², Σy_lag², Σy·y_lag), fold each arriving value
against the buffer, and emit the per-lag Pearson readout after every
micro-batch — "is this key's series still mean-reverting / still
persistent" as a live signal next to the EWMA and CUSUM monitors.

Bit-exact parity with the batch operator is the design invariant:
values quantize on the SAME grid (``_round_half_up(v*scale, 0)`` ==
``F.round``), pair moments accumulate in exact Python ints (== the
batch side's long sums), and the readout replays the identical IEEE
sequence (cast-to-double products, one sqrt, HALF_UP rounding) — so
after any prefix of batches the emitted rows per key equal
``timeseries.acf`` over the union of those batches, ``==``, no
tolerance.  Requires per-key in-event-time-order arrival (the repo's
ordered-batch stream contract shared by the CEP/EWMA/CUSUM monitors);
the tiebreak column pins intra-timestamp order.

State is O(max_lag + 6·len(lags)) longs per key — independent of
stream length.  Per batch each key emits len(lags) readout rows, so
the sink load is key-cardinality-bounded, not stream-bounded.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sampling import _round_half_up

OUTPUT_SCHEMA = "key string, lag int, n_pairs long, acf double"


def _state_schema(lags: tuple[int, ...]) -> str:
    maxlag = max(lags)
    buf = ", ".join(f"b{i} long" for i in range(maxlag))
    mom = ", ".join(
        f"n{k} long, sy{k} long, sl{k} long, syy{k} long, sll{k} long, syl{k} long"
        for k in lags
    )
    return f"filled long, {buf}, {mom}"


def _readout(key_val: str, lags, moments) -> pd.DataFrame:
    rows = []
    for k in lags:
        n, sy, sl, syy, sll, syl = moments[k]
        if n == 0:
            continue  # batch twin emits no row for a pairless (key, lag)
        acf = None
        if n > 1:
            fn = float(n)
            cov = fn * float(syl) - float(sy) * float(sl)
            vy = fn * float(syy) - float(sy) * float(sy)
            vl = fn * float(sll) - float(sl) * float(sl)
            if vy != 0.0 and vl != 0.0:
                acf = _round_half_up(cov / math.sqrt(vy * vl), 6)
        rows.append((key_val, k, n, acf))
    return pd.DataFrame(rows, columns=["key", "lag", "n_pairs", "acf"])


def _acf_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    lags: tuple[int, ...],
    scale: int,
) -> Iterator[pd.DataFrame]:
    (key_val,) = key
    maxlag = max(lags)
    if state.exists:
        vals = list(state.get)
        filled = int(vals[0])
        buf = [int(v) for v in vals[1 : 1 + maxlag]]
        moments = {}
        off = 1 + maxlag
        for j, k in enumerate(lags):
            moments[k] = [int(v) for v in vals[off + 6 * j : off + 6 * j + 6]]
    else:
        filled, buf = 0, [0] * maxlag
        moments = {k: [0, 0, 0, 0, 0, 0] for k in lags}

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True)
    # lag pairing is order-sensitive: sort the WHOLE batch (x, tb)
    pdf = pdf.sort_values(["x", "tb"], ignore_index=True)
    # the batch twin's grid: F.round(v*scale, 0) is HALF_UP
    qv = [int(_round_half_up(float(v) * scale, 0)) for v in pdf["v"]]

    hist = buf[max(0, maxlag - filled) :] if filled < maxlag else buf
    ext = hist + qv
    start = len(hist)
    for k in lags:
        n, sy, sl, syy, sll, syl = moments[k]
        for i in range(max(start, k), len(ext)):
            y, yl = ext[i], ext[i - k]
            n += 1
            sy += y
            sl += yl
            syy += y * y
            sll += yl * yl
            syl += y * yl
        moments[k] = [n, sy, sl, syy, sll, syl]

    filled += len(qv)
    tail = ext[-maxlag:]
    buf = [0] * (maxlag - len(tail)) + tail
    flat = [filled] + buf
    for k in lags:
        flat.extend(moments[k])
    state.update(tuple(flat))
    yield _readout(str(key_val), lags, moments)


def acf_stream(
    events: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str,
    *,
    lags: tuple[int, ...] = (1, 2, 3),
    scale: int = 1000,
) -> DataFrame:
    """Attach the ACF monitor to a (streaming or batch-testable) frame;
    emits one (key, lag, n_pairs, acf) row per key per lag per
    micro-batch — identical to ``timeseries.acf`` over everything seen
    so far.  ``order_col`` must be an epoch-style long."""
    lags = tuple(int(k) for k in lags)
    src = events.select(
        events[key_col].cast("string").alias("key"),
        events[order_col].alias("x"),
        events[tiebreak_col].alias("tb"),
        events[value_col].cast("double").alias("v"),
    )
    return src.groupBy("key").applyInPandasWithState(
        lambda key, pdfs, state: _acf_update(key, pdfs, state, lags, scale),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_state_schema(lags),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
