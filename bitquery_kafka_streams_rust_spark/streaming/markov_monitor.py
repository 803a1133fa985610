"""Streaming Markov transition monitor — the online twin of
``operators/funnel.transition_matrix``.

Keyed ``applyInPandasWithState``: per subject, the state is ONE string
(the last observed event type).  Each micro-batch folds the subject's
new, (x, tb)-sorted events against it and emits the batch's DELTA of
(prev_state, state) pair counts — narrow rows, bounded by the batch,
not the history.  The running matrix is then an ordinary aggregation
of the deltas (``transition_totals``), which the exactly-once parquet
sink makes idempotent per epoch: cumulative totals after any prefix of
in-order batches are IDENTICAL to the batch operator over their union
(integer counts — no tolerance, parity-tested).

Why deltas, not running counts: per-subject running matrices are
O(|states|²) state per key and re-emit the whole history every epoch;
the delta form keeps keyed state at ONE string and makes the sink load
proportional to new data.  Same ordered-arrival contract as the
CEP/EWMA/CUSUM/ACF monitors (lag pairing is order-sensitive).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "prev_state string, state string, n long"
STATE_SCHEMA = "last string"


def _markov_update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last = state.get[0] if state.exists else None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(
        ["x", "tb"], ignore_index=True
    )
    counts: dict[tuple[str, str], int] = {}
    for st in pdf["et"]:
        st = str(st)
        if last is not None:
            k = (last, st)
            counts[k] = counts.get(k, 0) + 1
        last = st
    state.update((last,))
    if counts:
        yield pd.DataFrame(
            [(p, c, n) for (p, c), n in counts.items()],
            columns=["prev_state", "state", "n"],
        )


def markov_stream(
    events: DataFrame,
    subject_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Attach the transition monitor; emits the (prev_state, state)
    pair-count DELTA per subject per micro-batch.  ``order_col`` must
    be an epoch-style long (the ordered-batch contract)."""
    src = events.select(
        events[subject_col].cast("string").alias("key"),
        events[order_col].alias("x"),
        events[tiebreak_col].alias("tb"),
        events[state_col].cast("string").alias("et"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _markov_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transition_totals(deltas: DataFrame, *, out_dp: int = 6) -> DataFrame:
    """Fold emitted deltas into the running matrix — the same readout
    shape as the batch operator: (prev_state, state, n, prob)."""
    from pyspark.sql import Window

    g = deltas.groupBy("prev_state", "state").agg(F.sum("n").alias("n"))
    total = F.sum("n").over(Window.partitionBy("prev_state")).cast("double")
    return g.select(
        "prev_state",
        "state",
        "n",
        F.round(F.col("n").cast("double") / total, out_dp).alias("prob"),
    )
