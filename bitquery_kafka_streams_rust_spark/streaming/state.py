"""Keyed arbitrary state (CEP) — ``applyInPandasWithState``.

T6: the reference's per-key mutable state (dedup sets, atomic counters,
circuit-breaker state machine ``src/core/utils/circuit_breaker.rs:17-126``)
generalizes to a keyed state operator.  Per the north rule the state key
is ``(source, hash-bucket(doc_id))`` so one hot source spreads over
NBUCKETS state partitions (the skew defusal of operators/skew.py applied
to *streaming state*).

The operator implemented here is a CEP-style **per-key running tracker**:
for each (source, bucket) it maintains {seen count, token sum, distinct
burst sessions}, where a new "session" opens when an event arrives more
than ``gap_s`` after the previous one (session-window semantics with
explicit state, the flatMapGroupsWithState analog of T5's session
window).  Emits one row per key per micro-batch with the updated
snapshot — the streaming twin of the reference's every-N-events stats
emission (A3, ``dex_processor.rs:109-117``).

All per-batch work is pandas on Arrow batches — no per-row Python in
the plan; the state tuple is O(1) per key.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "source string, bucket int, n_seen long, sum_tok long, n_sessions long, last_ts timestamp"
)
STATE_SCHEMA = "n_seen long, sum_tok long, n_sessions long, last_ts_epoch double"


def _track(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_s: float = 300.0,
) -> Iterator[pd.DataFrame]:
    source, bucket = key
    if state.exists:
        n_seen, sum_tok, n_sessions, last_epoch = state.get
    else:
        n_seen, sum_tok, n_sessions, last_epoch = 0, 0, 0, None

    # A group's micro-batch may span several Arrow chunks in shuffle
    # order; gap counting is order-sensitive, so sort the WHOLE batch,
    # not each chunk (per-chunk sort over-/under-counts sessions when a
    # boundary falls between chunks).
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        # epoch seconds, unit-independent (arrives as datetime64[us]/ndarray)
        ts = (pd.to_datetime(pd.Series(pdf["ts"])) - pd.Timestamp("1970-01-01")) / pd.Timedelta(seconds=1)
        n_seen += len(pdf)
        sum_tok += int(pdf["n_tok"].sum())
        prev = pd.concat([pd.Series([last_epoch]), ts[:-1]], ignore_index=True)
        gaps = (ts.reset_index(drop=True) - prev) > gap_s
        gaps.iloc[0] = bool(last_epoch is None or gaps.iloc[0])
        n_sessions += int(gaps.sum())
        last_epoch = float(ts.iloc[-1])

    state.update((n_seen, sum_tok, n_sessions, last_epoch))
    yield pd.DataFrame(
        {
            "source": [source],
            "bucket": [bucket],
            "n_seen": [n_seen],
            "sum_tok": [sum_tok],
            "n_sessions": [n_sessions],
            "last_ts": [pd.Timestamp(last_epoch, unit="s") if last_epoch is not None else pd.NaT],
        }
    )


def keyed_tracker(events: DataFrame, n_buckets: int = 8, gap_s: float = 300.0) -> DataFrame:
    """Attach the CEP tracker to a (streaming or batch-testable) event
    frame with columns (doc_id, n_tok, source, ts)."""
    keyed = events.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("source", "bucket").applyInPandasWithState(
        lambda key, pdfs, state: _track(key, pdfs, state, gap_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
