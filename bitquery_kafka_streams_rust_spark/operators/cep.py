"""CEP pattern detection — "A followed by B within gap" per key.

The engine's CEP surface (north rule): the reference's closest analog
is threshold alerting (``src/processors/dex_processor.rs:156-164``),
which is stateless; a real pattern needs per-key memory of the last
A-event.  Two implementations with identical semantics:

- ``followed_by`` (batch / oracle form): one window over (key, ts) —
  the last A-event timestamp is carried forward to each row by a
  ``max(case …)`` over the strictly-preceding rows, then B rows within
  ``gap_s`` of their carried A are emitted.  Hash-partitioned window
  (never single-partition); one shuffle on the key, codegen'd carry —
  the same scale shape as operators/asof.py.
- ``followed_by_stream`` (streaming twin): ``applyInPandasWithState``
  keeping ONE float per key (last A-event epoch) — O(keys) state, no
  event buffering.  Within a micro-batch events are sorted by
  (ts, id); across micro-batches arrival must be time-ordered per key
  (the engine's sources deliver ordered batches; bounded disorder
  inside one batch is fine because the whole batch is sorted before
  matching).  Emits matched pairs append-style per batch.

Match rule (both forms): for each B event, the most recent A event of
the same key STRICTLY earlier in (ts, id) order with
``b_ts - a_ts <= gap_s``.  Deterministic under ties via the id
tie-break.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def followed_by(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch form: B events preceded by an A event of the same key
    within ``gap_s`` seconds → (key, a_ts, b_id, b_ts, gap_s_actual)."""
    ev = events.where(F.col(type_col).isin(type_a, type_b))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a_ts = F.max(F.when(F.col(type_col) == type_a, F.col(ts_col))).over(w)
    carried = ev.withColumn("_a_ts", a_ts)
    return (
        carried.where(
            (F.col(type_col) == type_b)
            & F.col("_a_ts").isNotNull()
            & (F.unix_timestamp(ts_col) - F.unix_timestamp("_a_ts") <= gap_s)
        )
        .select(
            F.col(key_col).alias("key"),
            F.col("_a_ts").alias("a_ts"),
            F.col(id_col).alias("b_id"),
            F.col(ts_col).alias("b_ts"),
            (F.unix_timestamp(ts_col) - F.unix_timestamp("_a_ts")).alias("gap_actual_s"),
        )
    )


def not_followed_by(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Negative pattern: A events with NO B event of the same key in
    the ``gap_s`` seconds after them (strictly later in (ts, id) order)
    → (key, a_id, a_ts, next_b_ts nullable).  The dual of
    ``followed_by``: the NEXT B timestamp is carried backward by a
    ``min(case …)`` over the strictly-following rows — same
    hash-partitioned one-window shape.  In streaming this is the
    timer/timeout pattern (emit when the watermark passes a_ts+gap);
    the batch form is the oracle-checkable ground truth."""
    ev = events.where(F.col(type_col).isin(type_a, type_b))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_b = F.min(F.when(F.col(type_col) == type_b, F.col(ts_col))).over(w)
    carried = ev.withColumn("_b_ts", next_b)
    return carried.where(
        (F.col(type_col) == type_a)
        & (
            F.col("_b_ts").isNull()
            | (F.unix_timestamp("_b_ts") - F.unix_timestamp(ts_col) > gap_s)
        )
    ).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        F.col("_b_ts").alias("next_b_ts"),
    )


_OUT_SCHEMA = "key long, a_ts timestamp, b_id long, b_ts timestamp, gap_actual_s long"
# exact integer microseconds — a float epoch would drift ~1 us at 2024
# timestamps and break bit-parity with the batch form's carried a_ts
_STATE_SCHEMA = "last_a_us long"


def _match(key, pdfs: Iterator[pd.DataFrame], state, type_a, type_b, gap_s):
    last_a_us = state.get[0] if state.exists else None
    chunks = [p for p in pdfs if len(p)]
    rows = {"key": [], "a_ts": [], "b_id": [], "b_ts": [], "gap_actual_s": []}
    if chunks:
        # sort the WHOLE batch, not per chunk (chunk boundaries would
        # break the strictly-preceding order — same pitfall as
        # streaming/state.py's session counter)
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        pdf = pdf.reset_index(drop=True)
        # normalize to int64 MICROSECONDS regardless of the incoming
        # datetime64 resolution (ns under pandas<2-style conversion)
        ts_us = (
            pd.to_datetime(pd.Series(pdf["ts"].values))
            .astype("datetime64[us]")
            .astype("int64")
        )
        is_a = pd.Series((pdf["event_type"] == type_a).values)
        # carried last-A per row: A rows' stamps forward-filled, shifted
        # one row so the match is STRICTLY preceding, seeded with state
        a_us = ts_us.where(is_a).ffill().shift(1)
        if last_a_us is not None:
            a_us = a_us.fillna(float(last_a_us))
        is_b = pd.Series((pdf["event_type"] == type_b).values)
        # whole-second gap via floor division — mirrors the batch
        # form's unix_timestamp() flooring exactly
        ok = is_b & a_us.notna()
        for pos in ok[ok].index:
            a = int(a_us.iloc[pos])
            gap = ts_us.iloc[pos] // 10**6 - a // 10**6
            # 0 <= gap: a straggler B older than the carried A (cross-
            # batch disorder, outside the documented in-order contract)
            # must not emit a pair the strictly-preceding batch window
            # could never produce — degrade gracefully instead
            if 0 <= gap <= gap_s:
                rows["key"].append(key[0])
                rows["a_ts"].append(pd.Timestamp(a, unit="us"))
                rows["b_id"].append(int(pdf["event_id"].iloc[pos]))
                rows["b_ts"].append(pdf["ts"].iloc[pos])
                rows["gap_actual_s"].append(int(gap))
        if is_a.any():
            last_a_us = int(ts_us[is_a].iloc[-1])
    state.update((last_a_us,))
    yield pd.DataFrame(rows)


def followed_by_stream(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming twin: one float of state per key (last A epoch)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(key_col).applyInPandasWithState(
        lambda key, pdfs, state: _match(key, pdfs, state, type_a, type_b, gap_s),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
