"""Streaming SCD type-2 maintenance — dimension history as keyed state.

The batch builder (``operators/cdc.scd2_build``) has a continuous
twin: observations arrive as a keyed stream, per-key state holds the
OPEN validity run (current attribute value, its effective_from, the
run ordinal), and each micro-batch emits the runs that CLOSED this
batch — an append-only dimension-history changelog (the warehouse
pattern: closed runs are immutable facts; the open run lives in state
until a change closes it).

Ordering contract (the CEP doctrine, not the upsert one): a run
boundary is "the attribute CHANGED relative to the previous
observation", which is inherently order-sensitive — deliveries must be
event-time ordered per key across batches (watermark-compliant
streams; rows within a batch are sorted here).  Contrast
``streaming/upsert.py`` whose latest-wins fold is commutative and
needs no such contract.

Parity (pinned by test): for compliant delivery, the union of emitted
closed runs equals the batch builder's ``is_current = false`` rows
bit-for-bit; the state holds exactly the batch builder's
``is_current = true`` rows.

Scale shape: state is O(1) per key (one attr + two longs); emission is
churn-sized (a key whose attribute didn't change emits nothing);
per-batch work is pandas over Arrow batches, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "k long, attr string, effective_from_s long, effective_to_s long, version int"
STATE_SCHEMA = "attr string, from_s long, version int"

_NULL = "\x00<null>"  # state-encodable stand-in: GroupState tuples round-trip
# None ambiguously vs absent — encode SQL NULL attrs explicitly


def _enc(v) -> str:
    return _NULL if v is None or (isinstance(v, float) and pd.isna(v)) else str(v)


def _dec(v: str):
    return None if v == _NULL else v


def _scd2(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts_s", "op_id"])
    if state.exists:
        cur_attr, cur_from, version = state.get
    else:
        cur_attr, cur_from, version = None, None, 0
    closed: list[tuple] = []
    for row in pdf.itertuples(index=False):
        attr = _enc(row.attr)
        if version == 0:
            cur_attr, cur_from, version = attr, int(row.ts_s), 1
        elif attr != cur_attr:
            closed.append((_dec(cur_attr), cur_from, int(row.ts_s), version))
            cur_attr, cur_from, version = attr, int(row.ts_s), version + 1
    state.update((cur_attr, cur_from, version))
    if closed:
        yield pd.DataFrame(
            {
                "k": [key[0]] * len(closed),
                "attr": [c[0] for c in closed],
                "effective_from_s": [c[1] for c in closed],
                "effective_to_s": [c[2] for c in closed],
                "version": [c[3] for c in closed],
            }
        )


def scd2_stream(
    obs: DataFrame,
    *,
    key_col: str = "k",
    ts_col: str = "ts_s",
    id_col: str = "op_id",
    attr_col: str = "attr",
) -> DataFrame:
    """Append-only stream of CLOSED SCD2 runs over an observation
    stream.  Input columns are renamed to the canonical (k, ts_s,
    op_id, attr) — key integral, ``ts_s`` epoch seconds, one tracked
    attribute (pack a composite into ``attr`` upstream for multi-column
    tracking, mirroring scd2_build's null-safe OR fold)."""
    canon = obs.selectExpr(
        f"{key_col} AS k",
        f"{ts_col} AS ts_s",
        f"{id_col} AS op_id",
        f"{attr_col} AS attr",
    )
    return canon.groupBy("k").applyInPandasWithState(
        _scd2,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
