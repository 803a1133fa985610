"""Streaming materialized upsert view — CDC compaction as keyed state.

The batch fold (``operators/cdc.compact_log``) has a continuous twin:
the upsert/delete log arrives as a stream (the reference's consumer
emits exactly such a keyed event stream, ``src/consumer.rs:213-230``),
per-key state holds the CURRENT winner (latest op by the (ts, op_id)
total order) plus the running op count, and each micro-batch emits the
keys whose view row changed this batch — a CHANGELOG of the
materialized view (the Kafka-Streams KTable / Iceberg MERGE-target
pattern).  Downstream applies the changelog latest-wins (``n_ops``
strictly increases per key, so "latest" is ``max_by(n_ops)``) and
drops keys whose current op is the delete tombstone.

Unlike the CEP twins, latest-wins is ORDER-INSENSITIVE: max over a
total order is commutative/associative, so the final view is identical
for any batch arrival order — no watermark, no in-order contract, and
out-of-order replays converge (pinned by test).  Emission is
changelog-sized: a key untouched by a batch emits nothing, so sink
volume tracks churn, not keyspace.

State is O(1) per key (one winner tuple + a count); per-batch work is
pandas over Arrow batches, no per-row Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "k long, ts_s long, op_id long, op string, value double, n_ops long"
STATE_SCHEMA = "ts_s long, op_id long, op string, value double, n_ops long"


def _upsert(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    cur = state.get if state.exists else None  # (ts_s, op_id, op, value, n_ops)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True)
    n_ops = (cur[4] if cur else 0) + len(pdf)
    # batch winner: max by the (ts_s, op_id) total order — commutative
    # across batches, so arrival order never matters
    wb = pdf.sort_values(["ts_s", "op_id"]).iloc[-1]
    if cur is None or (int(wb["ts_s"]), int(wb["op_id"])) > (cur[0], cur[1]):
        winner = (int(wb["ts_s"]), int(wb["op_id"]), str(wb["op"]), float(wb["value"]))
    else:
        winner = (cur[0], cur[1], cur[2], cur[3])
    state.update((*winner, n_ops))
    yield pd.DataFrame(
        {
            "k": [key[0]],
            "ts_s": [winner[0]],
            "op_id": [winner[1]],
            "op": [winner[2]],
            "value": [winner[3]],
            "n_ops": [n_ops],
        }
    )


def compact_log_stream(
    log: DataFrame,
    *,
    key_col: str = "k",
    ts_col: str = "ts_s",
    id_col: str = "op_id",
    op_col: str = "op",
    value_col: str = "value",
) -> DataFrame:
    """Changelog stream of the latest-wins view over a CDC log stream.

    Input columns are renamed to the canonical (k, ts_s, op_id, op,
    value) — key and op id are integral, ``ts_s`` epoch seconds; pack a
    wider payload into ``value_col`` upstream or extend the schemas.
    Emits one row per (changed key, micro-batch); the current snapshot
    is ``max_by(struct(...), n_ops)`` per key minus delete tombstones,
    bit-equal to batch ``cdc.compact_log`` over the same log.
    """
    canon = log.select(
        F.col(key_col).cast("long").alias("k"),
        F.col(ts_col).cast("long").alias("ts_s"),
        F.col(id_col).cast("long").alias("op_id"),
        F.col(op_col).alias("op"),
        F.col(value_col).cast("double").alias("value"),
    )
    return canon.groupBy("k").applyInPandasWithState(
        _upsert,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def apply_changelog(changelog: DataFrame, *, delete_op: str = "D") -> DataFrame:
    """Materialize the current snapshot from an emitted changelog
    (batch frame): latest emission per key wins (``n_ops`` strictly
    increases per key per emission), delete tombstones drop the key.
    Same one-aggregate shape as ``cdc.compact_log``."""
    latest = changelog.groupBy("k").agg(
        F.max_by(
            F.struct("ts_s", "op_id", "op", "value", "n_ops"), F.col("n_ops")
        ).alias("_last")
    )
    return (
        latest.select("k", "_last.*")
        .where(F.col("op") != F.lit(delete_op))
        .drop("op")
    )
