"""Processing-time TTL dedup — transformWithStateInPandas (Spark 4).

The reference's ``MessageDeduplicator`` is a processing-time TTL+LRU
cache (``src/core/utils/deduplicator.rs:50-75``): a duplicate is one
seen within ``time_window`` of wall clock; afterwards the key is
RE-ADMITTED.  ``dropDuplicatesWithinWatermark`` (pipeline.py) gives the
event-time variant; this operator is the literal processing-time
semantics via the new arbitrary-state API: one ValueState per doc_id
with a native state TTL — the store evicts expired keys itself, exactly
the reference's eviction (and spill-backed instead of the reference's
lossy clear-at-capacity, ``src/consumer.rs:243-248``).

Requires (a) the RocksDB state store provider (transformWithState's
backend) — set ``spark.sql.streaming.stateStore.providerClass`` to
``ROCKSDB_PROVIDER`` before starting the query — and (b) the
``protobuf`` python package (the API's state-server protocol), which is
NOT in this sandbox: tests skip when absent, the event-time variant
(``dropDuplicatesWithinWatermark``, pipeline.py) is the sandbox-tested
path, and this module is the processing-time production path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class TtlDedupProcessor(StatefulProcessor):
    """Emit only the first row per key within the TTL window."""

    def __init__(self, ttl_ms: int):
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.seen = handle.getValueState("seen", "seen boolean", ttlDurationMs=self.ttl_ms)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        first = None
        for pdf in rows:
            if len(pdf):
                first = pdf.iloc[:1]
                break  # later chunks are duplicates — skip deserializing them
        if first is None:
            return
        if not self.seen.exists():  # expired or never seen → admit + remember
            self.seen.update((True,))
            yield first

    def close(self) -> None:
        pass


def ttl_dedup_stream_compat(
    events: DataFrame, key: str = "doc_id", ttl_s: int = 300
) -> DataFrame:
    """Same semantics on the older applyInPandasWithState API (works on
    any state store provider and without the protobuf package — the
    sandbox-tested implementation).

    Expiry is LAZY: the state stores the admission processing-time (ms)
    and the check ``now - admitted > ttl`` happens on the key's next
    arrival — exactly the reference lookup (``deduplicator.rs:50-75``
    compares the cached insert timestamp on probe; eviction is cache
    hygiene, not semantics).  No ``ProcessingTimeTimeout`` timers: a
    registered timer forces extra empty micro-batches after the input
    drains, which under ``trigger(availableNow=True)`` kept the query
    re-scheduling batches indefinitely (the round-1 pytest hang).  The
    cost of lazy expiry is that a never-revisited key lingers in the
    store; the production path (``ttl_dedup_stream``, native state TTL
    on RocksDB) evicts those — this compat path trades that for
    termination + portability."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fields = {f.name: f.dataType.simpleString() for f in events.schema.fields}
    out_schema = ", ".join(f"{n} {t}" for n, t in fields.items())
    ttl_ms = ttl_s * 1000

    def fn(key_tuple, pdfs, state):
        first = None
        for pdf in pdfs:
            if len(pdf):
                first = pdf.iloc[:1]
                break  # later chunks are duplicates — skip deserializing them
        if first is None:
            return
        now_ms = state.getCurrentProcessingTimeMs()
        admitted = state.get[0] if state.exists else None
        if admitted is None or now_ms - admitted > ttl_ms:
            state.update((now_ms,))  # (re-)admit; TTL restarts from now
            yield first[list(fields)]

    return events.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="admitted_ms long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ttl_dedup_stream(
    events: DataFrame, key: str = "doc_id", ttl_s: int = 300
) -> DataFrame:
    """Streaming TTL dedup on ``key``.  Caller must run the query with
    the RocksDB state store provider (transformWithState requirement):

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       ttl_dedup.ROCKSDB_PROVIDER)
    """
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in events.schema.fields)
    return events.groupBy(key).transformWithStateInPandas(
        TtlDedupProcessor(ttl_s * 1000),
        outputStructType=schema,
        outputMode="append",
        timeMode="ProcessingTime",
    )
