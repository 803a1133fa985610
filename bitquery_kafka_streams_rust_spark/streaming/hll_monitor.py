"""Streaming HyperLogLog distinct-count monitor.

The online twin of ``operators/sketches.hll_distinct``: keys arrive on
a stream and the monitor maintains the per-(group, bucket) MAX-merged
HLL registers as streaming aggregation state, emitting after every
micro-batch the per-group distinct-count estimate over everything seen
so far — cardinality-over-time for a 10^12-key stream in O(groups ×
2^p) state.

Why this is exactly batch-equivalent (not approximately): an HLL
register is a MAX over per-key (bucket, rho) rows, and max is
order- and batching-independent — streaming incremental aggregation is
just another merge order.  The register state after N micro-batches is
BIT-IDENTICAL to the batch operator's registers over the union of
those batches, and the estimate is a deterministic function of the
registers (integer harmonic sum, one ln() branch), so the emitted
estimates match the batch twin exactly (parity-tested, ==, no
tolerance) — the same integer-grid argument as
``streaming/drift_monitor.py``.

Scale shape: state is (groups × 2^p) small ints — bounded by the
sketch, not the stream; a hot key updates ONE register via the partial
max map-side.  Each epoch's emission is a register-cardinality
aggregate writing one row per group, idempotent per batch id
(drift/cardinality history, restart-resumable from checkpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.sketches import hll_estimate, hll_registers
from .sink import ExactlyOnceParquetSink


def build_hll_register_stream(
    stream: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    *,
    p: int = 8,
) -> DataFrame:
    """Streaming (*group_cols, bucket, reg) max-merged registers: the
    map-side (bucket, rho) projection feeding a streaming groupBy —
    Spark keeps the per-(group, bucket) max as state and re-emits
    updated groups each batch (use ``outputMode('complete')``: the
    state IS the sketch and is metadata-sized)."""
    return hll_registers(stream, key_col, group_cols, p=p)


class HLLDistinctSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, fold the complete-mode register
    snapshot into per-group estimates and write them idempotently under
    ``batch_id=<epoch>`` — the cardinality-over-time history."""

    def __init__(
        self,
        out_dir: str,
        *,
        group_cols: list[str] | None = None,
        p: int = 8,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.group_cols = list(group_cols or [])
        self.p = p

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        est = hll_estimate(batch_df, self.group_cols, p=self.p)
        super().__call__(est, batch_id)
