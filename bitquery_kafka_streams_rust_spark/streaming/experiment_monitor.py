"""Streaming A/B experiment monitor.

The online twin of ``operators/aggregates.ab_test``: fact rows arrive
on a stream, the monitor maintains per-(cell, arm) INTEGER-grid moments
(n, s_q, ss_q) as streaming aggregation state, and after every
micro-batch emits the Welch-z readout of everything accumulated so far
— the "is the experiment significant yet" curve, one readout row per
cell per epoch.

Why the readout is exactly batch-equivalent (not approximately): the
moments quantize values to an integer grid map-side
(``aggregates.ab_moments``), so the running sums are order-independent
long arithmetic — streaming incremental aggregation is just another
summation order.  State after N batches is BIT-IDENTICAL to
``ab_moments`` over the union of those batches, and
``aggregates.ab_readout`` runs the same rounded IEEE projection as the
batch readout, so the emitted rows match it exactly (parity-tested,
``==``, no tolerance).

Scale shape: state is 2 rows of three longs per experiment cell —
bounded by the schema, not the stream.  Each epoch's readout pivots
that metadata-sized state (complete-mode output) and writes one row
per cell, idempotent per batch id — the significance-over-time history
the reference's threshold alerts (``src/processors/dex_processor.rs:
156-164``) would need to call an experiment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.aggregates import ab_moments, ab_readout
from .sink import ExactlyOnceParquetSink


def build_ab_moment_stream(
    stream: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    *,
    frac_a: float = 0.5,
    seed: int = 0,
    stage: int = 11,
    scale: int = 1_000_000,
) -> DataFrame:
    """Streaming (cell, arm) running moments: map-side assignment +
    quantization feeding a streaming groupBy — Spark keeps the
    per-(cell, arm) partial sums as state and re-emits updated cells
    each batch (use ``outputMode('complete')``: the state IS the result
    and is metadata-sized)."""
    return ab_moments(
        stream,
        id_col,
        value_col,
        group_cols or [],
        frac_a=frac_a,
        seed=seed,
        stage=stage,
        scale=scale,
    )


class ABReadoutSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, pivot the complete-mode moment
    state into the Welch-z readout and write it idempotently under
    ``batch_id=<epoch>`` — significance over time."""

    def __init__(
        self,
        out_dir: str,
        group_cols: list[str] | None = None,
        *,
        scale: int = 1_000_000,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.group_cols = group_cols or []
        self.scale = scale

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        readout = ab_readout(batch_df, self.group_cols, scale=self.scale)
        super().__call__(readout, batch_id)
