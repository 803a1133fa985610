"""Streaming per-key trend (OLS) monitor.

The online twin of ``operators/regress.group_ols``: fact rows arrive
on a stream, the monitor maintains the five per-group OLS sufficient
statistics (n, Σx, Σy, Σx², Σy², Σxy) as streaming aggregation state
on the exact integer grid, and after every micro-batch emits the
slope/intercept/r² readout of everything accumulated so far — the
"which keys are trending, and is the fit believable yet" curve, one
readout row per key per epoch.  This upgrades the reference's running
per-key counters (``src/processors/dex_processor.rs:91-117``) and
threshold alerts to online trend estimation.

Why the readout is exactly batch-equivalent (not approximately): the
moments quantize y to an integer grid map-side
(``regress.ols_moments``), so the running sums are order-independent
long arithmetic — streaming incremental aggregation is just another
summation order.  State after N batches is BIT-IDENTICAL to
``ols_moments`` over the union of those batches, and
``regress.ols_readout`` runs the same rounded IEEE projection as the
batch readout, so the emitted rows match ``group_ols`` exactly
(parity-tested, ``==``, no tolerance).

Scale shape: state is one row of six longs per group — bounded by the
key cardinality, not the stream.  Each epoch's readout projects that
state (complete-mode output) and writes one row per key, idempotent
per batch id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators.regress import ols_moments, ols_readout
from .sink import ExactlyOnceParquetSink


def build_ols_moment_stream(
    stream: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    *,
    y_scale: int = 1000,
) -> DataFrame:
    """Streaming per-group OLS moments: map-side quantization feeding a
    streaming groupBy — Spark keeps the six long sums as state and
    re-emits updated groups each batch (use ``outputMode('complete')``:
    the state IS the result and is key-cardinality-sized)."""
    return ols_moments(stream, x_col, y_col, group_cols, y_scale=y_scale)


class TrendReadoutSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, project the complete-mode moment
    state into the slope/intercept/r² readout and write it idempotently
    under ``batch_id=<epoch>`` — trend significance over time."""

    def __init__(
        self,
        out_dir: str,
        group_cols: Sequence[str] = (),
        *,
        y_scale: int = 1000,
        x_scale: int = 1,
        slope_dp: int = 12,
        out_dp: int = 6,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.group_cols = list(group_cols)
        self.y_scale = y_scale
        self.x_scale = x_scale
        self.slope_dp = slope_dp
        self.out_dp = out_dp

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        readout = ols_readout(
            batch_df,
            self.group_cols,
            y_scale=self.y_scale,
            x_scale=self.x_scale,
            slope_dp=self.slope_dp,
            out_dp=self.out_dp,
        )
        super().__call__(readout, batch_id)
