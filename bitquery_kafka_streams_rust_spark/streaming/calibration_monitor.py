"""Streaming classifier-calibration monitor.

The online twin of ``operators/evalmetrics.calibration_bins``: scored
(score, label) rows arrive on a stream, the monitor maintains
per-(group, bin) INTEGER state (n, Σlabel, Σ round(score*1e6)) as
streaming aggregation state, and after every micro-batch emits the
reliability-diagram readout (acc / conf / |gap| / ECE term) over
everything accumulated so far — drift in a production quality gate's
calibration becomes visible per epoch.

Exactly batch-equivalent, not approximately: scores are 6-dp rounded
(the classifier contract), so the quantized confidence sums are
order-independent long arithmetic; state after N batches is
BIT-IDENTICAL to ``calibration_moments`` over the union of those
batches, and ``calibration_readout`` replays the same rounded IEEE
projection — parity-tested with ``==``, no tolerance.

Scale shape: state is ≤ n_bins rows of three longs per group — bounded
by the schema, not the stream.  Each epoch pivots that metadata-sized
complete-mode state and writes one row per (group, bin), idempotent per
batch id.  Reference analog: the always-on gate telemetry the scoring
cut in ``src/processors/dex_processor.rs:179-223`` would need in
production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.evalmetrics import calibration_moments, calibration_readout
from .sink import ExactlyOnceParquetSink


def build_calibration_moment_stream(
    stream: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Streaming per-(group, bin) running calibration state: map-side
    binning + quantization feeding a streaming groupBy — Spark keeps
    the long partial sums as state and re-emits updated bins each batch
    (use ``outputMode('complete')``: the state IS the result and is
    metadata-sized)."""
    return calibration_moments(
        stream, score_col, label_col, group_cols or [], n_bins=n_bins
    )


class CalibrationReadoutSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, project the complete-mode bin
    state into the reliability table and write it idempotently under
    ``batch_id=<epoch>`` — calibration over time."""

    def __init__(
        self,
        out_dir: str,
        group_cols: list[str] | None = None,
        *,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.group_cols = group_cols or []

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        readout = calibration_readout(batch_df, self.group_cols)
        super().__call__(readout, batch_id)
