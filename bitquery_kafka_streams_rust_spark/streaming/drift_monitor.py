"""Streaming embedding-centroid drift monitor.

The online twin of ``operators/drift.centroid_drift``: embeddings
arrive on a stream (a re-embedding job's output, an encoder canary) and
the monitor maintains the per-(group, dimension) INTEGER component sums
as streaming aggregation state, emitting after every micro-batch the
drift of the accumulated stream against a static baseline snapshot.

Why this is exactly batch-equivalent (not approximately): the batch
operator quantizes components to an integer grid precisely so sums are
order-independent — and streaming incremental aggregation is just
another summation order.  The monitor's state after N batches is
BIT-IDENTICAL to the batch operator's aggregate over the union of those
batches, so the emitted drift rows match the batch twin exactly
(parity-tested, ==, no tolerance).

Scale shape: state is (groups × dims) integer counters — bounded by
the schema, not the stream (10 groups × 64 dims = 640 longs here;
thousands at production group counts).  The per-batch emission joins
that metadata-sized state against the baseline's assembled sum vectors
(computed once at start) and writes one drift row per group per epoch —
a drift-over-time history, idempotent per batch id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.drift import (
    assemble_sums,
    compare_centroid_sides,
    centroid_side,
    quantized_components,
)
from .sink import ExactlyOnceParquetSink


def build_centroid_sum_stream(
    stream_emb: DataFrame,
    *,
    group_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Streaming (g, d, s, cnt) running sums: the map-side quantized
    explode feeding a streaming groupBy — Spark keeps the per-(g, d)
    partial sums as state and re-emits updated groups each batch (use
    ``outputMode('complete')``: the state IS the result and is
    metadata-sized)."""
    return (
        quantized_components(
            stream_emb, group_col=group_col, vec_col=vec_col, scale=scale
        )
        .groupBy("g", "d")
        .agg(F.sum("q").alias("s"), F.count("*").alias("cnt"))
    )


class CentroidDriftSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, assemble the complete-mode state
    snapshot into per-group sum vectors, compare against the static
    baseline side, and write the drift rows idempotently under
    ``batch_id=<epoch>`` — the drift-over-time history."""

    def __init__(
        self,
        baseline: DataFrame,
        out_dir: str,
        *,
        group_col: str = "label",
        vec_col: str = "embedding",
        scale: int = 1_000_000,
        lineage: bool = False,
    ):
        super().__init__(out_dir, lineage=lineage)
        self.group_col = group_col
        self.scale = scale
        # the baseline side is computed ONCE (assembled integer sums,
        # n_groups rows) and reused by every epoch's compare
        self.old_side = centroid_side(
            baseline, group_col=group_col, vec_col=vec_col, scale=scale, suffix="old"
        ).localCheckpoint(eager=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        drift = compare_centroid_sides(
            self.old_side,
            assemble_sums(batch_df, suffix="new"),
            group_col=self.group_col,
            scale=self.scale,
        )
        super().__call__(drift, batch_id)
