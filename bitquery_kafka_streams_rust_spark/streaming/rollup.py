"""Continuous-aggregate maintenance: the streaming half of the rollup
cascade.

The batch cascade (``operators/aggregates.rollup_cascade``) derives
hour/day resolutions by re-aggregating minute partials.  At 100 TB the
minute grain itself cannot be recomputed from raw data on every
refresh — it is maintained INCREMENTALLY by the stream: a watermarked
tumbling-window aggregate in append mode emits each finest-grain
bucket exactly once, when the watermark closes it (deterministic
across restarts — the same property the flagship rollup pins).  The
emitted partials carry the RAW running sum (``_sum``) — rounding
before re-aggregation would poison every coarser level — plus
re-aggregable count/min/max, so
``rollup_cascade_from_partials(read(partials_dir))`` yields hour/day
views without ever touching raw events again.  This is the
hypertable / Kafka-Streams windowed-KTable maintenance loop expressed
as Structured Streaming.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minute_partials_stream(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = ("event_type",),
    resolution_s: int = 60,
    watermark_s: int = 120,
) -> DataFrame:
    """Append-mode finest-grain partials over a streaming event frame.
    Output rows (bucket_start epoch-seconds, *by, n_events, _sum,
    min_value, max_value) are emitted once per closed window and feed
    ``operators/aggregates.rollup_cascade_from_partials`` unchanged."""
    win = F.window(F.col(ts_col), f"{resolution_s} seconds").alias("_w")
    return (
        events.withWatermark(ts_col, f"{watermark_s} seconds")
        .groupBy(win, *by)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("_sum"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.unix_timestamp(F.col("_w.start")).alias("bucket_start"),
            *by,
            "n_events",
            "_sum",
            "min_value",
            "max_value",
        )
    )
