"""Streaming seasonal-profile monitor — the online twin of
``operators/timeseries.seasonal_profile``.

Per-(key, calendar-bucket) INTEGER state (n, Σ round(v·y_scale)) as a
complete-mode streaming aggregation — ≤24 (hour) / 7 (dow) rows of two
longs per key, bounded by the calendar, not the stream.  Every epoch
projects that metadata-sized state through the batch readout (bucket
mean + seasonal index vs the key mean) and writes it idempotently per
batch id — the live seasonal baseline a rate monitor divides by before
CUSUM/EWMA thresholds, refreshing as traffic shifts.

Exactly batch-equivalent: quantization happens map-side on the same
grid as the batch operator, so the running sums are order-independent
long arithmetic; state after N batches is BIT-IDENTICAL to the batch
aggregate over their union, and the readout replays the same rounded
IEEE projection (parity-tested ``==``, no tolerance — no ordered-
arrival contract needed, unlike the lag-sensitive ACF/CUSUM monitors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sink import ExactlyOnceParquetSink


def build_seasonal_moment_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    period: str = "hour_of_day",
    y_scale: int = 1000,
) -> DataFrame:
    """Streaming per-(key, bucket) running seasonal state: map-side
    calendar bucketing + quantization feeding a streaming groupBy (use
    ``outputMode('complete')`` — the state IS the result and is
    calendar-bounded)."""
    if period == "hour_of_day":
        bucket = F.hour(F.col(ts_col))
    elif period == "day_of_week":
        bucket = F.dayofweek(F.col(ts_col))
    else:
        raise ValueError(f"unknown period {period!r}")
    qy = F.round(F.col(value_col).cast("double") * F.lit(int(y_scale)), 0).cast(
        "long"
    )
    return (
        stream.select(F.col(key_col).alias("key"), bucket.alias("bucket"), qy.alias("_q"))
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_q").alias("_sq"))
    )


def seasonal_readout(
    m: DataFrame, *, y_scale: int = 1000, out_dp: int = 6
) -> DataFrame:
    """Project seasonal state to (key, bucket, n, bucket_mean,
    seasonal_index) — identical arithmetic to the batch operator."""
    w_key = Window.partitionBy("key")
    scale = F.lit(float(y_scale))
    bmean9 = F.round(
        F.col("_sq").cast("double") / scale / F.col("n").cast("double"), 9
    )
    kmean9 = F.round(
        F.sum("_sq").over(w_key).cast("double")
        / scale
        / F.sum("n").over(w_key).cast("double"),
        9,
    )
    return m.select(
        "key",
        "bucket",
        "n",
        F.round(bmean9, out_dp).alias("bucket_mean"),
        F.when(kmean9 != 0, F.round(bmean9 / kmean9, out_dp)).alias(
            "seasonal_index"
        ),
    )


class SeasonalReadoutSink(ExactlyOnceParquetSink):
    """foreachBatch sink: each epoch, project the complete-mode bucket
    state into the seasonal profile and write it idempotently under
    ``batch_id=<epoch>`` — the seasonal baseline over time."""

    def __init__(self, out_dir: str, *, y_scale: int = 1000, lineage: bool = False):
        super().__init__(out_dir, lineage=lineage)
        self.y_scale = y_scale

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        super().__call__(seasonal_readout(batch_df, y_scale=self.y_scale), batch_id)
