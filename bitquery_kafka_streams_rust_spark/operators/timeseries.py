"""Time-series resample / gap-fill — the dense-grid twin of the as-of
join.

The reference's rate/window stats (src/processors/dex_processor.rs
every-N reporting) emit one row per OBSERVED window; downstream
consumers (charting, feature stores, training curricula over time)
need one row per CALENDAR bucket, holes forward-filled from the last
observation.  SQL engines call this gap-filling; Spark has no native
operator, but it decomposes into three fully-distributed steps:

1. per (key, bucket): the latest observation — an ordinary partial-
   aggregated groupBy (``max_by(value, ts)``; safe here because the
   aggregate is deterministic whenever (key, ts) pairs are unique,
   which the fixture guarantees and a real pipeline gets from its
   dedup stage);
2. per key: the bucket span [min_bucket, max_bucket] → the dense grid
   via ``sequence`` + ``explode`` — generated map-side AFTER a tiny
   per-key aggregate, no driver range loop;
3. forward fill: ``last(value, ignorenulls=True)`` over a window
   partitioned BY KEY ordered by bucket — state is one value per key,
   never a global window.

Shuffle profile: two key-partitioned exchanges (the groupBys) + the
grid join on (key, bucket); AQE coalesces the tiny side.  Grid size is
bounded by span/step per key — the caller picks ``step_s`` to match
the span (a 10^12-row stream with per-day buckets emits 365 rows per
key-year, independent of input volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_s: int,
) -> DataFrame:
    """Dense per-key time grid at ``step_s`` resolution with the last
    observed ``value_col`` carried forward across empty buckets.

    Output: (key, bucket_ts BIGINT epoch seconds, value) — one row per
    key per bucket between that key's first and last observation.  The
    first bucket always holds an observation, so the fill never emits
    NULL.
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts_col)) / step_s)
    obs = (
        df.withColumn("_b", bucket)
        .groupBy(key_col, "_b")
        .agg(F.max_by(F.col(value_col), F.col(ts_col)).alias("_v"))
    )
    spans = obs.groupBy(key_col).agg(
        F.min("_b").alias("_b0"), F.max("_b").alias("_b1")
    )
    grid = spans.select(
        key_col, F.explode(F.sequence("_b0", "_b1")).alias("_b")
    )
    filled = (
        grid.join(obs, on=[key_col, "_b"], how="left")
        .withColumn(
            "value",
            F.last("_v", ignorenulls=True).over(
                Window.partitionBy(key_col)
                .orderBy("_b")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select(
            key_col,
            (F.col("_b") * step_s).cast("long").alias("bucket_ts"),
            "value",
        )
    )
    return filled


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    window: int = 16,
    id_col: str = "event_id",
) -> DataFrame:
    """Bounded-window exponential moving average with alpha = 1/2 —
    the time-series smoother (trend line, adaptive threshold input)
    the reference's every-N window stats approximate with flat means.

    alpha = 1/2 is chosen deliberately: every weight is a power of two
    (newest 2^-1, then 2^-2, ...), so the left fold ``acc = (acc + x)
    / 2`` and the ``1 - 2^-m`` truncation renormalizer are EXACT
    dyadic IEEE arithmetic — the trajectory replays bit-identically on
    any engine evaluating the same frame order (no libm, no ulp
    hazard; same portability doctrine as the HLL integer harmonic
    sum).  The frame is (ts, id)-ordered so ties are deterministic.

    Scale shape: one window partitioned BY KEY (parallelism = key
    cardinality, never a global window) with a ROWS frame bounded at
    ``window`` — per-row state is <= ``window`` doubles regardless of
    stream length, the property that also makes it a streaming
    transformWithState candidate.  Output adds an ``ewma`` column
    rounded to 9 dp."""
    uts = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(uts, F.col(id_col))
        .rowsBetween(-(int(window) - 1), 0)
    )
    vals = F.collect_list(F.col(value_col)).over(w)
    folded = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: (acc + x) / F.lit(2.0)
    )
    norm = F.lit(1.0) - F.pow(F.lit(2.0), -F.size(vals).cast("double"))
    return df.withColumn("ewma", F.round(folded / norm, 9))
