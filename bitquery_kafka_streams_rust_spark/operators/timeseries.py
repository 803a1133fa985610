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


def acf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    lags: tuple[int, ...] = (1, 2, 3),
    id_col: str = "event_id",
    y_scale: int = 1000,
    out_dp: int = 6,
) -> DataFrame:
    """Per-key lag-k autocorrelation — the seasonality/persistence probe
    a monitoring pipeline runs before trusting a trend fit
    (``regress.group_ols``) or an EWMA threshold.

    Pearson correlation of (y_t, y_{t-k}) per key and lag, from the
    same exact-integer moment doctrine as ``regress.py``: y quantizes
    map-side to ``round(y * y_scale)`` longs, ONE window partitioned BY
    KEY ordered by (ts, id) produces every requested lag column in a
    single pass, the per-(key, lag) pairs stack map-side, and one
    partial-combined aggregate accumulates the five integer moments —
    order-independent, restart-identical, bit-equal in DuckDB.  The
    single float readout runs one identical IEEE sequence per row.

    Shuffle profile: one key-partitioned window exchange (parallel per
    key — never a global window) + one map-combined aggregate; rows
    scale as len(lags) × input, all narrow (key, lag, two longs).

    Output: (key, lag, n_pairs, acf) — NULL acf when a key-lag has < 2
    pairs or zero variance on either side."""
    w = Window.partitionBy(key_col).orderBy(
        F.unix_timestamp(F.col(ts_col)), F.col(id_col)
    )
    qy = F.round(F.col(value_col).cast("double") * F.lit(int(y_scale)), 0).cast(
        "long"
    )
    lagged = df.select(
        F.col(key_col),
        qy.alias("_y"),
        *[F.lag(qy, int(k)).over(w).alias(f"_yl{k}") for k in lags],
    )
    pairs = lagged.select(
        key_col,
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(int(k)).alias("lag"),
                            F.col("_y").alias("y"),
                            F.col(f"_yl{k}").alias("yl"),
                        )
                        for k in lags
                    ]
                ),
                lambda s: s["yl"].isNotNull(),
            )
        ).alias("p"),
    ).select(key_col, "p.lag", "p.y", "p.yl")
    m = pairs.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("y").alias("_sy"),
        F.sum("yl").alias("_sl"),
        F.sum(F.col("y") * F.col("y")).alias("_syy"),
        F.sum(F.col("yl") * F.col("yl")).alias("_sll"),
        F.sum(F.col("y") * F.col("yl")).alias("_syl"),
    )
    n = F.col("n_pairs").cast("double")
    sy, sl = F.col("_sy").cast("double"), F.col("_sl").cast("double")
    syy, sll = F.col("_syy").cast("double"), F.col("_sll").cast("double")
    syl = F.col("_syl").cast("double")
    cov_n = n * syl - sy * sl
    var_y_n = n * syy - sy * sy
    var_l_n = n * sll - sl * sl
    ok = (F.col("n_pairs") > 1) & (var_y_n != 0) & (var_l_n != 0)
    return m.select(
        key_col,
        "lag",
        "n_pairs",
        F.when(ok, F.round(cov_n / F.sqrt(var_y_n * var_l_n), out_dp)).alias("acf"),
    )


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


def seasonal_profile(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    period: str = "hour_of_day",
    y_scale: int = 1000,
    out_dp: int = 6,
) -> DataFrame:
    """Per-key seasonal profile over a calendar period: bucket means
    and the seasonal index (bucket mean / key mean — the classic
    ratio-to-overall decomposition a rate-alerting threshold should be
    corrected by before CUSUM/EWMA monitoring).

    ``period``: 'hour_of_day' (0-23) or 'day_of_week' (1-7,
    Sunday=1 — both engines' dayofweek convention).

    Exactness: values quantize map-side to round(v·y_scale) longs, so
    bucket/overall sums are exact integers (the regress.py doctrine);
    the key totals come from a window SUM over the ≤24 bucket rows per
    key — never a data-scale window; means and the index are one
    rounded IEEE sequence.

    Output: (key, bucket, n, bucket_mean, seasonal_index)."""
    if period == "hour_of_day":
        bucket = F.hour(F.col(ts_col))
    elif period == "day_of_week":
        bucket = F.dayofweek(F.col(ts_col))
    else:
        raise ValueError(f"unknown period {period!r}")
    qy = F.round(F.col(value_col).cast("double") * F.lit(int(y_scale)), 0).cast(
        "long"
    )
    g = (
        df.select(F.col(key_col), bucket.alias("bucket"), qy.alias("_q"))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_q").alias("_sq"))
    )
    w_key = Window.partitionBy(key_col)
    tot_n = F.sum("n").over(w_key).cast("double")
    tot_q = F.sum("_sq").over(w_key).cast("double")
    scale = F.lit(float(y_scale))
    bmean9 = F.round(F.col("_sq").cast("double") / scale / F.col("n").cast("double"), 9)
    kmean9 = F.round(tot_q / scale / tot_n, 9)
    return g.select(
        key_col,
        "bucket",
        "n",
        F.round(bmean9, out_dp).alias("bucket_mean"),
        F.when(kmean9 != 0, F.round(bmean9 / kmean9, out_dp)).alias(
            "seasonal_index"
        ),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    id_col: str = "event_id",
    out_dp: int = 6,
) -> DataFrame:
    """Per-key inter-arrival gap profile — the burstiness summary
    behind backpressure sizing and rate-alert thresholds (the
    reference's every-N windows assume steady arrival; this measures
    how steady).  ONE key-partitioned lag window ordered by (ts, id)
    produces integer second gaps; one partial-combined aggregate
    yields n/mean (exact long sums) and the 6-dp-rounded p50/p95
    (the events_percentiles parity precedent).

    Output: (key, n_gaps, mean_gap_s, p50_gap_s, p95_gap_s,
    max_gap_s)."""
    w = Window.partitionBy(key_col).orderBy(
        F.unix_timestamp(F.col(ts_col)), F.col(id_col)
    )
    uts = F.unix_timestamp(F.col(ts_col))
    gaps = df.select(
        F.col(key_col), (uts - F.lag(uts).over(w)).alias("_g")
    ).where(F.col("_g").isNotNull())
    g = F.col("_g")
    return gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(
            F.sum(g).cast("double") / F.count(F.lit(1)).cast("double"), out_dp
        ).alias("mean_gap_s"),
        F.round(F.percentile(g, 0.5), out_dp).alias("p50_gap_s"),
        F.round(F.percentile(g, 0.95), out_dp).alias("p95_gap_s"),
        F.max(g).alias("max_gap_s"),
    )
