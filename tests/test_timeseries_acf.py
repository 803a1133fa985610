"""Lag-k autocorrelation (operators/timeseries.py acf) and winsorized
stats (operators/anomaly.py winsorize_stats): hand values, pure-Python
parity, degenerate groups."""

from __future__ import annotations

import datetime as dt

from bitquery_kafka_streams_rust_spark.operators import anomaly as AN
from bitquery_kafka_streams_rust_spark.operators import timeseries as TS


def _rows(key, values, t0=dt.datetime(2024, 1, 1)):
    return [
        (i, t0 + dt.timedelta(seconds=i), key, float(v)) for i, v in enumerate(values)
    ]


SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _py_acf(values, k, scale=1000):
    q = [round(v * scale) for v in values]
    pairs = [(q[i], q[i - k]) for i in range(k, len(q))]
    n = len(pairs)
    if n < 2:
        return None
    sy = sum(y for y, _ in pairs)
    sl = sum(l for _, l in pairs)
    syy = sum(y * y for y, _ in pairs)
    sll = sum(l * l for _, l in pairs)
    syl = sum(y * l for y, l in pairs)
    vy, vl = n * syy - sy * sy, n * sll - sl * sl
    if vy == 0 or vl == 0:
        return None
    return (n * syl - sy * sl) / (vy * vl) ** 0.5


def test_acf_matches_python_reference(spark):
    vals_a = [1.0, 2.0, 1.5, 3.0, 2.5, 4.0, 3.5, 5.0]
    vals_b = [10.0, 9.0, 8.0, 7.0, 6.0, 5.0]
    df = spark.createDataFrame(_rows("a", vals_a) + _rows("b", vals_b), SCHEMA)
    got = {
        (r["event_type"], r["lag"]): r
        for r in TS.acf(df, "event_type", "ts", "value", lags=(1, 2)).collect()
    }
    for key, vals in (("a", vals_a), ("b", vals_b)):
        for k in (1, 2):
            r = got[(key, k)]
            assert r["n_pairs"] == len(vals) - k
            assert abs(r["acf"] - _py_acf(vals, k)) <= 5e-7


def test_acf_alternating_series_is_negative_at_lag1(spark):
    vals = [1.0, -1.0] * 8
    df = spark.createDataFrame(_rows("x", vals), SCHEMA)
    got = {r["lag"]: r["acf"] for r in
           TS.acf(df, "event_type", "ts", "value", lags=(1, 2)).collect()}
    assert got[1] == -1.0 and got[2] == 1.0


def test_acf_constant_series_null(spark):
    df = spark.createDataFrame(_rows("c", [2.0] * 6), SCHEMA)
    got = TS.acf(df, "event_type", "ts", "value", lags=(1,)).collect()
    assert len(got) == 1 and got[0]["acf"] is None


def test_acf_short_series(spark):
    # 2 rows -> lag-1 has 1 pair (NULL acf), lag-2 emits no row
    df = spark.createDataFrame(_rows("s", [1.0, 2.0]), SCHEMA)
    got = TS.acf(df, "event_type", "ts", "value", lags=(1, 2)).collect()
    assert [(r["lag"], r["n_pairs"], r["acf"]) for r in got] == [(1, 1, None)]


def test_winsorize_hand_values(spark):
    # ten values 1..9 plus an outlier 1000; p05/p95 with ten points:
    # DuckDB/Spark interpolate identically (events_percentiles precedent)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
    df = spark.createDataFrame(_rows("g", vals), SCHEMA)
    r = AN.winsorize_stats(df, "value", "event_type").collect()[0]
    assert r["n"] == 10 and r["n_lo"] == 1 and r["n_hi"] == 1
    assert r["cut_lo"] == 1.45 and abs(r["cut_hi"] - 554.05) < 1e-9
    clipped = [min(max(v, r["cut_lo"]), r["cut_hi"]) for v in vals]
    assert abs(r["win_mean"] - sum(clipped) / 10) <= 1e-6


def test_winsorize_clamps_bound_outlier_influence(spark):
    base = [float(v) for v in range(100)]
    df_clean = spark.createDataFrame(_rows("g", base), SCHEMA)
    df_dirty = spark.createDataFrame(_rows("g", base[:-1] + [1e12]), SCHEMA)
    clean = AN.winsorize_stats(df_clean, "value", "event_type").collect()[0]
    dirty = AN.winsorize_stats(df_dirty, "value", "event_type").collect()[0]
    # one corrupt row moves the winsorized mean by < the p95 cutoff gap,
    # not by ~1e10 as it would move the raw mean
    assert abs(dirty["win_mean"] - clean["win_mean"]) < 5.0


def test_interarrival_stats_hand_values(spark):
    from bitquery_kafka_streams_rust_spark.operators.timeseries import (
        interarrival_stats,
    )

    # gaps for key g: 10, 20, 30, 100 -> mean 40, p50 25, max 100
    vals = [0, 10, 30, 60, 160]
    df = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), "g", 0.0)
         for i, s in enumerate(vals)]
        + [(99, dt.datetime(2024, 1, 1), "solo", 0.0)],
        SCHEMA,
    )
    out = {r["event_type"]: r for r in
           interarrival_stats(df, "event_type", "ts").collect()}
    g = out["g"]
    assert g["n_gaps"] == 4 and g["mean_gap_s"] == 40.0
    assert g["p50_gap_s"] == 25.0 and g["max_gap_s"] == 100
    assert "solo" not in out  # a single event has no gaps
