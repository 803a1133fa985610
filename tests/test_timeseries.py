"""Gap-fill resample (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from bitquery_kafka_streams_rust_spark.operators.timeseries import resample_ffill

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


def _obs(spark):
    rows = [
        # key 1: obs in hours 0, 1 (two: latest wins), 4 — holes at 2, 3
        (1, _ts(0.5), 10.0),
        (1, _ts(1.2), 20.0),
        (1, _ts(1.8), 25.0),
        (1, _ts(4.1), 40.0),
        # key 2: single observation → single-bucket grid
        (2, _ts(2.5), 99.0),
    ]
    return spark.createDataFrame(rows, "k long, ts timestamp, v double")


def test_resample_fills_gaps_with_last_observation(spark):
    out = {
        (r["k"], r["bucket_ts"]): r["value"]
        for r in resample_ffill(_obs(spark), "k", "ts", "v", 3600).collect()
    }
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out == {
        (1, base + 0 * 3600): 10.0,
        (1, base + 1 * 3600): 25.0,  # latest obs in the bucket, not first
        (1, base + 2 * 3600): 25.0,  # gap → carried
        (1, base + 3 * 3600): 25.0,  # gap → carried
        (1, base + 4 * 3600): 40.0,
        (2, base + 2 * 3600): 99.0,
    }


def test_resample_emits_no_nulls_and_dense_grid(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = resample_ffill(ev, "user_id", "ts", "value", 86400)
    rows = out.collect()
    assert all(r["value"] is not None for r in rows)
    # per key: contiguous buckets
    by_key: dict[int, list[int]] = {}
    for r in rows:
        by_key.setdefault(r["user_id"], []).append(r["bucket_ts"])
    for k, buckets in by_key.items():
        buckets.sort()
        assert buckets == list(range(buckets[0], buckets[-1] + 86400, 86400))


def test_resample_window_is_keyed_not_global(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        resample_ffill(ev, "user_id", "ts", "value", 86400)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    # every Window node declares a partition spec (no global window)
    for line in plan.splitlines():
        if "Window [" in line:
            assert "user_id" in line


# --- EWMA --------------------------------------------------------------------


def test_ewma_hand_values(spark):
    from bitquery_kafka_streams_rust_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i), 10, float(v), "{}")
        for i, v in enumerate([0.0, 1.0])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double, props string"
    )
    got = {r["event_id"]: r["ewma"] for r in ewma(df, "user_id", "ts", "value").collect()}
    # row 0: fold [0] -> 0/2 = 0, norm 0.5 -> 0.0
    # row 1: fold [0,1] -> 0.5, norm 0.75 -> 0.666666667
    assert got == {0: 0.0, 1: round(0.5 / 0.75, 9)}


def test_ewma_constant_series_is_identity(spark):
    from bitquery_kafka_streams_rust_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(seconds=i), 7, 3.5, "{}") for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double, props string"
    )
    assert all(r["ewma"] == 3.5 for r in ewma(df, "user_id", "ts", "value").collect())


def test_ewma_window_clamp_and_key_isolation(spark):
    from bitquery_kafka_streams_rust_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, 4.0, "{}"),
        (1, base + dt.timedelta(seconds=1), 1, 4.0, "{}"),
        (2, base + dt.timedelta(seconds=2), 1, 8.0, "{}"),
        (3, base, 2, 100.0, "{}"),  # other key must not leak in
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double, props string"
    )
    got = {r["event_id"]: r["ewma"] for r in ewma(df, "user_id", "ts", "value", window=2).collect()}
    # event 2: frame [4, 8] -> fold 5.0, norm 0.75 -> 6.666666667
    assert got[2] == round(5.0 / 0.75, 9)
    assert got[3] == 100.0
