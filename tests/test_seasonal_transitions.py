"""Seasonal profile (operators/timeseries.py) and Markov transition
matrix (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

from bitquery_kafka_streams_rust_spark.operators.funnel import transition_matrix
from bitquery_kafka_streams_rust_spark.operators.timeseries import seasonal_profile

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def test_transition_matrix_hand_values(spark):
    t0 = dt.datetime(2024, 1, 1)
    seq_u1 = ["a", "b", "a", "b", "c"]  # a>b x2, b>a, b>c
    seq_u2 = ["a", "b"]                 # a>b
    rows = [
        (i, t0 + dt.timedelta(seconds=i), 1, et, 0.0)
        for i, et in enumerate(seq_u1)
    ] + [
        (100 + i, t0 + dt.timedelta(seconds=100 + i), 2, et, 0.0)
        for i, et in enumerate(seq_u2)
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r["prev_state"], r["state"]): (r["n"], r["prob"])
        for r in transition_matrix(df, "user_id", "ts", "event_type").collect()
    }
    assert got[("a", "b")] == (3, 1.0)
    assert got[("b", "a")] == (1, 0.5)
    assert got[("b", "c")] == (1, 0.5)
    assert ("c", "a") not in got  # sequences never cross users
    # rows of the matrix sum to 1
    assert abs(sum(p for (pv, _), (_, p) in got.items() if pv == "b") - 1.0) < 1e-5


def test_transition_matrix_single_event_users_emit_nothing(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, t0, i, "x", 0.0) for i in range(5)], EV_SCHEMA
    )
    assert transition_matrix(df, "user_id", "ts", "event_type").count() == 0


def test_seasonal_profile_hand_values(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = (
        [(i, t0 + dt.timedelta(minutes=i), 1, "g", 10.0) for i in range(3)]
        + [(10 + i, t0 + dt.timedelta(hours=12, minutes=i), 1, "g", 30.0)
           for i in range(3)]
    )
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["bucket"]: r for r in
           seasonal_profile(df, "event_type", "ts", "value").collect()}
    assert set(got) == {0, 12}
    assert got[0]["n"] == 3 and got[0]["bucket_mean"] == 10.0
    assert got[12]["bucket_mean"] == 30.0
    # key mean is 20 -> indices 0.5 and 1.5
    assert got[0]["seasonal_index"] == 0.5
    assert got[12]["seasonal_index"] == 1.5


def test_seasonal_profile_day_of_week(spark):
    # 2024-01-01 is a Monday (dayofweek=2), 2024-01-07 a Sunday (1)
    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "g", 4.0),
        (2, dt.datetime(2024, 1, 7, 9), 1, "g", 8.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["bucket"]: r["bucket_mean"] for r in
           seasonal_profile(df, "event_type", "ts", "value",
                            period="day_of_week").collect()}
    assert got == {2: 4.0, 1: 8.0}


def test_seasonal_profile_zero_mean_key_null_index(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 1), 1, "g", 1.0),
        (2, dt.datetime(2024, 1, 1, 2), 1, "g", -1.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {r["bucket"]: r["seasonal_index"] for r in
           seasonal_profile(df, "event_type", "ts", "value").collect()}
    assert got == {1: None, 2: None}
