"""Kaplan-Meier survival (operators/survival.py): hand-checked
product-limit values, censoring semantics, duration extraction."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import survival as SV


def test_km_textbook_example(spark):
    # classic: events at t=1 (n=5), t=3 (n=3); censored at t=2, t=4;
    # survivor to t=5 censored.  S(1)=4/5, S(3)=4/5*2/3, censoring
    # rows leave survival unchanged but shrink the risk set.
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 0)]
    df = spark.createDataFrame(rows, "duration long, event int")
    got = {r["duration"]: r for r in
           SV.survival_km(df, "duration", "event").collect()}
    assert got[1]["n_risk"] == 5 and abs(got[1]["survival"] - 0.8) <= 1e-6
    assert got[2]["n_risk"] == 4 and abs(got[2]["survival"] - 0.8) <= 1e-6
    assert got[3]["n_risk"] == 3
    assert abs(got[3]["survival"] - 0.8 * (2 / 3)) <= 1e-5
    assert got[4]["survival"] == got[3]["survival"]  # censor: no drop
    assert got[5]["n_risk"] == 1


def test_km_all_events_reaches_zero(spark):
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "duration long, event int"
    )
    got = {r["duration"]: r["survival"] for r in
           SV.survival_km(df, "duration", "event").collect()}
    assert abs(got[1] - 2 / 3) <= 1e-6 and abs(got[2] - 1 / 3) <= 1e-6
    assert got[3] == 0.0


def test_km_ties_at_same_duration(spark):
    # two events and one censor at t=2 among 4 subjects
    df = spark.createDataFrame(
        [(2, 1), (2, 1), (2, 0), (9, 0)], "duration long, event int"
    )
    got = {r["duration"]: r for r in
           SV.survival_km(df, "duration", "event").collect()}
    r2 = got[2]
    assert (r2["n_risk"], r2["n_event"], r2["n_censored"]) == (4, 2, 1)
    assert abs(r2["survival"] - 0.5) <= 1e-6
    assert got[9]["n_risk"] == 1 and got[9]["survival"] == 0.5


def test_km_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 0), ("b", 1, 0), ("b", 5, 1)],
        "g string, duration long, event int",
    )
    got = {(r["g"], r["duration"]): r["survival"] for r in
           SV.survival_km(df, "duration", "event", ["g"]).collect()}
    assert abs(got[("a", 1)] - 0.5) <= 1e-6
    assert got[("b", 1)] == 1.0 and got[("b", 5)] == 0.0


def _ev(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=s), u, et) for i, (u, s, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_durations_to_event_semantics(spark):
    rows = [
        (1, 0, "signup"), (1, 100, "purchase"),            # converts at 100
        (2, 0, "purchase"), (2, 50, "signup"), (2, 90, "view"),  # pre-start
        (3, 10, "signup"), (3, 400, "view"),               # censored at 390
        (4, 0, "view"),                                    # never started
    ]
    df = _ev(spark, rows)
    got = {r["user_id"]: (r["duration_s"], r["event"]) for r in
           SV.durations_to_event(
               df, "user_id", "ts",
               start_pred=F.col("event_type") == "signup",
               event_pred=F.col("event_type") == "purchase",
           ).collect()}
    assert got == {1: (100, 1), 2: (40, 0), 3: (390, 0)}
