"""operators/anomaly.py: median/MAD outlier semantics, robustness to
corrupt rows (the property that motivates MAD over mean/std), and the
broadcast-join plan shape."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators.anomaly import mad_outliers, mad_stats


def _vals(spark, rows):
    return spark.createDataFrame(
        [(i, g, float(v)) for i, (g, v) in enumerate(rows)],
        "event_id long, event_type string, value double",
    )


def test_mad_hand_values(spark):
    # group a: 1..7 → med 4, |v-4| = 3,2,1,0,1,2,3 → mad 2; k=1 flags |v-4|>2
    df = _vals(spark, [("a", v) for v in range(1, 8)])
    stats = mad_stats(df, "value", "event_type").collect()[0]
    assert (stats["med"], stats["mad"]) == (4.0, 2.0)
    out = mad_outliers(df, "value", "event_type", k=1.0)
    assert sorted(r["value"] for r in out.collect()) == [1.0, 7.0]


def test_mad_is_robust_to_corrupt_rows(spark):
    # one 1e30 row barely moves the median/MAD; a mean/std gate would
    # have its threshold blown past every legitimate outlier
    base = [("a", v) for v in range(1, 8)]
    df = _vals(spark, base + [("a", 1e30)])
    stats = mad_stats(df, "value", "event_type").collect()[0]
    assert stats["med"] == 4.5 and stats["mad"] <= 3.0
    out = mad_outliers(df, "value", "event_type", k=3.0)
    assert [r["value"] for r in out.collect()] == [1e30]


def test_mad_groups_are_independent(spark):
    df = _vals(spark, [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (100, 200, 900)])
    out = {(r["event_type"], r["value"]) for r in mad_outliers(df, "value", "event_type", k=2.0).collect()}
    assert out == {("b", 900.0)}


def test_mad_zero_flags_every_nonmedian_value(spark):
    # >=50% identical values → mad 0 → any deviation flags (documented)
    df = _vals(spark, [("a", 5), ("a", 5), ("a", 5), ("a", 6)])
    out = mad_outliers(df, "value", "event_type", k=3.0)
    assert [r["value"] for r in out.collect()] == [6.0]


def test_mad_stats_joins_broadcast(spark):
    df = _vals(spark, [("a", v) for v in range(1, 8)])
    plan = mad_outliers(df, "value", "event_type")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
