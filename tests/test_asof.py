

def test_asof_forward_and_tolerance(spark):
    from datetime import datetime as DT

    from bitquery_kafka_streams_rust_spark.operators.asof import asof_join

    t = lambda s: DT(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, "u", t(10)), (2, "u", t(30)), (3, "u", t(50)), (4, "v", t(10))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t(10), 100.0), ("u", t(35), 200.0)],
        "user_id string, ts timestamp, value double",
    )
    fwd = {
        r["event_id"]: (r["value_right"], r["ts_right"])
        for r in asof_join(left, right, on="user_id", direction="forward").collect()
    }
    # equal ts is eligible (inclusive); 30 -> next at 35; 50 -> none; v -> none
    assert set(fwd) == {1, 2}
    assert fwd[1][0] == 100.0 and fwd[1][1] == t(10)
    assert fwd[2][0] == 200.0 and fwd[2][1] == t(35)
    # tolerance: 30->35 is 5s away; a 4s budget drops it
    tight = asof_join(
        left, right, on="user_id", direction="forward", tolerance_s=4
    ).collect()
    assert {r["event_id"] for r in tight} == {1}
    # backward staleness: 1 matches at 0s, 2 at 20s, 3 at 15s — a 10s
    # budget keeps only event 1
    back = asof_join(
        left, right, on="user_id", direction="backward", tolerance_s=10
    ).collect()
    assert {r["event_id"] for r in back} == {1}
