"""CDC maintenance: log compaction (latest-wins + tombstone) and
snapshot diff (churn-only output)."""

import pyspark.sql.functions as F
import pytest

from bitquery_kafka_streams_rust_spark.operators import cdc


def _log(spark):
    # key 1: I then U (U wins) · key 2: history ends in D (tombstoned)
    # key 3: two ops at the SAME ts — op_id breaks the tie
    rows = [
        (1, 10, 100, "I", 1.0),
        (1, 20, 101, "U", 2.0),
        (2, 10, 102, "I", 9.0),
        (2, 30, 103, "D", 0.0),
        (3, 40, 104, "U", 5.0),
        (3, 40, 105, "U", 6.0),
    ]
    return spark.createDataFrame(
        rows, "k int, ts int, op_id int, op string, value double"
    )


def test_compact_log_latest_wins_and_tombstones(spark):
    out = cdc.compact_log(_log(spark), ["k"], ["ts", "op_id"])
    got = {r["k"]: r for r in out.collect()}
    assert set(got) == {1, 3}  # key 2 ends in D -> gone
    assert got[1]["value"] == 2.0 and got[1]["op_id"] == 101
    assert got[1]["n_ops"] == 2
    assert got[3]["value"] == 6.0  # same-ts tie broken by op_id


def test_compact_log_is_one_aggregate_no_sort(spark):
    out = cdc.compact_log(_log(spark), ["k"], ["ts", "op_id"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # max_by decomposes: map-side partial combine, ONE exchange of
    # one-row-per-(key,partition) partials, no Window over histories.
    # (Struct-valued agg buffers plan as SortAggregate — the sort is by
    # grouping key within partitions, not a per-key history sort.)
    assert plan.count("Exchange") == 1
    assert "partial_max_by" in plan
    assert "Window" not in plan


def test_compact_log_validates_args(spark):
    with pytest.raises(ValueError):
        cdc.compact_log(_log(spark), [], ["ts"])
    with pytest.raises(ValueError):
        cdc.compact_log(_log(spark), ["k"], [])


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, n int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 31), (4, "d", 40), (5, "e", 50)],
        "k int, s string, n int",
    )
    out = cdc.snapshot_diff(old, new, ["k"], ["s", "n"])
    got = {r["k"]: r for r in out.collect()}
    # key 2 unchanged -> absent; churn-sized output
    assert set(got) == {1, 3, 4, 5}
    assert got[1]["diff_status"] == "removed" and got[1]["new_s"] is None
    assert got[3]["diff_status"] == "changed" and got[3]["new_n"] == 31
    assert got[4]["diff_status"] == "changed"  # null -> 'd' is a change
    assert got[5]["diff_status"] == "added" and got[5]["old_n"] is None


def test_snapshot_diff_null_equal_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, None)], "k int, s string")
    assert cdc.snapshot_diff(old, new, ["k"], ["s"]).count() == 0


def _scd_log(spark):
    # key 1: A A B A -> runs A(v1) B(v2) A(v3); consecutive dup collapses
    # key 2: one observation -> single current run
    # key 3: NULL then NULL then X -> null-safe collapse, then change
    rows = [
        (1, 10, 100, "A"),
        (1, 20, 101, "A"),
        (1, 30, 102, "B"),
        (1, 40, 103, "A"),
        (2, 10, 104, "Z"),
        (3, 10, 105, None),
        (3, 20, 106, None),
        (3, 30, 107, "X"),
    ]
    return spark.createDataFrame(rows, "k int, ts int, op_id int, attr string")


def test_scd2_runs_versions_and_current(spark):
    out = cdc.scd2_build(_scd_log(spark), ["k"], ["attr"], ["ts", "op_id"])
    got = {(r["k"], r["version"]): r for r in out.collect()}
    assert len(got) == 6  # 3 + 1 + 2 runs
    r11 = got[(1, 1)]
    assert (r11["attr"], r11["effective_from"], r11["effective_to"]) == ("A", 10, 30)
    assert not r11["is_current"]
    r13 = got[(1, 3)]
    assert (r13["attr"], r13["effective_from"], r13["effective_to"]) == ("A", 40, None)
    assert r13["is_current"]
    assert got[(2, 1)]["is_current"]
    # null-safe: the two NULL observations are ONE run
    r31 = got[(3, 1)]
    assert r31["attr"] is None and r31["effective_to"] == 30
    assert got[(3, 2)]["attr"] == "X" and got[(3, 2)]["is_current"]


def test_scd2_single_shuffle(spark):
    out = cdc.scd2_build(_scd_log(spark), ["k"], ["attr"], ["ts", "op_id"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # both window passes share the (key, order) sort: ONE exchange
    assert plan.count("Exchange") == 1


def test_scd2_validates_args(spark):
    with pytest.raises(ValueError):
        cdc.scd2_build(_scd_log(spark), [], ["attr"], ["ts"])


def _dim(spark):
    # hand-built SCD2 runs (scd2_build output shape) — key 1 has three
    # runs, key 2 one open-ended run; key 9 has no facts
    rows = [
        (1, "A", 10, 30, False, 1),
        (1, "B", 30, 40, False, 2),
        (1, "A", 40, None, True, 3),
        (2, "Z", 10, None, True, 1),
        (9, "Q", 5, None, True, 1),
    ]
    return spark.createDataFrame(
        rows,
        "k int, attr string, effective_from int, effective_to int,"
        " is_current boolean, version int",
    )


def test_scd2_lookup_point_in_time(spark):
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 35), (103, 1, 99), (104, 2, 10), (105, 3, 50)],
        "fid int, k int, ts int",
    )
    out = cdc.scd2_lookup(facts, _dim(spark), ["k"], "ts", ["attr"])
    got = {r["fid"]: r for r in out.collect()}
    assert len(got) == 6  # LEFT: every fact survives
    # before the first run -> NULL dimension columns
    assert got[100]["attr"] is None and got[100]["dim_version"] is None
    # effective_from is inclusive
    assert (got[101]["attr"], got[101]["dim_version"], got[101]["staleness_s"]) == ("A", 1, 0)
    # mid-run pick with staleness
    assert (got[102]["attr"], got[102]["dim_version"], got[102]["staleness_s"]) == ("B", 2, 5)
    # open-ended current run
    assert (got[103]["attr"], got[103]["dim_version"], got[103]["staleness_s"]) == ("A", 3, 59)
    assert got[104]["attr"] == "Z"
    # key with no dim rows at all
    assert got[105]["attr"] is None and got[105]["staleness_s"] is None


def test_scd2_lookup_gapped_dim_nulls_out(spark):
    # drop run 2: a fact inside the dropped interval must NOT inherit
    # run 1 (its effective_to closed before the fact)
    dim = _dim(spark).where("NOT (k = 1 AND version = 2)")
    facts = spark.createDataFrame([(1, 1, 35)], "fid int, k int, ts int")
    got = cdc.scd2_lookup(facts, dim, ["k"], "ts", ["attr"]).collect()[0]
    assert got["attr"] is None and got["dim_version"] is None


def test_scd2_lookup_single_shuffle(spark):
    facts = spark.createDataFrame([(1, 1, 35)], "fid int, k int, ts int")
    out = cdc.scd2_lookup(facts, _dim(spark), ["k"], "ts", ["attr"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    # union-and-carry: ONE exchange on the key, no join operator at all
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_scd2_lookup_validates_args(spark):
    facts = spark.createDataFrame([(1, 1, 35)], "fid int, k int, ts int")
    with pytest.raises(ValueError):
        cdc.scd2_lookup(facts, _dim(spark), [], "ts", ["attr"])
