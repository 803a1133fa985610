"""Count-min sketch / heavy hitters (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import sketches as SK


def _traffic(spark):
    # key 7 is hot (60 rows), key 13 warm (30), 20 cold keys x 3 rows
    rows = [(7,)] * 60 + [(13,)] * 30 + [(k,) for k in range(100, 120) for _ in range(3)]
    return spark.createDataFrame(rows, "user_id long")


def test_cms_never_undercounts_and_is_tight_when_wide(spark):
    df = _traffic(spark)
    exact = {r["user_id"]: r["c"] for r in df.groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    sketch = SK.cms_sketch(df, "user_id", depth=4, width=2048)
    est = {
        r["user_id"]: r["est_count"]
        for r in SK.cms_estimate(df.select("user_id").distinct(), sketch, "user_id", depth=4, width=2048).collect()
    }
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c  # CMS one-sided error
    # 22 keys in 4x2048 buckets: collisions are essentially impossible
    assert est == exact


def test_cms_narrow_width_overcounts_only(spark):
    df = _traffic(spark)
    exact = {r["user_id"]: r["c"] for r in df.groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    sketch = SK.cms_sketch(df, "user_id", depth=2, width=4)
    est = {
        r["user_id"]: r["est_count"]
        for r in SK.cms_estimate(df.select("user_id").distinct(), sketch, "user_id", depth=2, width=4).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    assert sum(est.values()) > sum(exact.values())  # collisions happened


def test_heavy_hitters_superset_and_deterministic(spark):
    df = _traffic(spark)
    # mean = 150/22 ≈ 6.8; ratio 2 → threshold ≈ 13.6 → true HH = {7, 13}
    a = sorted(r["user_id"] for r in SK.heavy_hitters(df, "user_id", mean_ratio=2.0).collect())
    b = sorted(r["user_id"] for r in SK.heavy_hitters(df, "user_id", mean_ratio=2.0).collect())
    assert a == b  # fixed salts → replayable
    assert set(a) >= {7, 13}  # no false negatives ever
    assert set(a) == {7, 13}  # and none of the cold keys collide at this width


def test_cms_estimate_broadcasts_the_sketch(spark):
    df = _traffic(spark)
    sketch = SK.cms_sketch(df, "user_id")
    out = SK.cms_estimate(df.select("user_id").distinct(), sketch, "user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_candidates_injection(spark):
    """The scale path (VERDICT r4): an explicit candidate frame replaces
    the full-corpus key distinct; estimates/threshold are unchanged, so
    any true heavy hitter PRESENT in the candidates still surfaces and
    absent keys simply aren't probed."""
    df = _traffic(spark)
    cand = spark.createDataFrame([(7,), (1,)], "user_id long")
    got = sorted(
        r["user_id"]
        for r in SK.heavy_hitters(
            df, "user_id", mean_ratio=2.0, candidates=cand
        ).collect()
    )
    assert got == [7]  # 13 not in candidates → not probed; 1 is cold
    # default path unchanged
    full = sorted(
        r["user_id"]
        for r in SK.heavy_hitters(df, "user_id", mean_ratio=2.0).collect()
    )
    assert full == [7, 13]


# --- HyperLogLog ------------------------------------------------------------


def test_hll_accuracy_consecutive_and_random_ids(spark):
    """p=8 -> stderr ~6.5%; the avalanche rounds must hold that on
    CONSECUTIVE ids too (a single multiplicative round provably cannot
    — its low bits are a bijection of the key's low bits)."""
    import random

    cons = spark.createDataFrame([(i,) for i in range(1500)], "user_id long")
    est = SK.hll_distinct(cons, "user_id").collect()[0]["est_distinct"]
    assert abs(est - 1500) / 1500 < 0.15
    rng = random.Random(7)
    rand = spark.createDataFrame(
        [(x,) for x in rng.sample(range(10**9), 1500)], "user_id long"
    )
    est = SK.hll_distinct(rand, "user_id").collect()[0]["est_distinct"]
    assert abs(est - 1500) / 1500 < 0.15


def test_hll_duplicates_do_not_move_the_estimate(spark):
    once = spark.createDataFrame([(i,) for i in range(400)], "user_id long")
    tenfold = spark.createDataFrame(
        [(i,) for i in range(400) for _ in range(10)], "user_id long"
    )
    a = SK.hll_distinct(once, "user_id").collect()[0]["est_distinct"]
    b = SK.hll_distinct(tenfold, "user_id").collect()[0]["est_distinct"]
    assert a == b


def test_hll_registers_merge_like_union(spark):
    """max-merge of two halves' registers == registers of the union —
    the property that makes the sketch a distributed/streaming
    aggregate."""
    left = spark.createDataFrame([(i,) for i in range(0, 600)], "user_id long")
    right = spark.createDataFrame([(i,) for i in range(300, 900)], "user_id long")
    both = left.union(right)
    merged = (
        SK.hll_registers(left, "user_id")
        .union(SK.hll_registers(right, "user_id"))
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )
    want = {
        (r["bucket"], r["reg"]) for r in SK.hll_registers(both, "user_id").collect()
    }
    got = {(r["bucket"], r["reg"]) for r in merged.collect()}
    assert got == want
    est = SK.hll_estimate(merged).collect()[0]["est_distinct"]
    direct = SK.hll_distinct(both, "user_id").collect()[0]["est_distinct"]
    assert est == direct


def test_hll_streaming_update_mode_matches_batch(spark, sf_dir, tmp_path):
    """hll_registers is a streaming max-aggregate with O(2^p) state per
    group: streamed registers == batch registers, so the estimate is
    identical."""
    in_dir = str(tmp_path / "in")
    spark.read.parquet(f"{sf_dir}/events.parquet").coalesce(2).write.parquet(in_dir)
    batch = spark.read.parquet(in_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        SK.hll_registers(stream, "user_id", ["event_type"])
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    streamed = spark.sql("SELECT * FROM hll_stream")
    want = {
        (r["event_type"], r["bucket"]): r["reg"]
        for r in SK.hll_registers(batch, "user_id", ["event_type"]).collect()
    }
    got = {(r["event_type"], r["bucket"]): r["reg"] for r in streamed.collect()}
    assert got == want and len(got) > 0
    est_s = sorted(
        (r["event_type"], r["est_distinct"])
        for r in SK.hll_estimate(streamed, ["event_type"]).collect()
    )
    est_b = sorted(
        (r["event_type"], r["est_distinct"])
        for r in SK.hll_distinct(batch, "user_id", ["event_type"]).collect()
    )
    assert est_s == est_b
# appended to test_sketches.py


def test_quantile_sketch_is_mergeable_and_bounded(spark):
    import random

    rng = random.Random(42)
    vals = [(i, rng.uniform(0, 100)) for i in range(2000)]
    df = spark.createDataFrame(vals, "id long, value double")
    a = df.where(F.col("id") < 1000)
    b = df.where(F.col("id") >= 1000)
    whole = SK.quantile_sketch(df, "value", width=0.5, n_buckets=256)
    merged = (
        SK.quantile_sketch(a, "value", width=0.5, n_buckets=256)
        .unionByName(SK.quantile_sketch(b, "value", width=0.5, n_buckets=256))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))
    assert whole.count() <= 256


def test_quantile_estimate_within_one_grid_step(spark):
    # values 0.0, 0.1, ..., 99.9 — true p50 = 49.95, p90 = 89.91
    df = spark.createDataFrame([(i, i / 10.0) for i in range(1000)], "id long, value double")
    sk = SK.quantile_sketch(df, "value", width=0.25, n_buckets=4096)
    row = SK.quantile_estimate(sk, (0.5, 0.9, 0.99), width=0.25).collect()[0]
    assert row["n"] == 1000
    # lower-bound convention: estimate in [true - width, true]
    assert abs(row["p50_est"] - 49.95) <= 0.25
    assert abs(row["p90_est"] - 89.91) <= 0.25
    assert abs(row["p99_est"] - 98.9) <= 0.25


def test_quantile_sketch_saturates_at_grid_edges(spark):
    df = spark.createDataFrame(
        [(1, -5.0), (2, 0.1), (3, 1e9)], "id long, value double"
    )
    rows = {r["bucket"]: r["cnt"] for r in SK.quantile_sketch(df, "value", width=0.25, n_buckets=16).collect()}
    assert rows == {0: 2, 15: 1}  # -5.0 clamps to 0, 1e9 to n_buckets-1
