"""Aggregation semantics: counters, alerts, percentiles, share, skew."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import aggregates as AG
from bitquery_kafka_streams_rust_spark.operators import skew as SK


def test_global_counters(spark):
    df = spark.createDataFrame([(v,) for v in [50.0, 1500.0, 200000.0, 2e6]], "usd double")
    row = AG.global_counters(
        df,
        {
            "big": F.col("usd") > 1_000,
            "whale": F.col("usd") > 1_000_000,
        },
    ).collect()[0]
    assert row["total"] == 4 and row["big"] == 3 and row["whale"] == 1


def test_threshold_alerts_tiers(spark):
    """dex_processor.rs:156-164 — whale >1M, big >100k."""
    df = spark.createDataFrame([(v,) for v in [5e6, 2e5, 5e4]], "usd double")
    out = {r["usd"]: r["alert_tier"] for r in AG.threshold_alerts(
        df, "usd", {"whale": 1_000_000, "big": 100_000}
    ).collect()}
    assert out == {5e6: "whale", 2e5: "big"}


def test_percentile_summary_exact(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    row = AG.percentile_summary(df, "v").collect()[0]
    assert row["n"] == 100 and row["max"] == 100.0
    assert abs(row["p50"] - 50.5) < 1e-6


def test_rollup_share_sums_to_one(spark):
    df = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 20.0, 2), ("b", 70.0, 3)], "k string, v double, u long"
    )
    rows = AG.rollup_with_share(df, "k", "v", user_col="u").collect()
    assert abs(sum(r["market_share"] for r in rows) - 1.0) < 1e-6
    shares = {r["k"]: r["market_share"] for r in rows}
    assert abs(shares["b"] - 0.7) < 1e-6


def test_two_level_agg_equals_plain(spark, sf_dir):
    from bitquery_kafka_streams_rust_spark.datagen import sequences_view

    seq = sequences_view(spark, sf_dir)
    salted = SK.two_level_agg(
        seq, "source", "doc_id", {"n": ("count", "*"), "s": ("sum", "n_tok")}
    )
    plain = seq.groupBy("source").agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
    a = {(r["source"], r["n"], r["s"]) for r in salted.collect()}
    b = {(r["source"], r["n"], r["s"]) for r in plain.collect()}
    assert a == b


def test_targeted_two_level_agg_equals_plain(spark, sf_dir):
    """Hot-key-only salting: same answer as plain groupBy, but cold keys
    emit exactly ONE stage-1 partial (no blanket buckets-× fan-out)."""
    from bitquery_kafka_streams_rust_spark.datagen import sequences_view

    seq = sequences_view(spark, sf_dir)
    aggs = {"n": ("count", "*"), "s": ("sum", "n_tok")}
    plain = seq.groupBy("source").agg(F.count("*").alias("n"), F.sum("n_tok").alias("s"))
    b = {(r["source"], r["n"], r["s"]) for r in plain.collect()}

    # auto-detected hot keys (count-min heavy hitters)
    auto = SK.targeted_two_level_agg(seq, "source", "doc_id", aggs)
    assert {(r["source"], r["n"], r["s"]) for r in auto.collect()} == b

    # explicit hot key list (skips the detection scan)
    hot = [r["source"] for r in seq.groupBy("source").count().orderBy(F.desc("count")).limit(1).collect()]
    targ = SK.targeted_two_level_agg(seq, "source", "doc_id", aggs, hot_keys=hot, buckets=8)
    assert {(r["source"], r["n"], r["s"]) for r in targ.collect()} == b

    # cold keys: one partial each; only the hot key fans out
    stage1 = (
        seq.withColumn(
            "_salt",
            F.when(F.col("source").isin(hot), SK.salt_col("doc_id", 8)).otherwise(F.lit(0)),
        )
        .groupBy("source", "_salt")
        .count()
    )
    per_key = {r["source"]: r["n"] for r in stage1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for k, n in per_key.items():
        assert n == 1 or k in hot

    # no hot keys at all -> degenerate single-level (still correct)
    none = SK.targeted_two_level_agg(seq, "source", "doc_id", aggs, hot_keys=[])
    assert {(r["source"], r["n"], r["s"]) for r in none.collect()} == b


def test_windowed_stats_tumbling_vs_sliding(spark, sf_dir):
    from bitquery_kafka_streams_rust_spark.datagen import sequences_view

    seq = sequences_view(spark, sf_dir)
    tumb = AG.windowed_stats(seq, "ts", "10 minutes", by=["source"], value_col="n_tok")
    slide = AG.windowed_stats(seq, "ts", "10 minutes", slide="5 minutes", by=["source"], value_col="n_tok")
    n_t, n_s = tumb.count(), slide.count()
    assert n_t > 0 and n_s > n_t  # sliding produces ~2x windows
    # every row is counted once per tumbling window: totals match input
    assert tumb.agg(F.sum("n")).collect()[0][0] == seq.count()


def test_approx_sketches_near_exact(spark, sf_dir):
    """A4/A5 sketch variants (percentile_approx, approx_count_distinct)
    stay within tolerance of the exact forms — the mergeable single-pass
    path for the 100 TB scale."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = AG.percentile_summary(ev, "value", approx=True).collect()[0]
    exact = AG.percentile_summary(ev, "value").collect()[0]
    for q in ("p50", "p90", "p95", "p99"):
        assert abs(approx[q] - exact[q]) / max(abs(exact[q]), 1e-9) < 0.05
    a = ev.agg(F.approx_count_distinct("user_id")).collect()[0][0]
    e = ev.select("user_id").distinct().count()
    assert abs(a - e) / e < 0.05


def test_profile_table_one_pass(spark, sf_dir):
    """Profile values are right, and the whole multi-column profile is
    ONE aggregate over ONE scan (no per-column jobs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    prof = AG.profile_table(ev, ["event_type", "user_id"])
    rows = {r["col_name"]: r for r in prof.collect()}
    assert rows["event_type"]["n_rows"] == ev.count()
    assert rows["event_type"]["n_distinct"] == ev.select("event_type").distinct().count()
    assert rows["user_id"]["n_nonnull"] == ev.where(F.col("user_id").isNotNull()).count()
    assert rows["user_id"]["min_s"] == str(ev.agg(F.min("user_id")).collect()[0][0])
    # AdaptiveSparkPlan.toString prints final AND initial plans — count
    # scans in the final section only
    plan = prof._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    # sketch variant runs and bounds the exact distinct
    approx = {r["col_name"]: r["n_distinct"]
              for r in AG.profile_table(ev, ["user_id"], exact_distinct=False).collect()}
    assert abs(approx["user_id"] / rows["user_id"]["n_distinct"] - 1) < 0.1


def test_rollup_cascade_reaggregation_matches_direct(spark, sf_dir):
    """Each coarser level is derived from the finer level's partials;
    values must equal a direct group-by at that resolution (count/sum/
    min/max re-aggregability), and the whole cascade reads the input
    ONCE."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cas = AG.rollup_cascade(ev, "ts", "value", by=("event_type",),
                            levels=(60, 3600, 86400))
    hour = {
        (r["bucket_start"], r["event_type"]): r
        for r in cas.where(F.col("resolution_s") == 3600).collect()
    }
    direct = (
        ev.groupBy(
            ((F.unix_timestamp(F.col("ts")) / 3600).cast("long") * 3600).alias("b"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 3).alias("s"),
             F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    )
    assert len(direct) == len(hour)
    for r in direct:
        c = hour[(r["b"], r["event_type"])]
        assert c["n_events"] == r["n"]
        assert abs(c["sum_value"] - r["s"]) < 1e-6
        assert c["min_value"] == r["mn"] and c["max_value"] == r["mx"]
    # one scan total: coarser levels re-aggregate, never rescan.  The
    # dedup is AQE exchange reuse, so inspect the FINAL plan post-run.
    cas.collect()
    plan = cas._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert plan.count("Scan parquet") == 1
    assert plan.count("ReusedExchange") == 2


def test_rollup_cascade_rejects_bad_levels(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pytest as _pt
    with _pt.raises(ValueError):
        AG.rollup_cascade(ev, "ts", "value", levels=(3600, 60))
    with _pt.raises(ValueError):
        AG.rollup_cascade(ev, "ts", "value", levels=())


def _ab_expected(rows, frac_a=0.5):
    """Pure-Python twin of ab_test's moment arithmetic (stage-11 hash)."""
    salt = 11 * 0x9E3779B9
    arms = {}
    for uid, grp, val in rows:
        a = ((uid ^ salt) % 2**31) * 2654435761 % 2**31 / 2**31 < frac_a
        arms.setdefault(grp, {"A": [], "B": []})["A" if a else "B"].append(val)
    out = {}
    for grp, d in arms.items():
        na, nb = len(d["A"]), len(d["B"])
        ma = round(sum(d["A"]) / na, 9)
        mb = round(sum(d["B"]) / nb, 9)
        va = round((sum(v * v for v in d["A"]) - sum(d["A"]) ** 2 / na) / (na - 1), 9)
        vb = round((sum(v * v for v in d["B"]) - sum(d["B"]) ** 2 / nb) / (nb - 1), 9)
        z = round((ma - mb) / (va / na + vb / nb) ** 0.5, 6)
        out[grp] = (na, nb, round(ma, 6), round(mb, 6), round(ma - mb, 6), z)
    return out


def test_ab_test_matches_pure_python_moments(spark):
    rows = [(uid, "g%d" % (uid % 2), float((uid * 37) % 101) / 7.0)
            for uid in range(1, 201)]
    df = spark.createDataFrame(rows, "user_id long, grp string, value double")
    got = {r["grp"]: r for r in AG.ab_test(df, "user_id", "value", ["grp"]).collect()}
    exp = _ab_expected(rows)
    assert set(got) == set(exp)
    for g, (na, nb, ma, mb, lift, z) in exp.items():
        r = got[g]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["mean_a"] == ma and r["mean_b"] == mb
        assert r["lift"] == lift and r["z_welch"] == z


def test_ab_test_small_arm_emits_null_z(spark):
    # one unit per arm: counts/means emit, lift/z are NULL (var undefined)
    uids = [1, 2, 3]  # will hash into both arms at n>=1
    df = spark.createDataFrame([(u, float(u)) for u in uids],
                               "user_id long, value double")
    rows = AG.ab_test(df, "user_id", "value", []).collect()
    assert len(rows) == 1
    r = rows[0]
    if r["n_a"] < 2 or r["n_b"] < 2:
        assert r["z_welch"] is None and r["lift"] is None


def test_ab_test_single_exchange_partial_agg(spark):
    df = spark.createDataFrame([(u, "g", float(u)) for u in range(50)],
                               "user_id long, grp string, value double")
    out = AG.ab_test(df, "user_id", "value", ["grp"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    # map-side combine: partial+final HashAggregate around ONE exchange
    assert plan.count("Exchange") == 1
    assert "partial_" in plan
