"""Group-wise OLS via exact integer moments (operators/regress.py) and
its streaming twin (streaming/trend_monitor.py)."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import regress as RG
from bitquery_kafka_streams_rust_spark.streaming import trend_monitor as TM


def test_ols_exact_line(spark):
    # y = 2x + 1 exactly: slope 2, intercept 1, r2 1 in every group
    rows = [("g", x, 2.0 * x + 1.0) for x in range(10)] + [
        ("h", x, -0.5 * x + 3.0) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    got = {r["grp"]: r for r in RG.group_ols(df, "x", "y", ["grp"]).collect()}
    assert (got["g"]["slope"], got["g"]["intercept"], got["g"]["r2"]) == (2.0, 1.0, 1.0)
    assert (got["h"]["slope"], got["h"]["intercept"], got["h"]["r2"]) == (-0.5, 3.0, 1.0)
    assert got["g"]["n"] == 10 and got["h"]["n"] == 5


def test_ols_matches_closed_form_with_noise(spark):
    # deterministic pseudo-noise; compare against the same grid
    # arithmetic in pure Python (value quantization included)
    pts = [(x, 3.0 * x - 7.0 + ((x * 37) % 11 - 5) / 3.0) for x in range(50)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts], "grp string, x long, y double")
    r = RG.group_ols(df, "x", "y", ["grp"]).collect()[0]
    qy = [round(y * 1000) for _, y in pts]
    xs = [x for x, _ in pts]
    n = float(len(pts))
    sx, sy = float(sum(xs)), float(sum(qy))
    sxx, syy = float(sum(x * x for x in xs)), float(sum(q * q for q in qy))
    sxy = float(sum(x * q for x, q in zip(xs, qy)))
    cov_n, var_x_n, var_y_n = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert r["slope"] == round(cov_n / var_x_n * 1.0 / 1000.0, 12)
    assert r["intercept"] == round((sy - cov_n / var_x_n * sx) / n / 1000.0, 6)
    assert r["r2"] == round(cov_n * cov_n / (var_x_n * var_y_n), 6)


def test_ols_degenerate_groups_null(spark):
    rows = [("one", 5, 1.0),  # n = 1
            ("flat", 3, 1.0), ("flat", 3, 2.0),  # zero x-variance
            ("consty", 1, 4.0), ("consty", 2, 4.0)]  # zero y-variance
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    got = {r["grp"]: r for r in RG.group_ols(df, "x", "y", ["grp"]).collect()}
    assert got["one"]["slope"] is None and got["one"]["r2"] is None
    assert got["flat"]["slope"] is None and got["flat"]["intercept"] is None
    # zero y-variance: the fit line is flat (slope 0) but r2 is 0/0
    assert got["consty"]["slope"] == 0.0 and got["consty"]["r2"] is None


def test_ols_moments_readout_composition(spark):
    # group_ols == ols_readout(ols_moments(...)) and the moment sums
    # merge across arbitrary row splits (the streaming-state property)
    rows = [("g", x, 2.5 * x - 3.0 + (x % 7) / 9.0) for x in range(30)]
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    whole = RG.ols_moments(df, "x", "y", ["grp"]).collect()[0]
    a = RG.ols_moments(df.where("x < 11"), "x", "y", ["grp"]).collect()[0]
    b = RG.ols_moments(df.where("x >= 11"), "x", "y", ["grp"]).collect()[0]
    for c in ("n", "_sx", "_sy", "_sxx", "_syy", "_sxy"):
        assert whole[c] == a[c] + b[c]
    assert (
        RG.group_ols(df, "x", "y", ["grp"]).collect()
        == RG.ols_readout(RG.ols_moments(df, "x", "y", ["grp"]), ["grp"]).collect()
    )


def _write_batches(spark, df, tmp_path, n_batches=3):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base = _time.time() - 100
    rows = df.collect()
    per = -(-len(rows) // n_batches)
    for b in range(n_batches):
        part = rows[b * per : (b + 1) * per]
        p = str(tmp_path / f"stage_{b}")
        spark.createDataFrame(part, df.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/b{b:02d}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + b * 10, base + b * 10))
    return in_dir


def test_stream_trend_exact_batch_parity(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        "event_type",
        (F.unix_timestamp("ts") - F.lit(1704067200)).alias("x"),
        "value",
    )
    in_dir = _write_batches(spark, pts, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("event_type string, x long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        TM.build_ols_moment_stream(stream, "x", "value", ["event_type"])
        .writeStream.foreachBatch(TM.TrendReadoutSink(out, ["event_type"]))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    hist = spark.read.parquet(out)
    epochs = sorted(r["batch_id"] for r in hist.select("batch_id").distinct().collect())
    assert len(epochs) == 3
    last = hist.where(F.col("batch_id") == epochs[-1]).drop("batch_id")
    got = sorted(map(tuple, last.collect()))
    expected = sorted(
        map(tuple, RG.group_ols(pts, "x", "value", ["event_type"]).collect())
    )
    assert got == expected  # EXACT: integer state == batch aggregate
    # earlier epochs saw strictly less of the stream
    n_first = hist.where(F.col("batch_id") == epochs[0]).agg(F.sum("n")).first()[0]
    n_last = last.agg(F.sum("n")).first()[0]
    assert 0 < n_first < n_last == pts.count()


def test_ols_single_exchange_partial_agg(spark):
    df = spark.createDataFrame(
        [("g", x, float(x)) for x in range(20)], "grp string, x long, y double"
    )
    out = RG.group_ols(df, "x", "y", ["grp"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1
    assert "partial_" in plan
