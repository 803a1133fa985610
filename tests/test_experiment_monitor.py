"""Streaming A/B experiment monitor (streaming/experiment_monitor.py):
exact batch parity of the integer-grid moment state, significance
history over epochs."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import aggregates as AG
from bitquery_kafka_streams_rust_spark.streaming import experiment_monitor as EM

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"


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


def test_stream_ab_exact_batch_parity(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir = _write_batches(spark, ev, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        EM.build_ab_moment_stream(stream, "user_id", "value", ["event_type"])
        .writeStream.foreachBatch(EM.ABReadoutSink(out, ["event_type"]))
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
    # the batch twin over the SAME quantized arithmetic
    expected = sorted(
        map(tuple, AG.ab_readout(
            AG.ab_moments(ev, "user_id", "value", ["event_type"]), ["event_type"]
        ).collect())
    )
    assert got == expected  # EXACT: integer state == batch aggregate
    # earlier epochs saw strictly less of the stream
    first = hist.where(F.col("batch_id") == epochs[0])
    n_first = first.agg(F.sum(F.col("n_a") + F.col("n_b"))).first()[0]
    n_last = last.agg(F.sum(F.col("n_a") + F.col("n_b"))).first()[0]
    assert 0 < n_first < n_last == ev.count()


def test_quantized_readout_tracks_raw_ab_test(spark, sf_dir):
    # at scale=1e6 the quantized readout equals the raw ab_test to
    # well inside the 6-dp output rounding on this fixture
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = {r["event_type"]: r for r in
           AG.ab_test(ev, "user_id", "value", ["event_type"]).collect()}
    qz = {r["event_type"]: r for r in
          AG.ab_readout(AG.ab_moments(ev, "user_id", "value", ["event_type"]),
                        ["event_type"]).collect()}
    assert set(raw) == set(qz)
    for k in raw:
        assert (raw[k]["n_a"], raw[k]["n_b"]) == (qz[k]["n_a"], qz[k]["n_b"])
        assert abs(raw[k]["mean_a"] - qz[k]["mean_a"]) < 1e-5
        assert abs(raw[k]["z_welch"] - qz[k]["z_welch"]) < 1e-3
