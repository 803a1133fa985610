"""Streaming SCD2 maintenance (streaming/scd2.py): closed-run emission
equals the batch builder's non-current rows; open runs live in state."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.cdc import scd2_build
from bitquery_kafka_streams_rust_spark.streaming import scd2 as S2

SCHEMA = "k long, ts_s long, op_id long, attr string"


def _obs(spark, sf_dir):
    """Canonical observation frame from the events fixture."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("user_id").alias("k"),
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("event_id").alias("op_id"),
        F.col("event_type").alias("attr"),
    )


def _write_ordered_batches(spark, df, tmp_path, n_batches=3):
    """Contiguous slices of the (ts_s, op_id) total order — later files
    carry later event times (the in-order delivery contract)."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base = _time.time() - 100
    rows = df.orderBy("ts_s", "op_id").collect()
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


def test_scd2_stream_matches_batch_closed_runs(spark, sf_dir, tmp_path):
    obs = _obs(spark, sf_dir)
    in_dir = _write_ordered_batches(spark, obs, tmp_path, n_batches=3)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        S2.scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["k"], r["attr"], r["effective_from_s"], r["effective_to_s"], r["version"])
        for r in spark.sql("SELECT * FROM scd2_out").collect()
    }
    dim = scd2_build(obs, ["k"], ["attr"], ["ts_s", "op_id"])
    closed = dim.where(~F.col("is_current"))
    expect = {
        (r["k"], r["attr"], r["effective_from"], r["effective_to"], r["version"])
        for r in closed.collect()
    }
    assert got == expect
    assert len(got) > 0
    # the open runs never emit: one per key, exactly the batch current set
    n_keys = obs.select("k").distinct().count()
    assert dim.where("is_current").count() == n_keys


def test_scd2_stream_null_attr_run(spark, tmp_path):
    """NULL attribute values form their own run (null-safe boundary),
    matching scd2_build's eqNullSafe collapse."""
    rows = [
        (1, 10, 100, "A"),
        (1, 20, 101, None),
        (1, 30, 102, None),
        (1, 40, 103, "B"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    in_dir = _write_ordered_batches(spark, df, tmp_path, n_batches=2)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        S2.scd2_stream(stream)
        .writeStream.format("memory")
        .queryName("scd2_null_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        (r["version"], r["attr"], r["effective_from_s"], r["effective_to_s"])
        for r in spark.sql("SELECT * FROM scd2_null_out").collect()
    )
    # closed runs: A[10,20) v1, NULL[20,40) v2; B stays open in state
    assert got == [(1, "A", 10, 20), (2, None, 20, 40)]
