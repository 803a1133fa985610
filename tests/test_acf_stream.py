"""streaming/acf_monitor.py: online lag-k autocorrelation — hand
recursion check, stream-vs-batch exact parity across micro-batch
boundaries, restart-identical resume."""

from __future__ import annotations

import os
import shutil

import pytest
import test_cep as TC
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import timeseries as TS
from bitquery_kafka_streams_rust_spark.streaming.acf_monitor import acf_stream
from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

SCHEMA = TC.SCHEMA
LAGS = (1, 2, 3)


def _batch_expected(spark, ev):
    return {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in TS.acf(ev, "event_type", "ts", "value", lags=LAGS).collect()
    }


def _last_per_key_lag(rows):
    got = {}
    for r in rows:
        k = (r["key"], r["lag"])
        if k not in got or r["n_pairs"] > got[k][0]:
            got[k] = (r["n_pairs"], r["acf"])
    return got


def test_acf_stream_small_series_matches_batch(spark, tmp_path):
    # single-file stream of a hand series == the batch twin exactly
    import datetime as dt
    import glob

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=i), 7, "g", float(v), "{}")
         for i, v in enumerate([1, 2, 1, 3, 2, 4, 3, 5])],
        SCHEMA,
    )
    stage = str(tmp_path / "stage")
    ev.coalesce(1).write.parquet(stage)
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    shutil.copy2(glob.glob(f"{stage}/part-*.parquet")[0], f"{in_dir}/b0.parquet")
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    src = stream.select(
        "event_type", F.unix_timestamp("ts").alias("x"), "event_id", "value"
    )
    q = (
        acf_stream(src, "event_type", "x", "value", "event_id", lags=(1, 2))
        .writeStream.format("memory")
        .queryName("acf_small")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _last_per_key_lag(spark.sql("SELECT * FROM acf_small").collect())
    want = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
        for r in TS.acf(ev, "event_type", "ts", "value", lags=(1, 2)).collect()
    }
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_acf_stream_matches_batch_exact(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = TC._write_ordered_batches(spark, ev, tmp_path, n_batches=3)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    src = stream.select(
        "event_type", F.unix_timestamp("ts").alias("x"), "event_id", "value"
    )
    q = (
        acf_stream(src, "event_type", "x", "value", "event_id", lags=LAGS)
        .writeStream.format("memory")
        .queryName("acf_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _last_per_key_lag(spark.sql("SELECT * FROM acf_stream").collect())
    want = _batch_expected(spark, ev)
    assert got == want  # EXACT: integer moment state == batch aggregate


@pytest.mark.watchdog_timeout(300)
def test_acf_stream_restart_identical(spark, sf_dir, tmp_path):
    """Kill after the first micro-batch, resume from checkpoint: the
    ring buffer + moments survive, final readout == batch."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = TC._write_ordered_batches(spark, ev, tmp_path, sub="full")
    half_dir = str(tmp_path / "half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))

    ck, out = str(tmp_path / "ck_r"), str(tmp_path / "out_r")

    def run():
        # memory sink can't resume a checkpoint — use the parquet sink
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(half_dir)
        )
        src = stream.select(
            "event_type", F.unix_timestamp("ts").alias("x"),
            "event_id", "value",
        )
        q = (
            acf_stream(src, "event_type", "x", "value", "event_id", lags=LAGS)
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()  # ── kill after batch 0 ──
    for p in paths[1:]:
        shutil.copy2(p, os.path.join(half_dir, os.path.basename(p)))
    run()  # resume, same checkpoint
    got = _last_per_key_lag(
        spark.read.parquet(out).drop("batch_id").collect()
    )
    assert got == _batch_expected(spark, ev)
