"""streaming/markov_monitor.py: delta-emitting transition monitor —
stream-vs-batch exact parity and restart-identical resume."""

from __future__ import annotations

import os
import shutil

import pytest
import test_cep as TC
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.funnel import transition_matrix
from bitquery_kafka_streams_rust_spark.streaming.markov_monitor import (
    markov_stream,
    transition_totals,
)
from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

SCHEMA = TC.SCHEMA


def _batch_expected(spark, ev):
    return {
        (r["prev_state"], r["state"]): (r["n"], r["prob"])
        for r in transition_matrix(ev, "user_id", "ts", "event_type").collect()
    }


def _run(spark, src_dir, ck, out):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    src = stream.select(
        "user_id", F.unix_timestamp("ts").alias("x"), "event_id", "event_type"
    )
    q = (
        markov_stream(src, "user_id", "x", "event_type", "event_id")
        .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


@pytest.mark.watchdog_timeout(300)
def test_markov_stream_matches_batch_exact(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = TC._write_ordered_batches(spark, ev, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    _run(spark, in_dir, str(tmp_path / "ck"), out)
    deltas = spark.read.parquet(out).drop("batch_id")
    got = {
        (r["prev_state"], r["state"]): (r["n"], r["prob"])
        for r in transition_totals(deltas).collect()
    }
    assert got == _batch_expected(spark, ev)  # EXACT integer counts


@pytest.mark.watchdog_timeout(300)
def test_markov_stream_restart_identical(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = TC._write_ordered_batches(spark, ev, tmp_path, sub="full")
    half_dir = str(tmp_path / "half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))
    ck, out = str(tmp_path / "ck_r"), str(tmp_path / "out_r")
    _run(spark, half_dir, ck, out)  # ── kill after batch 0 ──
    for p in paths[1:]:
        shutil.copy2(p, os.path.join(half_dir, os.path.basename(p)))
    _run(spark, half_dir, ck, out)  # resume, same checkpoint
    deltas = spark.read.parquet(out).drop("batch_id")
    got = {
        (r["prev_state"], r["state"]): (r["n"], r["prob"])
        for r in transition_totals(deltas).collect()
    }
    assert got == _batch_expected(spark, ev)
