"""streaming/cusum_monitor.py: online fixed-target CUSUM — textbook
recursion check of the batch target mode, stream-vs-batch exact
parity across micro-batch boundaries, restart-identical resume,
bounded per-key state."""

from __future__ import annotations

import os
import shutil

import pytest
import test_cep as TC
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import drift as DR
from bitquery_kafka_streams_rust_spark.operators.sampling import _round_half_up
from bitquery_kafka_streams_rust_spark.streaming.cusum_monitor import cusum_stream
from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

SCHEMA = TC.SCHEMA
TARGET, K, H = 50.0, 2.0, 100.0


def _py_cusum_target(vals, xs, target, k, h, scale=1000):
    """Page's recursion vs a fixed level, on the operator's grid."""
    tq, kq, hq = round(target * scale), round(k * scale), round(h * scale)
    sh = sl = 0
    n_hi = n_lo = 0
    first_hi = first_lo = -1
    max_hi = max_lo = 0
    for x, v in zip(xs, vals):
        e = int(_round_half_up(float(v) * scale, 0)) - tq
        sh = max(0, sh + e - kq)
        sl = max(0, sl - e - kq)
        max_hi, max_lo = max(max_hi, sh), max(max_lo, sl)
        if sh > hq:
            n_hi += 1
            if first_hi < 0:
                first_hi = x
        if sl > hq:
            n_lo += 1
            if first_lo < 0:
                first_lo = x
    d = float(scale)
    return (len(vals), n_hi, n_lo, first_hi, first_lo,
            _round_half_up(max_hi / d, 6), _round_half_up(max_lo / d, 6))


def test_batch_target_mode_matches_recursion(spark):
    series = {
        "up": [49.0] * 10 + [260.0] * 6,       # level shift → hi alarms
        "down": [50.2] * 8 + [1.0] * 10,       # downward → lo alarms
        "flat": [49.8, 50.3, 49.9, 50.1] * 6,  # within k of target
    }
    rows = [
        (g, i, i, v) for g, vals in series.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, tb long, v double")
    out = DR.cusum_changepoint(
        df, ["grp"], "x", "v", "tb", k=K, h=H, target=TARGET
    )
    got = {r["grp"]: tuple(r)[1:] for r in out.collect()}
    for g, vals in series.items():
        assert got[g] == _py_cusum_target(
            vals, list(range(len(vals))), TARGET, K, H
        ), g
    assert got["up"][1] > 0 and got["down"][2] > 0
    assert got["flat"][1] == 0 and got["flat"][2] == 0


def _batch_expected(spark, ev):
    pts = ev.select(
        "event_type", F.unix_timestamp("ts").alias("x"), "event_id", "value"
    )
    return {
        r["event_type"]: tuple(r)[1:]
        for r in DR.cusum_changepoint(
            pts, ["event_type"], "x", "value", "event_id",
            k=K, h=H, target=TARGET,
        ).collect()
    }


def _last_per_key(df):
    # the monitor's n is monotone per key: max-n row == final state
    rows = {}
    for r in df.collect():
        if r["key"] not in rows or r["n"] > rows[r["key"]][0]:
            rows[r["key"]] = tuple(r)[1:]
    return rows


@pytest.mark.watchdog_timeout(300)
def test_cusum_stream_matches_batch_exact(spark, sf_dir, tmp_path):
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
        cusum_stream(
            src, "event_type", "x", "value", "event_id",
            target=TARGET, k=K, h=H,
        )
        .writeStream.format("memory")
        .queryName("cusum_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _last_per_key(spark.sql("SELECT * FROM cusum_stream"))
    want = _batch_expected(spark, ev)
    assert got == want  # EXACT: long state == batch closed form
    # every key alarmed or accumulated something on this fixture
    assert sum(v[0] for v in got.values()) == ev.count()


@pytest.mark.watchdog_timeout(300)
def test_cusum_stream_restart_identical(spark, sf_dir, tmp_path):
    """Kill after the first micro-batch, resume from checkpoint: final
    per-key readout identical to the batch operator (the nine-long
    state survives the restart)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = TC._write_ordered_batches(spark, ev, tmp_path, sub="full")
    half_dir = str(tmp_path / "half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))

    ck, out = str(tmp_path / "ck_r"), str(tmp_path / "out_r")

    def run():
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
            cusum_stream(
                src, "event_type", "x", "value", "event_id",
                target=TARGET, k=K, h=H,
            )
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
    got = _last_per_key(spark.read.parquet(out).drop("batch_id"))
    assert got == _batch_expected(spark, ev)
