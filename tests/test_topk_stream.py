"""Streaming windowed top-k (streaming/topk.py): batch parity with the
events_windowed_topk contract query, tie-break semantics, restart."""

from __future__ import annotations

import os
import shutil

import pytest
import test_cep as TC
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.streaming.topk import windowed_topk_stream

SCHEMA = TC.SCHEMA


def _stream(spark, in_dir):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "300 seconds")
    )


def _rows(df):
    return sorted(
        (r["win_start_s"], r["event_type"], r["event_id"], r["value"], r["rk"])
        for r in df.collect()
        if r["event_type"] != "noop"
    )


@pytest.mark.watchdog_timeout(300)
def test_windowed_topk_stream_matches_batch(spark, sf_dir, tmp_path):
    """Once the watermark closes every window, the streamed top-3 per
    (10-min window, type) equals the batch WindowGroupLimit query
    bit-for-bit — micro-batch boundaries and the O(k) heap state must
    not change the ranking."""
    import __spark_entry__ as E

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = TC._with_flush_batches(spark, ev, tmp_path, sub="topk")
    q = (
        windowed_topk_stream(_stream(spark, in_dir))
        .writeStream.format("memory")
        .queryName("topk_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _rows(spark.sql("SELECT * FROM topk_stream"))
    want = _rows(E.queries()["events_windowed_topk"](spark, sf_dir))
    assert len(want) > 0
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_windowed_topk_stream_tiebreak_and_split_heap(spark, tmp_path):
    """Equal values rank by ascending id, and a window whose rows are
    SPLIT across micro-batches converges to the same heap (merge
    commutativity), including an eviction that a later batch re-fills."""
    from datetime import datetime

    rows_b0 = [
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "view", 5.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 0, 20), 1, "view", 5.0, "{}"),
    ]
    rows_b1 = [
        (2, datetime(2024, 1, 1, 0, 0, 30), 1, "view", 9.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 0, 40), 1, "view", 7.0, "{}"),
    ]
    import glob
    import time as _time

    in_dir = str(tmp_path / "tie")
    os.makedirs(in_dir)
    base = _time.time() - 100
    batches = [rows_b0, rows_b1,
               [(99, datetime(2024, 1, 3), -1, "noop", 0.0, "{}")],
               [(98, datetime(2024, 1, 4), -1, "noop", 0.0, "{}")]]
    for i, b in enumerate(batches):
        p = str(tmp_path / f"tie_stage_{i}")
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode("overwrite").parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i:02d}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))
    q = (
        windowed_topk_stream(_stream(spark, in_dir))
        .writeStream.format("memory")
        .queryName("topk_tie")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _rows(spark.sql("SELECT * FROM topk_tie"))
    # top-3 of values 5(id1) 5(id4) 9(id2) 7(id3): 9, 7, then 5 @ id 1
    # (the 5.0 tie breaks to the LOWER id, so batch 1's 9.0/7.0 rows
    # evict id4 — not id1 — from the k=3 heap carried across batches)
    win = got[0][0]
    assert got == sorted(
        [
            (win, "view", 2, 9.0, 1),
            (win, "view", 3, 7.0, 2),
            (win, "view", 1, 5.0, 3),
        ]
    )


@pytest.mark.watchdog_timeout(300)
def test_windowed_topk_stream_restart_identical(spark, sf_dir, tmp_path):
    """Kill after the first micro-batch, resume from checkpoint: heap
    state and window timers survive, output identical to an
    uninterrupted run."""
    from bitquery_kafka_streams_rust_spark.streaming import sink as S
    from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = TC._with_flush_batches(spark, ev, tmp_path, sub="full")
    half_dir = str(tmp_path / "half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))

    def run(in_dir, ck, out):
        q = (
            windowed_topk_stream(_stream(spark, in_dir))
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    ck_r, out_r = str(tmp_path / "ck_r"), str(tmp_path / "out_r")
    run(half_dir, ck_r, out_r)
    for p in paths[1:]:
        shutil.copy2(p, os.path.join(half_dir, os.path.basename(p)))
    run(half_dir, ck_r, out_r)

    ck_u, out_u = str(tmp_path / "ck_u"), str(tmp_path / "out_u")
    run(full_dir, ck_u, out_u)

    resumed = _rows(S.read_output(spark, out_r))
    uninterrupted = _rows(S.read_output(spark, out_u))
    assert len(uninterrupted) > 0
    assert resumed == uninterrupted
