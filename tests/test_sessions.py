"""Streaming session CEP (applyInPandasWithState + EventTimeTimeout):
closed sessions must equal the batch F.session_window aggregation."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark import datagen
from bitquery_kafka_streams_rust_spark.streaming.sessions import session_aggregate

T0 = datetime(2024, 1, 1)
SCHEMA = "source string, ts timestamp, n_tok int"


def batch_sessions(spark, df, gap_s):
    return {
        (r["source"], r["sess_start"], r["sess_end"], r["n"], r["sum_tok"])
        for r in (
            df.groupBy(F.session_window("ts", f"{gap_s} seconds").alias("w"), "source")
            .agg(F.count("*").alias("n"), F.sum("n_tok").alias("sum_tok"))
            .select(
                "source",
                F.col("w.start").alias("sess_start"),
                F.col("w.end").alias("sess_end"),
                "n",
                F.col("sum_tok").cast("long").alias("sum_tok"),
            )
            .collect()
        )
    }


def run_stream(spark, in_dir, ck, name, gap_s):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        session_aggregate(stream, gap_s=gap_s, watermark_s=300)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return {tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()}


def _write_batch(spark, rows, path):
    """Write one FLAT parquet file (the file stream source does not
    recurse into subdirectories)."""
    import glob
    import shutil

    stage = path + ".stage"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.move(glob.glob(f"{stage}/part-*.parquet")[0], path)
    shutil.rmtree(stage)


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Crafted sparse stream: 3 sessions for A close under the final
    watermark, the trailing ones stay open (append semantics)."""
    import os
    import time

    sec = lambda s: T0 + timedelta(seconds=s)
    b1 = [
        ("A", sec(0), 5),
        ("A", sec(10), 7),        # session A1: [0, 130)
        ("A", sec(1000), 1),
        ("A", sec(1005), 2),      # session A2: [1000, 1125)
        ("B", sec(3), 4),         # session B1: [3, 123)
    ]
    b2 = [
        ("A", sec(3000), 9),      # session A3: [3000, 3120)
        ("B", sec(2999), 1),      # session B2: [2999, 3119)
    ]
    b3 = [
        ("A", sec(5000), 3),      # open at end (watermark 4700)
        ("B", sec(5000), 3),      # open at end
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    base = time.time() - 100
    for i, rows in enumerate([b1, b2, b3]):
        p = f"{in_dir}/b{i}.parquet"
        _write_batch(spark, rows, p)
        os.utime(p, (base + i * 10, base + i * 10))

    got = run_stream(spark, in_dir, str(tmp_path / "ck"), "sess_crafted", gap_s=120)
    all_rows = spark.createDataFrame(b1 + b2 + b3, SCHEMA)
    expected_all = batch_sessions(spark, all_rows, 120)
    # closed = batch sessions whose end the final watermark (5000-300) passed
    expected_closed = {s for s in expected_all if s[2] <= T0 + timedelta(seconds=4700)}
    assert got == expected_closed
    assert len(got) == 5  # A1 A2 A3 B1 B2


def test_streaming_sessions_restart_identical(spark, tmp_path):
    import os
    import shutil

    full = str(tmp_path / "full")
    half = str(tmp_path / "half")
    paths = datagen.write_sequence_batches(spark, "/root/testdata/sf0.001", full, n_batches=4)
    os.makedirs(half)
    for p in paths[:2]:
        shutil.copy2(p, half)

    from bitquery_kafka_streams_rust_spark.streaming.sink import (
        ExactlyOnceParquetSink,
        read_output,
    )

    def run_seq(in_dir, ck, out):
        # memory sink cannot recover from a checkpoint; the engine's
        # exactly-once parquet sink is the recovery-capable path
        stream = (
            spark.readStream.schema(
                "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .select("source", "ts", "n_tok")
        )
        q = (
            session_aggregate(stream, gap_s=10, watermark_s=300)
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        df = read_output(
            spark, out,
            schema="source string, sess_start timestamp, sess_end timestamp, n long, sum_tok long, batch_id long",
        )
        return {
            (r["source"], r["sess_start"], r["sess_end"], r["n"], r["sum_tok"])
            for r in df.select("source", "sess_start", "sess_end", "n", "sum_tok").collect()
        }

    out_r = str(tmp_path / "out_r")
    run_seq(half, str(tmp_path / "ck_r"), out_r)
    for p in paths[2:]:
        shutil.copy2(p, half)
    resumed = run_seq(half, str(tmp_path / "ck_r"), out_r)  # resume same ckpt
    uninterrupted = run_seq(full, str(tmp_path / "ck_u"), str(tmp_path / "out_u"))
    assert resumed == uninterrupted
    assert len(uninterrupted) > 0  # phoenix's ~10s cadence closes sessions
