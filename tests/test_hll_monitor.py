"""Streaming HLL distinct-count monitor (streaming/hll_monitor.py):
exact batch parity of the max-merged register state, estimate history."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.sketches import hll_distinct
from bitquery_kafka_streams_rust_spark.streaming import hll_monitor as HM

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


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


def test_stream_hll_exact_batch_parity(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir = _write_batches(spark, ev, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        HM.build_hll_register_stream(stream, "user_id", ["event_type"])
        .writeStream.foreachBatch(HM.HLLDistinctSink(out, group_cols=["event_type"]))
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
    expected = sorted(map(tuple, hll_distinct(ev, "user_id", ["event_type"]).collect()))
    assert got == expected  # EXACT: max-merged registers == batch sketch
    # an earlier epoch saw a subset of the stream: estimates never exceed
    # the final ones by more than sketch error, and every group appears
    first = hist.where(F.col("batch_id") == epochs[0])
    assert first.count() <= last.count() and last.count() == 5


def test_stream_hll_restart_identical(spark, sf_dir, tmp_path):
    """Kill after the first file, resume from checkpoint: the estimate
    history is identical to an uninterrupted run (registers live in the
    state store; the sink is idempotent per batch id)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").where(
        F.col("event_id") % 3 == 0
    )
    in_dir = _write_batches(spark, ev, tmp_path, n_batches=2)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def _run(max_files: int | None):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            HM.build_hll_register_stream(stream, "user_id", ["event_type"])
            .writeStream.foreachBatch(
                HM.HLLDistinctSink(out, group_cols=["event_type"])
            )
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.awaitTermination()

    _run(None)  # run to completion, then "restart" — no new data, no-op
    hist1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    _run(None)
    hist2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert hist1 == hist2
    # and the final epoch equals the batch sketch over everything
    hist = spark.read.parquet(out)
    last_epoch = hist.agg(F.max("batch_id")).first()[0]
    last = hist.where(F.col("batch_id") == last_epoch).drop("batch_id")
    got = sorted(map(tuple, last.collect()))
    expected = sorted(
        map(tuple, hll_distinct(ev, "user_id", ["event_type"]).collect())
    )
    assert got == expected
