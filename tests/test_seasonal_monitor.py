"""streaming/seasonal_monitor.py: exact batch parity of the
calendar-bucket integer state."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.timeseries import seasonal_profile
from bitquery_kafka_streams_rust_spark.streaming import seasonal_monitor as SM

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


def test_seasonal_stream_exact_batch_parity(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir = _write_batches(spark, ev, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        SM.build_seasonal_moment_stream(stream, "event_type", "ts", "value")
        .writeStream.foreachBatch(SM.SeasonalReadoutSink(out))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    hist = spark.read.parquet(out)
    epochs = sorted(
        r["batch_id"] for r in hist.select("batch_id").distinct().collect()
    )
    assert len(epochs) == 3
    last = hist.where(F.col("batch_id") == epochs[-1]).drop("batch_id")
    got = sorted(map(tuple, last.collect()))
    expected = sorted(
        map(
            tuple,
            seasonal_profile(ev, "event_type", "ts", "value")
            .withColumnRenamed("event_type", "key")
            .collect(),
        )
    )
    assert got == expected  # EXACT: integer state == batch aggregate
    # earlier epochs saw strictly less of the stream
    first = hist.where(F.col("batch_id") == epochs[0])
    assert (
        0
        < first.agg(F.sum("n")).first()[0]
        < last.agg(F.sum("n")).first()[0]
        == ev.count()
    )
