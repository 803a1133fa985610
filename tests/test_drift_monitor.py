"""Streaming centroid-drift monitor (streaming/drift_monitor.py):
exact batch parity of the integer-sum state, drift-over-time epochs."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.drift import centroid_drift
from bitquery_kafka_streams_rust_spark.streaming import drift_monitor as DM

SCHEMA = "vec_id long, embedding array<float>, label int"


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


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


def test_stream_drift_exact_batch_parity(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    old = emb.where(F.col("vec_id") % 10 != 0)
    new = emb.where(F.col("vec_id") % 10 != 1)
    in_dir = _write_batches(spark, new, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        DM.build_centroid_sum_stream(stream)
        .writeStream.foreachBatch(DM.CentroidDriftSink(old, out))
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
    expected = sorted(map(tuple, centroid_drift(old, new).collect()))
    assert got == expected  # EXACT: integer state == batch aggregate
    # earlier epochs saw strictly less of the stream
    first = hist.where(F.col("batch_id") == epochs[0])
    n_first = first.agg(F.sum("n_new")).first()[0]
    n_last = last.agg(F.sum("n_new")).first()[0]
    assert 0 < n_first < n_last == new.count()
