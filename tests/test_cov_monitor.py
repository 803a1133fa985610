"""streaming/cov_monitor.py: exact batch parity of the covariance
moment state, epoch monotonicity, restart no-op idempotence."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.pca import embedding_covariance
from bitquery_kafka_streams_rust_spark.streaming import cov_monitor as CM

SCHEMA = "vec_id long, embedding array<float>, label int"


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


def _run(spark, in_dir, out, ck):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        CM.build_cov_moment_stream(stream)
        .writeStream.foreachBatch(CM.CovarianceReadoutSink(out))
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()


def test_stream_cov_exact_batch_parity(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    in_dir = _write_batches(spark, emb, tmp_path, n_batches=3)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, in_dir, out, ck)
    hist = spark.read.parquet(out)
    epochs = sorted(
        r["batch_id"] for r in hist.select("batch_id").distinct().collect()
    )
    assert len(epochs) == 3
    last = hist.where(F.col("batch_id") == epochs[-1]).drop("batch_id")
    got = sorted(map(tuple, last.collect()))
    want = sorted(map(tuple, embedding_covariance(emb).collect()))
    assert len(got) == 64 * 65 // 2
    assert got == want  # EXACT: long moment state == batch aggregate
    # each epoch's diagonal mass grows with the data seen
    diag = (
        hist.where(F.col("i") == F.col("j"))
        .groupBy("batch_id")
        .agg(F.sum("cov").alias("tr"))
        .collect()
    )
    assert {r["batch_id"] for r in diag} == set(epochs)


def test_stream_cov_restart_noop_identical(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") % 2 == 0
    )
    in_dir = _write_batches(spark, emb, tmp_path, n_batches=2)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, in_dir, out, ck)
    h1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    _run(spark, in_dir, out, ck)  # restart, no new data: idempotent
    h2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert h1 == h2
