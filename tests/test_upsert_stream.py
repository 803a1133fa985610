"""Streaming materialized upsert view (streaming/upsert.py): changelog
emission, batch parity, order-insensitivity, restart identity."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bitquery_kafka_streams_rust_spark.operators import cdc
from bitquery_kafka_streams_rust_spark.streaming import upsert as UP

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"

def _derive_log(ev):
    """events -> canonical CDC log (same arithmetic batch and stream)."""
    op = (
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    return ev.select(
        F.col("user_id").alias("k"),
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("event_id").alias("op_id"),
        op.alias("op"),
        "value",
    )


def _write_batches(spark, ev, tmp_path, n_batches=3, sub="in", ascending=True):
    """Events split into parquet micro-batch files; ``ascending=False``
    delivers the log in REVERSE time order (stress order-insensitivity)."""
    order = (
        [F.asc("ts"), F.asc("event_id")]
        if ascending
        else [F.desc("ts"), F.desc("event_id")]
    )
    n = ev.count()
    per = -(-n // n_batches)
    ordered = ev.withColumn("_rn", F.row_number().over(Window.orderBy(*order)))
    in_dir = str(tmp_path / sub)
    os.makedirs(in_dir)
    base = _time.time() - 100
    paths = []
    for b in range(n_batches):
        part = ordered.where(
            (F.col("_rn") > b * per) & (F.col("_rn") <= (b + 1) * per)
        ).drop("_rn")
        p = str(tmp_path / f"{sub}_stage_{b}")
        part.coalesce(1).write.mode("overwrite").parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/b{b:02d}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + b * 10, base + b * 10))
        paths.append(dst)
    return in_dir, paths


def _run_stream(spark, in_dir, name):
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    out = UP.compact_log_stream(_derive_log(stream), key_col="k")
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


def _view_rows(changelog):
    return sorted(
        tuple(r)
        for r in UP.apply_changelog(changelog)
        .select("k", "ts_s", "op_id", "value", "n_ops")
        .collect()
    )


def _batch_rows(spark, ev):
    return sorted(
        tuple(r)
        for r in cdc.compact_log(_derive_log(ev), ["k"], ["ts_s", "op_id"])
        .select("k", "ts_s", "op_id", "value", "n_ops")
        .collect()
    )


@pytest.mark.watchdog_timeout(300)
def test_upsert_stream_matches_batch_compaction(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _write_batches(spark, ev, tmp_path)
    changelog = _run_stream(spark, in_dir, "upsert_ordered")
    want = _batch_rows(spark, ev)
    assert len(want) > 0
    assert _view_rows(changelog) == want


@pytest.mark.watchdog_timeout(300)
def test_upsert_stream_order_insensitive(spark, sf_dir, tmp_path):
    """Latest-wins is commutative: delivering the log newest-first
    converges to the identical snapshot (no watermark contract)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _write_batches(spark, ev, tmp_path, ascending=False, sub="rev")
    changelog = _run_stream(spark, in_dir, "upsert_reversed")
    assert _view_rows(changelog) == _batch_rows(spark, ev)


def test_upsert_stream_changelog_sized_and_tombstones(spark, tmp_path):
    """A key untouched by a batch emits nothing; a key whose current op
    is D is absent from the applied view."""
    from datetime import datetime

    rows_b0 = [
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "signup", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 0, 20), 2, "click", 2.0, "{}"),
    ]
    rows_b1 = [
        (3, datetime(2024, 1, 1, 0, 0, 30), 2, "error", 0.0, "{}"),  # delete key 2
    ]
    in_dir = str(tmp_path / "mini")
    os.makedirs(in_dir)
    for i, rows in enumerate((rows_b0, rows_b1)):
        p = str(tmp_path / f"mini_stage_{i}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i:02d}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (_time.time() - 100 + i * 10,) * 2)
    changelog = _run_stream(spark, in_dir, "upsert_mini")
    emitted = changelog.collect()
    # batch0 emits keys {1,2}; batch1 touches only key 2 -> 3 rows total
    assert len(emitted) == 3
    assert sum(1 for r in emitted if r["k"] == 1) == 1
    view = {r["k"]: r for r in UP.apply_changelog(changelog).collect()}
    assert set(view) == {1}  # key 2 tombstoned
    assert view[1]["value"] == 1.0 and view[1]["n_ops"] == 1


@pytest.mark.watchdog_timeout(300)
def test_upsert_stream_restart_identical(spark, sf_dir, tmp_path):
    """Kill after the first micro-batch, resume from checkpoint: the
    full changelog (not just the folded view) is identical to an
    uninterrupted run."""
    from bitquery_kafka_streams_rust_spark.streaming import sink as S
    from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = _write_batches(spark, ev, tmp_path, sub="full")
    half_dir = str(tmp_path / "half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))

    def run(in_dir, ck, out):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            UP.compact_log_stream(_derive_log(stream), key_col="k")
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    ck_r, out_r = str(tmp_path / "ck_r"), str(tmp_path / "out_r")
    run(half_dir, ck_r, out_r)  # ── kill after batch 0 ──
    for p in paths[1:]:
        shutil.copy2(p, os.path.join(half_dir, os.path.basename(p)))
    run(half_dir, ck_r, out_r)  # resume, same checkpoint

    ck_u, out_u = str(tmp_path / "ck_u"), str(tmp_path / "out_u")
    run(full_dir, ck_u, out_u)

    def rows(out):
        return sorted(tuple(r) for r in S.read_output(spark, out).collect())

    r, u = rows(out_r), rows(out_u)
    assert len(u) > 0
    assert r == u
