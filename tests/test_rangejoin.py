"""Bucketed interval join (operators/rangejoin.py): semantics vs the
naive range join, boundary behavior, and the no-NLJ plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.rangejoin import bucketed_interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _frames(spark):
    # intervals: [0, 30), [25, 55), [10, 130) — the last spans 5 buckets
    ivs = spark.createDataFrame(
        [(1, _ts(0), _ts(30)), (2, _ts(25), _ts(55)), (3, _ts(10), _ts(130))],
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    # points at boundaries: 0 (== start of 1), 30 (== end of 1, excluded
    # there but inside 2 and 3), 29.999, 54, 129, 130 (outside all)
    pts = spark.createDataFrame(
        [
            (10, _ts(0)),
            (11, _ts(30)),
            (12, _ts(29.999)),
            (13, _ts(54)),
            (14, _ts(129)),
            (15, _ts(130)),
        ],
        "pt_id long, ts timestamp",
    )
    return pts, ivs


def _naive(pts, ivs):
    return pts.crossJoin(ivs).where(
        (F.col("start_ts") <= F.col("ts")) & (F.col("ts") < F.col("end_ts"))
    )


@pytest.mark.parametrize("bucket_s", [60, 1800, 7200])
def test_matches_naive_range_join_at_any_bucket_width(spark, bucket_s):
    pts, ivs = _frames(spark)
    got = sorted(
        map(
            tuple,
            bucketed_interval_join(pts, ivs, bucket_s=bucket_s)
            .select("pt_id", "iv_id")
            .collect(),
        )
    )
    want = sorted(map(tuple, _naive(pts, ivs).select("pt_id", "iv_id").collect()))
    assert got == want
    assert len(got) > 0


def test_boundary_semantics(spark):
    """start inclusive, end exclusive."""
    pts, ivs = _frames(spark)
    pairs = {
        (r["pt_id"], r["iv_id"])
        for r in bucketed_interval_join(pts, ivs).select("pt_id", "iv_id").collect()
    }
    assert (10, 1) in pairs  # ts == start included
    assert (11, 1) not in pairs  # ts == end excluded
    assert (11, 2) in pairs and (11, 3) in pairs
    assert all(p != 15 for p, _ in pairs)  # outside every interval


def test_no_duplicate_pairs_when_interval_spans_buckets(spark):
    pts, ivs = _frames(spark)
    out = bucketed_interval_join(pts, ivs, bucket_s=60).select("pt_id", "iv_id")
    assert out.count() == out.distinct().count()


def test_plan_is_equi_join_not_nlj(spark):
    pts, ivs = _frames(spark)
    plan = (
        bucketed_interval_join(pts, ivs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_inverted_interval_matches_nothing_and_does_not_fan_out(spark):
    pts, _ = _frames(spark)
    bad = spark.createDataFrame(
        [(9, _ts(100000), _ts(0))],  # end << start: would descend 100k min
        "iv_id long, start_ts timestamp, end_ts timestamp",
    )
    out = bucketed_interval_join(pts, bad, bucket_s=60)
    assert out.count() == 0


@pytest.mark.watchdog_timeout(300)
def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """interval_join_stream: both sides streaming, watermarked, range
    condition inside the join — output pairs equal the batch join."""
    from bitquery_kafka_streams_rust_spark.operators.rangejoin import (
        interval_join_stream,
    )

    pts, ivs = _frames(spark)
    p_dir, i_dir = str(tmp_path / "p"), str(tmp_path / "i")
    pts.coalesce(1).write.parquet(p_dir)
    ivs.coalesce(1).write.parquet(i_dir)
    ps = spark.readStream.schema(pts.schema).parquet(p_dir)
    vs = spark.readStream.schema(ivs.schema).parquet(i_dir)
    out = interval_join_stream(
        ps, vs, bucket_s=1800, watermark_s=300, max_interval_s=7200
    ).select("pt_id", "iv_id")
    q = (
        out.writeStream.format("memory")
        .queryName("rj_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT pt_id, iv_id FROM rj_stream").collect())
    )
    want = sorted(
        map(
            tuple,
            bucketed_interval_join(pts, ivs, bucket_s=1800)
            .select("pt_id", "iv_id")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def _ev_frames(spark, sf="/root/testdata/sf0.001"):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ivs = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    pts = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "ts", "value"
    )
    return pts, ivs


_PTS_SCHEMA = "purchase_id long, ts timestamp, value double"
_IVS_SCHEMA = "signup_id long, start_ts timestamp, end_ts timestamp"


def _pairs_of(rows):
    return sorted((r["signup_id"], r["purchase_id"]) for r in rows)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream twin == batch bucketed interval join on the same
    input (single micro-batch per side: nothing is watermark-late), so
    the state-bounded streaming form is semantics-identical."""
    from bitquery_kafka_streams_rust_spark.operators.rangejoin import (
        interval_join_stream,
    )

    pts, ivs = _ev_frames(spark)
    p_dir, i_dir = str(tmp_path / "pts"), str(tmp_path / "ivs")
    pts.coalesce(1).write.mode("overwrite").parquet(p_dir)
    ivs.coalesce(1).write.mode("overwrite").parquet(i_dir)

    out = interval_join_stream(
        spark.readStream.schema(_PTS_SCHEMA).parquet(p_dir),
        spark.readStream.schema(_IVS_SCHEMA).parquet(i_dir),
        bucket_s=1800,
        watermark_s=300,
        max_interval_s=1800,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ij_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = _pairs_of(spark.sql("SELECT signup_id, purchase_id FROM ij_stream").collect())
    want = _pairs_of(
        bucketed_interval_join(
            pts, ivs, point_ts="ts", start_col="start_ts", end_col="end_ts",
            bucket_s=1800, max_interval_s=1800,
        ).collect()
    )
    assert len(want) > 0
    assert got == want


def test_interval_join_stream_restart_identical(spark, tmp_path):
    """T9 for the interval join: kill after the points side's first
    micro-batch, resume from checkpoint — the watermark-bounded join
    state survives and the final pair set matches an uninterrupted run
    (pins the state-cleanup claim: event-time conjuncts let Spark
    evict, and eviction never loses a still-matchable pair)."""
    import glob
    import os
    import shutil
    import time as _time

    from pyspark.sql import Window
    from pyspark.sql import functions as SF

    from bitquery_kafka_streams_rust_spark.operators.rangejoin import (
        interval_join_stream,
    )
    from bitquery_kafka_streams_rust_spark.streaming import sink as SNK
    from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

    pts, ivs = _ev_frames(spark)
    i_dir = str(tmp_path / "ivs")
    ivs.coalesce(1).write.mode("overwrite").parquet(i_dir)
    # points in two event-time-ordered files (in-order arrival contract)
    full_dir = str(tmp_path / "pts_full")
    os.makedirs(full_dir)
    n = pts.count()
    ordered = pts.withColumn(
        "_rn", SF.row_number().over(Window.orderBy("ts", "purchase_id"))
    )
    base = _time.time() - 100
    paths = []
    for b in range(2):
        half = ordered.where(
            (SF.col("_rn") > b * -(-n // 2)) & (SF.col("_rn") <= (b + 1) * -(-n // 2))
        ).drop("_rn")
        stage = str(tmp_path / f"pstage_{b}")
        half.coalesce(1).write.mode("overwrite").parquet(stage)
        f = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{full_dir}/b{b}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + b * 10, base + b * 10))
        paths.append(dst)

    def run(p_dir, ck, out_dir):
        out = interval_join_stream(
            spark.readStream.schema(_PTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(p_dir),
            spark.readStream.schema(_IVS_SCHEMA).parquet(i_dir),
            bucket_s=1800,
            watermark_s=300,
            max_interval_s=1800,
        ).select("signup_id", "purchase_id", "value")
        q = (
            out.writeStream.foreachBatch(ExactlyOnceParquetSink(out_dir, lineage=False))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    half_dir = str(tmp_path / "pts_half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))
    ck_r, out_r = str(tmp_path / "ck_r"), str(tmp_path / "out_r")
    run(half_dir, ck_r, out_r)  # ── kill after batch 0 ──
    shutil.copy2(paths[1], os.path.join(half_dir, os.path.basename(paths[1])))
    run(half_dir, ck_r, out_r)  # resume, same checkpoint

    ck_u, out_u = str(tmp_path / "ck_u"), str(tmp_path / "out_u")
    run(full_dir, ck_u, out_u)

    def rows(d):
        return sorted(
            tuple(r)
            for r in SNK.read_output(spark, d)
            .select("signup_id", "purchase_id")
            .collect()
        )

    resumed, uninterrupted = rows(out_r), rows(out_u)
    assert len(uninterrupted) > 0
    assert resumed == uninterrupted
