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
