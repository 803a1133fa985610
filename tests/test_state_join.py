"""Keyed CEP state (applyInPandasWithState) + stream-stream shard join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark import datagen
from bitquery_kafka_streams_rust_spark.schemas import SEQUENCES, SHARDS
from bitquery_kafka_streams_rust_spark.streaming.join import shard_correlation_join
from bitquery_kafka_streams_rust_spark.streaming.state import keyed_tracker

SF = "/root/testdata/sf0.001"


def _write_single_parquet(spark, df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_keyed_tracker_counts(spark, tmp_path):
    """Tracker totals must equal plain aggregation; sessions ≥ 1 per key."""
    in_dir = str(tmp_path / "in")
    seq = datagen.sequences_view(spark, SF).select("doc_id", "n_tok", "source", "ts")
    _write_single_parquet(spark, seq, in_dir)

    stream = (
        spark.readStream.schema("doc_id string, n_tok int, source string, ts timestamp")
        .parquet(in_dir)
    )
    q = (
        keyed_tracker(stream, n_buckets=4)
        .writeStream.format("memory")
        .queryName("tracker_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql(
        "SELECT source, sum(n_seen) AS n, sum(sum_tok) AS s FROM "
        "(SELECT source, bucket, max_by(n_seen, n_seen) n_seen, max_by(sum_tok, n_seen) sum_tok "
        " FROM tracker_out GROUP BY source, bucket) GROUP BY source"
    ).collect()
    expect = {
        r["source"]: (r["n"], r["s"])
        for r in seq.groupBy("source").agg(F.count("*").alias("n"), F.sum("n_tok").alias("s")).collect()
    }
    for r in got:
        assert (r["n"], r["s"]) == expect[r["source"]]


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Single-micro-batch streaming join == batch join (no late drops)."""
    seq_dir, sh_dir = str(tmp_path / "seq"), str(tmp_path / "sh")
    seq = datagen.sequences_view(spark, SF)
    sh = datagen.shards_view(spark, SF)
    _write_single_parquet(spark, seq, seq_dir)
    _write_single_parquet(spark, sh, sh_dir)

    s_stream = spark.readStream.schema(SEQUENCES).parquet(seq_dir)
    h_stream = spark.readStream.schema(SHARDS).parquet(sh_dir)
    joined = shard_correlation_join(s_stream, h_stream, watermark_s=300, range_s=300)
    q = (
        joined.writeStream.format("memory")
        .queryName("join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_join"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["doc_id"], r["shard_id"], r["part_len"])
        for r in spark.sql("SELECT * FROM join_out").collect()
    }
    batch = shard_correlation_join(seq, sh, 300, 300)
    expect = {(r["doc_id"], r["shard_id"], r["part_len"]) for r in batch.collect()}
    assert got == expect
    assert len(got) > 0


def test_join_drops_out_of_range_shards(spark):
    """Shards outside ±range are excluded (watermark/range semantics)."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    seq = spark.createDataFrame(
        [("d1", [1], 1, "pumpfun", t0)], SEQUENCES
    )
    sh = spark.createDataFrame(
        [
            ("d1", 0, [1], t0 + timedelta(seconds=100)),   # in range
            ("d1", 1, [1], t0 + timedelta(seconds=9999)),  # out of range
            ("dX", 0, [1], t0),                            # unmatched key
        ],
        SHARDS,
    )
    out = shard_correlation_join(seq, sh, 300, 300).collect()
    assert [(r["doc_id"], r["shard_id"]) for r in out] == [("d1", 0)]
