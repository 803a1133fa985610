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


def test_stream_stream_join_restart_identical(spark, tmp_path):
    """Join state must survive checkpoint restart: kill between shard
    batches, resume, compare to an uninterrupted run."""
    import os
    import shutil

    from bitquery_kafka_streams_rust_spark.streaming.sink import (
        ExactlyOnceParquetSink,
        read_output,
    )

    seq_dir = str(tmp_path / "seq")
    sh_full, sh_half = str(tmp_path / "sh_full"), str(tmp_path / "sh_half")
    _write_single_parquet(spark, datagen.sequences_view(spark, SF), seq_dir)
    # Split shard deliveries by TIME, not shard_id: the watermark contract
    # requires later files to carry later event times.  (A kill at an
    # epoch boundary advances the watermark and evicts join state — a
    # subsequently delivered file full of older-than-watermark rows is
    # dropped per the declared bound, which an uninterrupted run may
    # accidentally tolerate via watermark lag.  Restart-identity is
    # guaranteed for watermark-compliant streams.)
    sh = datagen.shards_view(spark, SF)
    cut = sh.selectExpr("percentile(unix_timestamp(ts), 0.5) AS c").collect()[0]["c"]
    _write_single_parquet(spark, sh.where(F.unix_timestamp("ts") <= cut), f"{sh_full}/a.d")
    _write_single_parquet(spark, sh.where(F.unix_timestamp("ts") > cut), f"{sh_full}/b.d")
    # flatten nested dirs to files with ordered mtimes
    import glob
    import time

    os.makedirs(sh_half)
    flat = []
    base = time.time() - 100
    for i, d in enumerate(["a.d", "b.d"]):
        part = glob.glob(f"{sh_full}/{d}/part-*.parquet")[0]
        p = f"{sh_full}/f{i}.parquet"
        shutil.move(part, p)
        shutil.rmtree(f"{sh_full}/{d}")
        os.utime(p, (base + i * 10, base + i * 10))
        flat.append(p)
    shutil.copy2(flat[0], sh_half)

    def run(sh_dir, ck, out):
        s = spark.readStream.schema(SEQUENCES).parquet(seq_dir)
        h = (
            spark.readStream.schema(SHARDS)
            .option("maxFilesPerTrigger", 1)
            .parquet(sh_dir)
        )
        q = (
            shard_correlation_join(s, h, 300, 300)
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return {
            (r["doc_id"], r["shard_id"], r["part_len"])
            for r in read_output(
                spark, out, schema="doc_id string, shard_id int, part_len int, batch_id long"
            ).select("doc_id", "shard_id", "part_len").collect()
        }

    out_r = str(tmp_path / "out_r")
    run(sh_half, str(tmp_path / "ck_r"), out_r)          # shards 0-1 only
    shutil.copy2(flat[1], sh_half)                        # ── kill / add data ──
    resumed = run(sh_half, str(tmp_path / "ck_r"), out_r)  # resume
    uninterrupted = run(sh_full, str(tmp_path / "ck_u"), str(tmp_path / "out_u"))
    assert resumed == uninterrupted
    assert len(resumed) > 0


def test_ttl_dedup_compat_first_wins_and_readmission(spark, tmp_path):
    """Processing-time TTL dedup (deduplicator.rs:50-75 semantics) on the
    applyInPandasWithState path: duplicates within TTL suppressed, key
    re-admitted after expiry."""
    import glob
    import os
    import shutil
    import time as _time

    from bitquery_kafka_streams_rust_spark.streaming.ttl_dedup import (
        ttl_dedup_stream_compat,
    )

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)

    def write_batch(i):
        st = f"{in_dir}/.st"
        spark.createDataFrame(
            [(f"k{j}", i) for j in range(3)], "k string, batch int"
        ).coalesce(1).write.mode("overwrite").parquet(st)
        shutil.move(glob.glob(f"{st}/part-*.parquet")[0], f"{in_dir}/b{i}.parquet")
        shutil.rmtree(st)

    def run(ttl_s, name):
        # parquet sink: the memory sink cannot resume a checkpoint, and
        # this test restarts the query per batch on one checkpoint
        out_dir = str(tmp_path / f"out_{name}")
        stream = spark.readStream.schema("k string, batch int").parquet(in_dir)
        q = (
            ttl_dedup_stream_compat(stream, key="k", ttl_s=ttl_s)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        return spark.read.schema("k string, batch int").parquet(out_dir).count()

    # suppression: TTL far larger than any restart overhead, so the
    # second batch is unambiguously within the window
    write_batch(0)
    assert run(3600, "a") == 3   # first sighting
    write_batch(1)
    assert run(3600, "a") == 3   # within TTL → suppressed (no new rows)

    # re-admission: tiny TTL on a fresh checkpoint; both existing batches
    # land in one run (one admission per key), then we sleep past the TTL
    assert run(1, "b") == 3
    _time.sleep(2.5)
    write_batch(2)
    assert run(1, "b") == 6      # TTL expired → re-admitted


def test_stream_outer_join_matches_batch(spark, tmp_path):
    """LEFT OUTER stream-stream join: matches emit as they join; orphan
    sequences emit ONE null-padded row once the joint watermark clears
    their range.  Sentinel late files advance the watermark so the
    availableNow run flushes the outer state; modulo sentinels, the
    streaming output equals the batch left join."""
    import glob
    import os
    import shutil
    import time as _time
    from datetime import datetime

    from bitquery_kafka_streams_rust_spark.streaming.join import (
        shard_correlation_join_outer,
    )

    seq = datagen.sequences_view(spark, SF)
    sh = datagen.shards_view(spark, SF)
    far = datetime(2024, 3, 1)  # weeks past the fixture's event times

    def _staged(df, schema, sent_rows, d):
        """file 0 = the real data, files 1-2 = watermark-advancing
        sentinels (ordered mtimes; later files carry later times)."""
        in_dir = str(tmp_path / d)
        os.makedirs(in_dir)
        base = _time.time() - 100
        stages = [
            df,
            spark.createDataFrame([sent_rows(0)], schema),
            spark.createDataFrame([sent_rows(1)], schema),
        ]
        for i, part in enumerate(stages):
            p = str(tmp_path / f"{d}_stage{i}")
            part.coalesce(1).write.mode("overwrite").parquet(p)
            f = glob.glob(f"{p}/part-*.parquet")[0]
            dst = f"{in_dir}/f{i}.parquet"
            shutil.move(f, dst)
            os.utime(dst, (base + i * 10, base + i * 10))
        return in_dir

    from datetime import timedelta

    seq_dir = _staged(
        seq, SEQUENCES,
        lambda i: ("sentinel", [1], 1, "pumpfun", far + timedelta(hours=i)),
        "oseq",
    )
    sh_dir = _staged(
        sh, SHARDS,
        lambda i: ("sentinel", 0, [1], far + timedelta(hours=i)),
        "osh",
    )
    s_stream = (
        spark.readStream.schema(SEQUENCES)
        .option("maxFilesPerTrigger", 1)
        .parquet(seq_dir)
    )
    h_stream = (
        spark.readStream.schema(SHARDS)
        .option("maxFilesPerTrigger", 1)
        .parquet(sh_dir)
    )
    joined = shard_correlation_join_outer(s_stream, h_stream, 300, 300)
    q = (
        joined.writeStream.format("memory")
        .queryName("ojoin_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ojoin"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["doc_id"], r["shard_id"], r["part_len"])
        for r in spark.sql(
            "SELECT * FROM ojoin_out WHERE doc_id <> 'sentinel'"
        ).collect()
    }
    batch = shard_correlation_join_outer(seq, sh, 300, 300)
    expect = {
        (r["doc_id"], r["shard_id"], r["part_len"]) for r in batch.collect()
    }
    assert got == expect
    # the outer join's whole point: orphans exist and carry nulls
    orphans = {t for t in got if t[1] is None}
    inner = {t for t in got if t[1] is not None}
    assert orphans and inner
    assert all(t[2] is None for t in orphans)
