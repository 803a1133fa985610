"""Continuous-aggregate maintenance (streaming/rollup.py): streamed
minute partials feed the batch cascade and match a direct rollup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import aggregates as AG
from bitquery_kafka_streams_rust_spark.streaming import rollup as RU
from test_upsert_stream import SCHEMA, _write_batches


@pytest.mark.watchdog_timeout(300)
def test_streamed_partials_feed_cascade(spark, sf_dir, tmp_path):
    """Stream events into watermark-closed minute partials (append
    mode, raw running sums), then derive hour/day via
    rollup_cascade_from_partials: equals the batch cascade over the
    closed time range at EVERY level — the continuous aggregate is
    maintained without ever rescanning raw events."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _write_batches(spark, ev, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(in_dir)
    )
    out_dir, ck = str(tmp_path / "partials"), str(tmp_path / "ck")
    q = (
        RU.minute_partials_stream(stream, watermark_s=120)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()

    partials = spark.read.parquet(out_dir)
    n_closed = partials.count()
    assert n_closed > 0
    # append mode emitted exactly the windows the final watermark closed:
    # everything strictly before the newest emitted window's end
    cutoff = partials.agg(F.max("bucket_start")).collect()[0][0] + 60
    got = sorted(
        tuple(r)
        for r in AG.rollup_cascade_from_partials(
            partials, by=("event_type",)
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in AG.rollup_cascade(
            ev.where(F.unix_timestamp("ts") < cutoff),
            "ts",
            "value",
            by=("event_type",),
        ).collect()
    )
    assert len(want) > n_closed  # cascade added coarser levels
    assert got == want
    # the maintenance never re-reads raw events: only the partials dir
    plan = (
        AG.rollup_cascade_from_partials(partials, by=("event_type",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "events.parquet" not in plan
