"""streaming/ewma_monitor.py: stream-vs-batch bit-exact parity and
bounded state."""

from __future__ import annotations

import pytest
import test_cep as TC
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.timeseries import ewma
from bitquery_kafka_streams_rust_spark.streaming.ewma_monitor import ewma_stream


@pytest.mark.watchdog_timeout(300)
def test_ewma_stream_matches_batch_bit_exact(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "value"
    )
    in_dir, _ = TC._write_ordered_batches(spark, ev, tmp_path, n_batches=3)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        ewma_stream(stream, window=16)
        .writeStream.format("memory")
        .queryName("ewma_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["event_id"]): (r["value"], r["ewma"])
        for r in spark.sql("SELECT * FROM ewma_stream").collect()
    }
    want = {
        (r["user_id"], r["event_id"]): (r["value"], r["ewma"])
        for r in ewma(ev, "user_id", "ts", "value", window=16)
        .select("user_id", "event_id", "value", "ewma")
        .collect()
    }
    assert len(got) == ev.count()
    assert got == want  # bit-exact, no tolerance: the dyadic contract
