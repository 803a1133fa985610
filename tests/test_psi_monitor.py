"""streaming/psi_monitor.py: live PSI vs a frozen base — exact parity
with the batch operator on the bins the stream populates."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.drift import psi_bins
from bitquery_kafka_streams_rust_spark.streaming import psi_monitor as PM

SCHEMA = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
CUTOFF = "2024-01-16 00:00:00"


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


def test_psi_stream_matches_batch_on_populated_bins(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    base_pred = F.col("ts") < F.lit(CUTOFF).cast("timestamp")

    # ── freeze the base: edges exactly as the batch operator derives them
    v = F.col("value").cast("double")
    probs = [i / 10 for i in range(1, 10)]
    edge_rows = (
        ev.where(base_pred)
        .groupBy("event_type")
        .agg(F.array(*[F.round(F.percentile(v, p), 6) for p in probs]).alias("e"))
        .collect()
    )
    edges_by_key = {r["event_type"]: list(r["e"]) for r in edge_rows}
    batch = psi_bins(ev, "value", base_pred, ["event_type"]).collect()
    # 9-dp base shares the monitor freezes (batch p9 before the 6-dp view)
    base_shares = {}
    tot_base = {}
    for r in batch:
        tot_base[r["event_type"]] = tot_base.get(r["event_type"], 0) + r["n_base"]
    for r in batch:
        p = max(r["n_base"] / tot_base[r["event_type"]], 0.0001)
        base_shares[(r["event_type"], r["bin"])] = round(p, 9)

    # ── stream ONLY the current period through the monitor
    cur = ev.where(~base_pred)
    in_dir = _write_batches(spark, cur, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        PM.build_psi_count_stream(stream, "event_type", "value", edges_by_key)
        .writeStream.foreachBatch(PM.PSIReadoutSink(out, base_shares))
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
    last = {
        (r["key"], r["bin"]): (r["n_cur"], r["base_share"], r["cur_share"], r["psi_term"])
        for r in hist.where(F.col("batch_id") == epochs[-1]).collect()
    }
    want = {
        (r["event_type"], r["bin"]): (
            r["n_cur"], r["base_share"], r["cur_share"], r["psi_term"]
        )
        for r in batch
        if r["n_cur"] > 0  # the stream can't emit bins it never saw
    }
    assert last == want  # EXACT: counts + PSI arithmetic match the batch twin
    # PSI over this fixture is small (same generator both halves)
    assert abs(sum(v[3] for v in last.values())) < 0.25 * len(edges_by_key)


def test_psi_stream_drops_unknown_keys(spark, tmp_path):
    import datetime as dt

    rows = [(1, dt.datetime(2024, 1, 20), 1, "known", 5.0, "{}"),
            (2, dt.datetime(2024, 1, 20), 1, "mystery", 5.0, "{}")]
    df = spark.createDataFrame(rows, SCHEMA)
    in_dir = _write_batches(spark, df, tmp_path, n_batches=1)
    out = str(tmp_path / "out")
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        PM.build_psi_count_stream(stream, "event_type", "value", {"known": [1.0, 9.0]})
        .writeStream.foreachBatch(PM.PSIReadoutSink(out, {("known", 1): 0.5}))
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.awaitTermination()
    got = spark.read.parquet(out).collect()
    assert {r["key"] for r in got} == {"known"}
    assert got[0]["bin"] == 1  # 5.0 > 1.0, <= 9.0
