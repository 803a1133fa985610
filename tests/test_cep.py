"""CEP followed-by pattern (operators/cep.py): batch-window vs
streaming-stateful parity, strict-precedence and gap semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import cep as CEP

T0 = datetime(2024, 1, 1)


def _ev(eid, uid, etype, secs):
    return (eid, datetime(2024, 1, 1, 0, secs // 60, secs % 60), uid, etype, 1.0, "{}")


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_followed_by_semantics(spark):
    rows = [
        _ev(1, 10, "signup", 0),
        _ev(2, 10, "purchase", 30),    # match (gap 30)
        _ev(3, 10, "purchase", 700),   # no match: 700 > 600 after last signup
        _ev(4, 10, "signup", 710),
        _ev(5, 10, "purchase", 715),   # match vs the NEWER signup (gap 5)
        _ev(6, 20, "purchase", 100),   # no match: no signup for user 20
        _ev(7, 30, "signup", 50),      # A with no B: emits nothing
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["b_id"]: r for r in CEP.followed_by(df, "signup", "purchase", 600).collect()}
    assert set(got) == {2, 5}
    assert got[2]["gap_actual_s"] == 30 and got[2]["key"] == 10
    assert got[5]["gap_actual_s"] == 5
    assert got[5]["a_ts"] == datetime(2024, 1, 1, 0, 11, 50)


def test_not_followed_by_semantics(spark):
    rows = [
        _ev(1, 10, "signup", 0),
        _ev(2, 10, "purchase", 30),    # covers signup 1
        _ev(3, 10, "signup", 100),
        _ev(4, 10, "purchase", 800),   # 700s after signup 3 → too late
        _ev(5, 20, "signup", 0),       # user 20 never purchases
        _ev(6, 30, "purchase", 0),     # B with no A: irrelevant
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["a_id"]: r for r in CEP.not_followed_by(df, "signup", "purchase", 600).collect()}
    assert set(got) == {3, 5}
    assert got[3]["next_b_ts"] is not None  # a late purchase exists
    assert got[5]["next_b_ts"] is None      # none at all


def test_followed_by_plan_is_partitioned(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        CEP.followed_by(ev, "signup", "purchase", 600)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan  # window is hash-partitioned by key


def _write_ordered_batches(spark, ev, tmp_path, n_batches=3, sub="in"):
    """Events split into time-ordered parquet batch files (per-key order
    preserved across files — the stream's in-order arrival contract)."""
    import glob
    import os
    import shutil
    import time as _time

    from pyspark.sql import Window

    n = ev.count()
    per = -(-n // n_batches)
    ordered = ev.withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
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


@pytest.mark.watchdog_timeout(300)
def test_followed_by_stream_matches_batch(spark, sf_dir, tmp_path):
    """Split the events fixture into 3 time-ordered micro-batches: the
    one-long-per-key stateful stream must emit exactly the batch-window
    matches, including pairs that straddle a batch boundary."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _write_ordered_batches(spark, ev, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = CEP.followed_by_stream(stream, "signup", "purchase", 600)
    q = (
        out.writeStream.format("memory")
        .queryName("cep_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT key, a_ts, b_id, b_ts, gap_actual_s FROM cep_stream"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in CEP.followed_by(ev, "signup", "purchase", 600)
        .select("key", "a_ts", "b_id", "b_ts", "gap_actual_s")
        .collect()
    )
    assert len(want) > 0
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_followed_by_stream_restart_identical(spark, sf_dir, tmp_path):
    """T9 for the CEP stream: kill after the first micro-batch, resume
    from checkpoint, output row set identical to an uninterrupted run
    (the per-key last-A state survives the restart)."""
    import os
    import shutil

    from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = _write_ordered_batches(spark, ev, tmp_path, sub="full")
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
            CEP.followed_by_stream(stream, "signup", "purchase", 600)
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("append")
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

    from bitquery_kafka_streams_rust_spark.streaming import sink as S

    def rows(out):
        return sorted(
            tuple(r)
            for r in S.read_output(spark, out)
            .select("key", "a_ts", "b_id", "b_ts", "gap_actual_s")
            .collect()
        )

    r, u = rows(out_r), rows(out_u)
    assert len(u) > 0
    assert r == u


def test_match_kernel_custom_column_names():
    """The streaming kernel accepts ts/type/id column overrides like the
    batch form (previously hardcoded: non-default schemas KeyError'd)."""
    import pandas as pd

    class _FakeState:
        exists = False
        get = None

        def update(self, v):
            self.get = v
            self.exists = True

    pdf = pd.DataFrame(
        {
            "t": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:30", "2024-01-01 00:20:00"]
            ),
            "etype": ["signup", "purchase", "purchase"],
            "eid": [1, 2, 3],
        }
    )
    (out,) = list(
        CEP._match(
            (10,), iter([pdf]), _FakeState(), "signup", "purchase", 600,
            type_col="etype", ts_col="t", id_col="eid",
        )
    )
    assert list(out["b_id"]) == [2]  # id 3 is 1200 s after the signup
    assert list(out["gap_actual_s"]) == [30]


def _with_flush_batches(spark, ev, tmp_path, sub="nfb"):
    """Ordered batches + TWO far-future 'noop' flush files: flush1
    advances the watermark past every pending deadline, flush2 gives
    Spark the extra micro-batch in which those event-time timers fire
    (a batch's watermark reflects data through the PREVIOUS batch)."""
    import os
    import time as _time

    in_dir, paths = _write_ordered_batches(spark, ev, tmp_path, sub=sub)
    far = ev.agg(F.max("ts")).collect()[0][0]
    base = os.path.getmtime(paths[-1])
    for i in (1, 2):
        flush = spark.createDataFrame(
            [(10_000_000 + i, far, -1, "noop", 0.0, "{}")], SCHEMA
        ).withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i} DAYS"))
        p = str(tmp_path / f"{sub}_flush_{i}")
        flush.coalesce(1).write.mode("overwrite").parquet(p)
        import glob as _glob
        import shutil as _shutil

        f = _glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/z_flush{i}.parquet"
        _shutil.move(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))
        paths.append(dst)
    return in_dir, paths


@pytest.mark.watchdog_timeout(300)
def test_not_followed_by_stream_matches_batch(spark, sf_dir, tmp_path):
    """The event-time-timeout streaming twin must emit exactly the
    batch form's alert set — both the no-B-ever timeouts and the
    B-came-too-late resolutions."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _with_flush_batches(spark, ev, tmp_path)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "300 seconds")
    )
    out = CEP.not_followed_by_stream(stream, "signup", "purchase", 600)
    q = (
        out.writeStream.format("memory")
        .queryName("nfb_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql("SELECT key, a_id, a_ts FROM nfb_stream").collect()
    )
    want = sorted(
        tuple(r)
        for r in CEP.not_followed_by(ev, "signup", "purchase", 600)
        .select("key", "a_id", "a_ts")
        .collect()
    )
    assert len(want) > 0
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_not_followed_by_stream_restart_identical(spark, sf_dir, tmp_path):
    """T9 for the timeout pattern: kill after the first micro-batch,
    resume from checkpoint — the pending-A state and its event-time
    timer survive, final alert set identical to an uninterrupted run."""
    import os
    import shutil

    from bitquery_kafka_streams_rust_spark.streaming import sink as S
    from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = _with_flush_batches(spark, ev, tmp_path, sub="full")
    half_dir = str(tmp_path / "half")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))

    def run(in_dir, ck, out):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
            .withWatermark("ts", "300 seconds")
        )
        q = (
            CEP.not_followed_by_stream(stream, "signup", "purchase", 600)
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("append")
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
        return sorted(
            tuple(r)
            for r in S.read_output(spark, out).select("key", "a_id", "a_ts").collect()
        )

    resumed, uninterrupted = rows(out_r), rows(out_u)
    assert len(uninterrupted) > 0
    assert resumed == uninterrupted


def test_pattern_chain_semantics(spark):
    rows = [
        _ev(1, 10, "view", 0),
        _ev(2, 10, "click", 30),      # valid A->B (30 s)
        _ev(3, 10, "purchase", 50),   # completes: chain (0, 30, 50)
        _ev(4, 10, "purchase", 700),  # too late after click 30 (gap 670)
        _ev(5, 10, "view", 800),
        _ev(6, 10, "purchase", 820),  # no click after the newer view
        _ev(7, 10, "click", 850),     # valid vs view 800 (gap 50)
        _ev(8, 10, "purchase", 880),  # completes: chain (800, 850, 880)
        _ev(9, 20, "click", 10),      # click with no view: never a chain
        _ev(10, 20, "purchase", 20),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["key"], r["last_id"], r["step0_ts"].second + r["step0_ts"].minute * 60,
         r["step1_ts"].second + r["step1_ts"].minute * 60)
        for r in CEP.pattern_chain(ev, ["view", "click", "purchase"], [60, 60]).collect()
    )
    assert got == [(10, 3, 0, 30), (10, 8, 800, 850)]


def test_pattern_chain_most_recent_prefix(spark):
    """A later valid A->B prefix replaces an earlier one (the carried
    struct is max by the latest step's timestamp)."""
    rows = [
        _ev(1, 10, "view", 0),
        _ev(2, 10, "click", 10),
        _ev(3, 10, "view", 20),
        _ev(4, 10, "click", 30),     # newer valid prefix (20, 30)
        _ev(5, 10, "purchase", 40),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    (r,) = CEP.pattern_chain(ev, ["view", "click", "purchase"], [60, 60]).collect()
    assert (r["step0_ts"].second, r["step1_ts"].second) == (20, 30)


def test_pattern_chain_one_exchange(spark, sf_dir):
    """All per-step window carries stack on ONE exchange+sort — chain
    length must not multiply shuffles."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        CEP.pattern_chain(ev, ["view", "click", "purchase"], [600, 600])
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re as _re

    assert len(_re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "SinglePartition" not in plan


@pytest.mark.watchdog_timeout(300)
def test_pattern_chain_stream_matches_batch(spark, sf_dir, tmp_path):
    """The O(steps)-state streaming twin emits exactly the batch
    chain completions, including chains straddling batch boundaries."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _write_ordered_batches(spark, ev, tmp_path, sub="chain")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = CEP.pattern_chain_stream(stream, ["view", "click", "purchase"], [86400, 86400])
    q = (
        out.writeStream.format("memory")
        .queryName("chain_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT key, step0_ts, step1_ts, last_id, last_ts FROM chain_stream"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in CEP.pattern_chain(ev, ["view", "click", "purchase"], [86400, 86400])
        .collect()
    )
    assert len(want) > 0
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_followed_by_stream_expire_state_parity(spark, sf_dir, tmp_path):
    """expire_state=True (watermark-evicted last-A state — the bounded-
    state mode for huge key spaces) must not change the emitted match
    set on in-order input."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _with_flush_batches(spark, ev, tmp_path, sub="fbx")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "300 seconds")
    )
    out = CEP.followed_by_stream(stream, "signup", "purchase", 600, expire_state=True)
    q = (
        out.writeStream.format("memory")
        .queryName("fb_expire")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT key, a_ts, b_id, b_ts, gap_actual_s FROM fb_expire"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in CEP.followed_by(ev, "signup", "purchase", 600)
        .select("key", "a_ts", "b_id", "b_ts", "gap_actual_s")
        .collect()
    )
    assert len(want) > 0
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_pattern_chain_stream_expire_parity(spark, sf_dir, tmp_path):
    """expire_state=True prunes watermark-dead prefixes and evicts
    emptied keys without changing chain completions."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    in_dir, _ = _with_flush_batches(spark, ev, tmp_path, sub="chx")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "300 seconds")
    )
    out = CEP.pattern_chain_stream(
        stream, ["view", "click", "purchase"], [86400, 86400], expire_state=True
    )
    q = (
        out.writeStream.format("memory")
        .queryName("chain_expire")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT key, step0_ts, step1_ts, last_id, last_ts FROM chain_expire"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in CEP.pattern_chain(ev, ["view", "click", "purchase"], [86400, 86400])
        .collect()
    )
    assert len(want) > 0
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_pattern_chain_stream_restart_identical(spark, sf_dir, tmp_path):
    """T9 for the chain pattern: kill after the first micro-batch,
    resume from checkpoint — the per-key prefix state survives and the
    final completion set equals an uninterrupted run's."""
    import os
    import shutil

    from bitquery_kafka_streams_rust_spark.streaming import sink as S
    from bitquery_kafka_streams_rust_spark.streaming.sink import ExactlyOnceParquetSink

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    full_dir, paths = _write_ordered_batches(spark, ev, tmp_path, sub="chainfull")
    half_dir = str(tmp_path / "chainhalf")
    os.makedirs(half_dir)
    shutil.copy2(paths[0], os.path.join(half_dir, os.path.basename(paths[0])))

    def run(in_dir, ck, out):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            CEP.pattern_chain_stream(stream, ["view", "click", "purchase"], [86400, 86400])
            .writeStream.foreachBatch(ExactlyOnceParquetSink(out, lineage=False))
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    ck_r, out_r = str(tmp_path / "ck_cr"), str(tmp_path / "out_cr")
    run(half_dir, ck_r, out_r)  # ── kill after batch 0 ──
    for p in paths[1:]:
        shutil.copy2(p, os.path.join(half_dir, os.path.basename(p)))
    run(half_dir, ck_r, out_r)  # resume, same checkpoint

    ck_u, out_u = str(tmp_path / "ck_cu"), str(tmp_path / "out_cu")
    run(full_dir, ck_u, out_u)

    def rows(out):
        return sorted(
            tuple(r)
            for r in S.read_output(spark, out)
            .select("key", "step0_ts", "step1_ts", "last_id", "last_ts")
            .collect()
        )

    resumed, uninterrupted = rows(out_r), rows(out_u)
    assert len(uninterrupted) > 0
    assert resumed == uninterrupted


@pytest.mark.watchdog_timeout(300)
def test_not_followed_by_stream_out_of_order_in_gap_b(spark, tmp_path):
    """Regression (round-5 advice): a too-late B must NOT resolve
    absence while the watermark is still inside the gap window — an
    in-gap B arriving in a LATER micro-batch (out-of-order but not yet
    late-droppable) must still suppress the alert, exactly as the
    batch twin's min-over-following-B does.  Pre-fix the kernel
    emitted the A and evicted it as soon as the too-late B arrived,
    producing a false alert the batch form never emits."""
    import glob
    import os
    import shutil
    import time as _time

    gap = 600
    rows_b0 = [
        _ev(1, 10, "signup", 0),       # A, user 10
        _ev(2, 10, "purchase", 1000),  # too-late B (1000 > 600)
        _ev(3, 20, "signup", 0),       # A, user 20 — never in-gap-covered
        _ev(4, 20, "purchase", 1000),  # too-late B for user 20
        _ev(5, 30, "signup", 0),       # A, user 30 — no B at all
    ]
    # out-of-order: event time 300 (inside user 10's gap) arrives AFTER
    # the t=1000 B; the 3600 s watermark delay keeps wm < 300 here
    rows_b1 = [_ev(6, 10, "purchase", 300)]

    in_dir = str(tmp_path / "ooo")
    os.makedirs(in_dir)
    base = _time.time() - 100
    all_rows = rows_b0 + rows_b1
    for i, batch in enumerate([rows_b0, rows_b1]):
        p = str(tmp_path / f"ooo_stage_{i}")
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i:02d}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))
    # two far-future flush files: advance the watermark past every
    # deadline, then give the timers a micro-batch to fire in
    for i in (1, 2):
        p = str(tmp_path / f"ooo_flush_{i}")
        flush = spark.createDataFrame(
            [(10_000_000 + i, datetime(2024, 1, 2 + i), -1, "noop", 0.0, "{}")],
            SCHEMA,
        )
        flush.coalesce(1).write.mode("overwrite").parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/z_flush{i}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + 100 + i * 10, base + 100 + i * 10))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "3600 seconds")
    )
    q = (
        CEP.not_followed_by_stream(stream, "signup", "purchase", gap)
        .writeStream.format("memory")
        .queryName("nfb_ooo")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT key, a_id FROM nfb_ooo").collect()
    )
    batch = CEP.not_followed_by(
        spark.createDataFrame(all_rows, SCHEMA), "signup", "purchase", gap
    )
    want = sorted(tuple(r) for r in batch.select("key", "a_id").collect())
    # user 10 suppressed by the late-arriving in-gap B; 20 and 30 alert
    assert want == [(20, 3), (30, 5)]
    assert got == want


@pytest.mark.watchdog_timeout(300)
def test_not_followed_by_stream_subsecond_and_tie_parity(spark, tmp_path):
    """Regression (round-5 review): the batch twin compares FLOORED
    whole-second gaps (unix_timestamp) over rows STRICTLY following in
    (ts, id) order.  The stream kernel must mirror both: (a) an in-gap
    B at sub-second offset (a=.900, b=gap+.950 -> floored diff == gap)
    suppresses in batch, so the stream must not alert; (b) a cross-batch
    B at the SAME timestamp as the A but a LOWER id is not 'strictly
    following' in batch order, so the stream must still alert."""
    import glob
    import os
    import shutil
    import time as _time
    from datetime import timedelta

    def _evf(eid, uid, etype, secs_f):
        return (
            eid,
            datetime(2024, 1, 1) + timedelta(seconds=secs_f),
            uid,
            etype,
            1.0,
            "{}",
        )

    gap = 600
    rows_b0 = [
        _evf(1, 10, "signup", 0.900),    # A — floored gap to B == 600
        _evf(3, 20, "signup", 0.0),      # A — B at 601 is truly late
        _evf(4, 20, "purchase", 601.0),
        _evf(6, 30, "signup", 50.0),     # A — same-ts lower-id B below
    ]
    rows_b1 = [
        _evf(2, 10, "purchase", 600.950),  # sub-second in-floor-gap B
        _evf(5, 30, "purchase", 50.0),     # same ts as A 6, id 5 < 6
    ]
    in_dir = str(tmp_path / "subsec")
    os.makedirs(in_dir)
    base = _time.time() - 100
    all_rows = rows_b0 + rows_b1
    for i, batch in enumerate([rows_b0, rows_b1]):
        p = str(tmp_path / f"subsec_stage_{i}")
        spark.createDataFrame(batch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/b{i:02d}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + i * 10, base + i * 10))
    for i in (1, 2):
        p = str(tmp_path / f"subsec_flush_{i}")
        flush = spark.createDataFrame(
            [(10_000_000 + i, datetime(2024, 1, 2 + i), -1, "noop", 0.0, "{}")],
            SCHEMA,
        )
        flush.coalesce(1).write.mode("overwrite").parquet(p)
        f = glob.glob(f"{p}/part-*.parquet")[0]
        dst = f"{in_dir}/z_flush{i}.parquet"
        shutil.move(f, dst)
        os.utime(dst, (base + 100 + i * 10, base + 100 + i * 10))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
        .withWatermark("ts", "3600 seconds")
    )
    q = (
        CEP.not_followed_by_stream(stream, "signup", "purchase", gap)
        .writeStream.format("memory")
        .queryName("nfb_subsec")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        tuple(r) for r in spark.sql("SELECT key, a_id FROM nfb_subsec").collect()
    )
    batch = CEP.not_followed_by(
        spark.createDataFrame(all_rows, SCHEMA), "signup", "purchase", gap
    )
    want = sorted((r["key"], r["a_id"]) for r in batch.collect())
    # ground truth: user 10 suppressed (floored 600 <= 600), 20 and 30 alert
    assert want == [(20, 3), (30, 6)]
    assert got == want
