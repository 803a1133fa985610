"""Classifier-gate evaluation (operators/evalmetrics.py): exact
Mann-Whitney AUC vs a pure-Python reference, calibration bins / ECE,
and the streaming calibration monitor's exact batch parity."""

from __future__ import annotations

import glob
import os
import shutil
import time as _time

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import evalmetrics as EM
from bitquery_kafka_streams_rust_spark.streaming import calibration_monitor as CM


def _py_auc(pairs):
    """Reference AUC: P(score_pos > score_neg) + 0.5 P(tie), O(n^2)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_matches_pairwise_reference(spark):
    rows = [
        ("g", 0.9, 1), ("g", 0.8, 1), ("g", 0.8, 0), ("g", 0.3, 0),
        ("g", 0.3, 1), ("g", 0.3, 0), ("g", 0.1, 0),
        ("h", 0.5, 1), ("h", 0.5, 0), ("h", 0.5, 1), ("h", 0.2, 0),
    ]
    df = spark.createDataFrame(rows, "g string, score double, y int")
    got = {r["g"]: r for r in EM.binary_auc(df, "score", "y", ["g"]).collect()}
    for g in ("g", "h"):
        pairs = [(s, y) for gg, s, y in rows if gg == g]
        assert abs(got[g]["auc"] - _py_auc(pairs)) <= 5e-7  # 6-dp output rounding
        assert got[g]["n_pos"] == sum(y for _, y in pairs)
        assert got[g]["n_neg"] == sum(1 - y for _, y in pairs)


def test_auc_degenerate_groups_null(spark):
    df = spark.createDataFrame(
        [("allpos", 0.4, 1), ("allpos", 0.6, 1), ("allneg", 0.5, 0)],
        "g string, score double, y int",
    )
    got = {r["g"]: r["auc"] for r in EM.binary_auc(df, "score", "y", ["g"]).collect()}
    assert got == {"allpos": None, "allneg": None}


def test_auc_perfect_and_inverted(spark):
    df = spark.createDataFrame(
        [("p", 0.9, 1), ("p", 0.1, 0), ("i", 0.1, 1), ("i", 0.9, 0)],
        "g string, score double, y int",
    )
    got = {r["g"]: r["auc"] for r in EM.binary_auc(df, "score", "y", ["g"]).collect()}
    assert got["p"] == 1.0 and got["i"] == 0.0


def test_calibration_bins_hand_values(spark):
    # bin 9 gets both 0.95-scored rows (one correct), bin 0 the 0.05 row
    df = spark.createDataFrame(
        [(0.95, 1), (0.95, 0), (0.05, 0), (1.0, 1)],
        "score double, y int",
    )
    got = {r["bin"]: r for r in EM.calibration_bins(df, "score", "y").collect()}
    assert set(got) == {0, 9}
    b9 = got[9]
    assert b9["n"] == 3 and b9["acc"] == round(2 / 3, 6)
    assert abs(b9["conf"] - round((0.95 + 0.95 + 1.0) / 3, 6)) <= 1e-6
    assert got[0]["n"] == 1 and got[0]["acc"] == 0.0 and got[0]["conf"] == 0.05
    # ECE = sum of ece_term
    ece = sum(r["ece_term"] for r in got.values())
    hand = 3 / 4 * abs(2 / 3 - (0.95 + 0.95 + 1.0) / 3) + 1 / 4 * abs(0.0 - 0.05)
    assert abs(ece - hand) < 1e-5


def test_calibration_state_is_order_independent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from bitquery_kafka_streams_rust_spark.functions import text as TX

    scored = docs.select(
        "lang",
        TX.classifier_score(F.col("text")).alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    a = EM.calibration_bins(scored, "score", "y", ["lang"]).collect()
    b = EM.calibration_bins(
        scored.orderBy(F.col("score").desc()), "score", "y", ["lang"]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


SCHEMA = "lang string, score double, y int"


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


def test_stream_calibration_exact_batch_parity(spark, sf_dir, tmp_path):
    from bitquery_kafka_streams_rust_spark.functions import text as TX

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "lang",
        TX.classifier_score(F.col("text")).alias("score"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    in_dir = _write_batches(spark, scored, tmp_path, n_batches=3)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        CM.build_calibration_moment_stream(stream, "score", "y", ["lang"])
        .writeStream.foreachBatch(CM.CalibrationReadoutSink(out, ["lang"]))
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
    last = hist.where(F.col("batch_id") == epochs[-1]).drop("batch_id")
    got = sorted(map(tuple, last.collect()))
    expected = sorted(
        map(tuple, EM.calibration_bins(scored, "score", "y", ["lang"]).collect())
    )
    assert got == expected  # EXACT: integer state == batch aggregate
    # earlier epochs saw strictly less of the stream
    first = hist.where(F.col("batch_id") == epochs[0])
    assert (
        0
        < first.agg(F.sum("n")).first()[0]
        < last.agg(F.sum("n")).first()[0]
        == scored.count()
    )


def test_zscore_normalize_hand_values(spark):
    from bitquery_kafka_streams_rust_spark.operators.evalmetrics import (
        zscore_normalize,
    )

    rows = [("s1", 0.2), ("s1", 0.4), ("s1", 0.6),  # mean .4, std .2
            ("s2", 0.5), ("s2", 0.5),               # zero variance
            ("s3", 0.9)]                            # single row
    df = spark.createDataFrame(rows, "source string, score double")
    out = zscore_normalize(df, "score", ["source"]).collect()
    by = {}
    for r in out:
        by.setdefault(r["source"], []).append(r)
    z1 = sorted(r["z"] for r in by["s1"])
    assert z1 == [-1.0, 0.0, 1.0]
    assert all(r["z"] is None for r in by["s2"])  # zero variance
    assert all(r["z"] is None for r in by["s3"])  # n < 2
    # every input row/column survives
    assert {tuple(r)[:2] for r in out} == set(rows)


def test_gains_table_hand_values(spark):
    from bitquery_kafka_streams_rust_spark.operators.evalmetrics import gains_table

    # 10 docs, scores 10..1, positives are the top 3 scorers
    rows = [(i, "g", float(10 - i), 1 if i < 3 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, g string, score double, y int")
    out = {r["tile"]: r for r in
           gains_table(df, "score", "y", ["g"], n_tiles=5).collect()}
    assert [out[t]["n"] for t in range(1, 6)] == [2] * 5
    assert out[1]["n_pos"] == 2 and out[2]["n_pos"] == 1
    assert out[1]["cum_recall"] == round(2 / 3, 6)
    assert out[2]["cum_recall"] == 1.0 and out[5]["cum_recall"] == 1.0
    # tile 1 lift: (2/2)/(3/10) = 10/3
    assert out[1]["lift"] == round(10 / 3, 6)
    assert out[4]["lift"] == 0.0


def test_gains_table_no_positives_null(spark):
    from bitquery_kafka_streams_rust_spark.operators.evalmetrics import gains_table

    df = spark.createDataFrame(
        [(i, "g", float(i), 0) for i in range(10)],
        "doc_id long, g string, score double, y int",
    )
    out = gains_table(df, "score", "y", ["g"], n_tiles=5).collect()
    assert all(r["cum_recall"] is None and r["lift"] is None for r in out)
