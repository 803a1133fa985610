"""Bucketed-layout tests: co-located joins plan with zero Exchange."""

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import layout as L


@pytest.fixture()
def two_tables(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.select("doc_id", "source", "n_chars")
    b = docs.select("doc_id", (F.col("doc_id") % 7).alias("grp"))
    L.write_bucketed(a, "t_bucket_a", "doc_id", 4, path=str(tmp_path / "a"))
    L.write_bucketed(b, "t_bucket_b", "doc_id", 4, path=str(tmp_path / "b"))
    yield "t_bucket_a", "t_bucket_b", docs.count()
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_bucketed_join_has_no_exchange(spark, two_tables):
    """Bucketing's payoff case is big-join-big (a small side would just
    broadcast — also exchange-free on the big side, also fine).  Force
    the sort-merge path to pin the property bucketing guarantees:
    co-located scans, zero Exchange on EITHER side."""
    ta, tb, n = two_tables
    j = (
        spark.table(ta)
        .hint("merge")
        .join(spark.table(tb).hint("merge"), "doc_id")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Exchange" not in plan
    assert "Bucketed: true" in plan
    assert j.count() == n


def test_bucketed_agg_has_no_exchange(spark, two_tables):
    ta, _, n = two_tables
    agg = spark.table(ta).groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # bucket hash satisfies the group-by
    assert agg.count() == n


def test_unbucketed_join_does_exchange(spark, two_tables, sf_dir):
    """Control: the same join against a plain parquet read shuffles —
    the zero-Exchange plan above is the bucketing, not a fluke."""
    ta, _, n = two_tables
    plain = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", (F.col("doc_id") % 7).alias("grp")
    )
    # defeat broadcast so the comparison is exchange-vs-bucketing
    j = spark.table(ta).hint("merge").join(plain.hint("merge"), "doc_id")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert j.count() == n


def _morton_ref(vals: list[int], bits: int) -> int:
    out = 0
    k = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * k + j)
    return out


def test_zorder_key_matches_reference_interleave(spark):
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
    )
    got = df.select(
        "x", "y", L.zorder_key([F.col("x"), F.col("y")], bits=5).alias("z")
    ).collect()
    assert all(r.z == _morton_ref([r.x, r.y], 5) for r in got)


def test_zorder_key_three_dims(spark):
    df = spark.range(0, 512).select(
        (F.col("id") % 8).alias("a"),
        ((F.col("id") / 8) % 8).cast("long").alias("b"),
        (F.col("id") / 64).cast("long").alias("c"),
    )
    cols = [F.col("a"), F.col("b"), F.col("c")]
    got = df.select("a", "b", "c", L.zorder_key(cols, bits=3).alias("z")).collect()
    assert all(r.z == _morton_ref([r.a, r.b, r.c], 3) for r in got)
    # bijective on the 8x8x8 cube: every key distinct
    assert len({r.z for r in got}) == 512


def test_write_zordered_prunes_both_dims(spark, tmp_path):
    """The layout's point: per-file min/max stays tight on EVERY
    interleaved dimension, where a linear sort leaves only its leading
    column prunable.  Verified via the file_stats manifest."""
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    zp = str(tmp_path / "z")
    L.write_zordered(df, zp, ["x", "y"], n_files=16, bits=6)
    st = L.file_stats(spark, zp, ["x", "y"]).collect()
    assert len(st) == 16
    hits_x = sum(1 for r in st if r.x_min <= 10 <= r.x_max)
    hits_y = sum(1 for r in st if r.y_min <= 10 <= r.y_max)
    # a 16-file 2-D tiling puts a point predicate in ~sqrt(16) files per dim
    assert hits_x <= 8 and hits_y <= 8

    # control: linear sort by x cannot prune y at all
    lp = str(tmp_path / "lin")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lp)
    st2 = L.file_stats(spark, lp, ["x", "y"]).collect()
    assert sum(1 for r in st2 if r.y_min <= 10 <= r.y_max) == len(st2)

    # and the rewrite is lossless
    assert spark.read.parquet(zp).count() == 4096


def test_pruned_read_skips_files_same_answer(spark, tmp_path):
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("v"),
    )
    zp = str(tmp_path / "z")
    L.write_zordered(df, zp, ["x", "y"], n_files=16, bits=6)
    manifest = L.file_stats(spark, zp, ["x", "y"])
    pruned = L.pruned_read(spark, zp, {"x": (10, 12), "y": (20, 25)}, manifest=manifest)
    full = (
        spark.read.parquet(zp)
        .where(F.col("x").between(10, 12) & F.col("y").between(20, 25))
    )
    assert sorted(r.v for r in pruned.collect()) == sorted(r.v for r in full.collect())
    # the plan actually read fewer files than the table holds
    assert 0 < len(pruned.inputFiles()) < len(spark.read.parquet(zp).inputFiles())
    # empty-range plan short-circuits to zero rows without scanning
    none = L.pruned_read(spark, zp, {"x": (999, 1000)}, manifest=manifest)
    assert none.count() == 0
