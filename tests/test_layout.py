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
