"""Plan-shape assertions — the Catalyst-optimization evidence (SURVEY §4).

These pin the physical plans we rely on at scale: filter pushdown to the
parquet scan, column pruning (fat token arrays NOT read when unused),
broadcast joins for small dims, and map-side projection before the
stateful dedup shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark import plans
from bitquery_kafka_streams_rust_spark.datagen import sequences_view
from bitquery_kafka_streams_rust_spark.operators.filters import FilterBuilder


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = FilterBuilder().value_range("l_quantity", 10.0, None).apply(li).select("l_orderkey")
    pushed = plans.pushed_filters(q)
    assert any("l_quantity" in f for f in pushed), pushed


def test_column_pruning_skips_unused(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    schemas = plans.read_schemas(q)
    assert schemas and all("l_extendedprice" not in s for s in schemas), schemas


def test_counting_does_not_read_tokens(spark, sf_dir):
    """The fat tokens array must not be materialized for a count over
    scalar columns — critical at 10^12 rows (SURVEY §4 column pruning)."""
    seq = sequences_view(spark, sf_dir)
    q = seq.groupBy("source").agg(F.sum("n_tok").alias("s"))
    # tokens are derived, not stored, so check the scan reads ONLY doc_id
    schemas = plans.read_schemas(q)
    assert schemas and all(s == "struct<doc_id:bigint>" for s in schemas), schemas


def test_broadcast_join_for_small_dim(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    q = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    assert plans.has_broadcast_join(q)


def test_two_level_agg_has_two_exchanges_max(spark, sf_dir):
    from bitquery_kafka_streams_rust_spark.operators.skew import two_level_agg

    seq = sequences_view(spark, sf_dir)
    q = two_level_agg(seq, "source", "doc_id", {"n": ("count", "*")})
    assert plans.count_exchanges(q) <= 2


def test_decode_stays_jvm_side(spark, sf_dir):
    """Token checksum/validation must run as Catalyst expressions —
    no Python evaluation node in the plan (higher-order lambdas aren't
    whole-stage-codegen'd, but they are still JVM-interpreted, which
    beats any Python round trip)."""
    from bitquery_kafka_streams_rust_spark.functions import tokens as TK

    seq = sequences_view(spark, sf_dir)
    q = seq.select(TK.token_checksum("tokens").alias("ck"))
    plan = plans.formatted_plan(q)
    assert "EvalPython" not in plan
    assert "Batched: true" in plan  # vectorized parquet scan


def test_minhash_band_shuffle_is_narrow(spark, sf_dir):
    """The 64-wide MinHash signature must NOT ride the band-join or
    pair-dedup exchanges (a dense near-dup family matches in every
    band, multiplying shuffled bytes by bands x |sig| — the 180s -> 20s
    regression this pins)."""
    from bitquery_kafka_streams_rust_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = DD.minhash_lsh_pairs(docs, threshold=0.8)
    plan = q._jdf.queryExecution().executedPlan().toString()
    # pair dedup appears as HashAggregate(keys=[id_a, id_b]); before the
    # fix it also aggregated first(sig_a)/first(sig_b), dragging both
    # 64-long arrays through its exchange
    dedup_aggs = [
        line
        for line in plan.splitlines()
        if "HashAggregate" in line and "id_a" in line and "id_b" in line
    ]
    assert dedup_aggs, "pair-dedup aggregate missing from the plan"
    for line in dedup_aggs:
        assert "sig" not in line, f"signature rides the pair dedup: {line[:160]}"
