"""Predicate truth tables ported from the reference unit tests
(src/filters.rs tests; src/processors/dex_processor.rs:226-324;
src/processors/transaction_processor.rs:77-140)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.filters import FilterBuilder, sequence_gate
from bitquery_kafka_streams_rust_spark.schemas import EVENTS_SOLANA

TS = datetime(2024, 1, 1)


def mk_events(spark, rows):
    """rows: list of dicts with defaults filled (mock factory analog of
    dex_processor.rs:232-246)."""
    defaults = dict(
        event_type="dex_trade",
        slot=1000,
        signature="sig",
        ts=TS,
        program_id="prog_a",
        market_address="mkt",
        side="BUY",
        amount_base=100.0,
        price=2.0,
        amount=None,
        fee=5000,
    )
    data = [{**defaults, **r} for r in rows]
    return spark.createDataFrame(data, EVENTS_SOLANA)


def names(df):
    return {r["signature"] for r in df.collect()}


def test_event_types_empty_passes_all(spark):
    """filters.rs:46-50 — empty list = pass."""
    df = mk_events(spark, [{"signature": "a"}, {"signature": "b", "event_type": "transaction"}])
    assert names(FilterBuilder().event_types([]).apply(df)) == {"a", "b"}
    assert names(FilterBuilder().event_types(["dex_trade"]).apply(df)) == {"a"}


def test_slot_range_inclusive(spark):
    """filters.rs:53-62 — inclusive on both ends."""
    df = mk_events(
        spark,
        [
            {"signature": "lo", "slot": 10},
            {"signature": "mid", "slot": 15},
            {"signature": "hi", "slot": 20},
            {"signature": "out", "slot": 21},
        ],
    )
    out = FilterBuilder().value_range("slot", 10, 20).apply(df)
    assert names(out) == {"lo", "mid", "hi"}


def test_program_membership_null_rejected(spark):
    """filters.rs:65-79 — missing program ⇒ reject."""
    df = mk_events(
        spark,
        [
            {"signature": "in", "program_id": "prog_a"},
            {"signature": "out", "program_id": "prog_z"},
            {"signature": "null", "program_id": None},
        ],
    )
    out = FilterBuilder().isin("program_id", ["prog_a", "prog_b"]).apply(df)
    assert names(out) == {"in"}


def test_min_amount_type_dispatch_and_exemption(spark):
    """filters.rs:82-107 — DexTrade→amount_base, TokenTransfer→amount,
    other types exempt; missing amount on relevant type ⇒ reject."""
    df = mk_events(
        spark,
        [
            {"signature": "dex_big", "amount_base": 100.0},
            {"signature": "dex_small", "amount_base": 1.0},
            {"signature": "dex_null", "amount_base": None},
            {"signature": "tt_big", "event_type": "token_transfer", "amount": 500},
            {"signature": "tt_small", "event_type": "token_transfer", "amount": 1},
            {"signature": "tx_exempt", "event_type": "transaction", "amount_base": None},
        ],
    )
    out = (
        FilterBuilder()
        .min_amount(50.0, {"dex_trade": "amount_base", "token_transfer": "amount"})
        .apply(df)
    )
    assert names(out) == {"dex_big", "tt_big", "tx_exempt"}


def test_processor_gate_boundary_equals_passes(spark):
    """dex_processor.rs:274-295 — usd == threshold passes (>=); price<=0
    or unparsable rejected; empty allowlist passes any program."""
    from bitquery_kafka_streams_rust_spark.operators.extract import usd_value

    df = mk_events(
        spark,
        [
            {"signature": "exact", "amount_base": 50.0, "price": 2.0},  # usd = 100
            {"signature": "below", "amount_base": 49.0, "price": 2.0},
            {"signature": "zero_price", "amount_base": 1000.0, "price": 0.0},
            {"signature": "null_price", "amount_base": 1000.0, "price": None},
        ],
    )
    gated = df.withColumn("usd", usd_value()).where(
        (F.col("event_type") == "dex_trade") & (F.col("usd") >= 100.0)
    )
    assert names(gated) == {"exact"}
    # empty allowlist passes any program (dex_processor.rs:298-305)
    out = FilterBuilder().isin("program_id", []).apply(df)
    assert out.count() == 4


def test_custom_predicate_and_conjunction(spark):
    """filters.rs:117-121 — custom closure AND-ed with the rest."""
    df = mk_events(
        spark,
        [
            {"signature": "a", "slot": 5, "side": "BUY"},
            {"signature": "b", "slot": 5, "side": "SELL"},
            {"signature": "c", "slot": 50, "side": "BUY"},
        ],
    )
    out = (
        FilterBuilder()
        .value_range("slot", None, 10)
        .custom(F.col("side") == "BUY")
        .apply(df)
    )
    assert names(out) == {"a"}


def test_sequence_gate(spark, sf_dir):
    from bitquery_kafka_streams_rust_spark.datagen import sequences_view

    seq = sequences_view(spark, sf_dir)
    out = seq.where(sequence_gate(("pumpfun",), min_n_tok=100, max_n_tok=2000))
    rows = out.select("source", "n_tok").distinct().collect()
    assert all(r["source"] == "pumpfun" and 100 <= r["n_tok"] <= 2000 for r in rows)
    assert out.count() > 0
