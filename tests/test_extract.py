"""P1-P3 extraction semantics on the nested BLOCKS fixture
(consumer.rs:267-413; FIXTURES.md §3 cases)."""

from __future__ import annotations

from datetime import datetime

import pytest

from bitquery_kafka_streams_rust_spark.operators import extract as EX
from bitquery_kafka_streams_rust_spark.schemas import BLOCKS

T0 = datetime(2024, 1, 1)


def trade(program="prog", market="mkt", buy_acct="b", sell_acct="s"):
    return {
        "program_address": program,
        "market_address": market,
        "buy_amount": 100,
        "sell_amount": 200,
        "buy_account": buy_acct,
        "sell_account": sell_acct,
        "fee": 5,
        "royalty": 1,
    }


def tx(idx, success=True, trades=(), fee_payer="payer"):
    return {
        "idx": idx,
        "signature": f"sig{idx}",
        "success": success,
        "fee": 1000 + idx,
        "fee_payer": fee_payer,
        "trades": list(trades),
        "logs": ["log1", "log2"],
    }


@pytest.fixture(scope="module")
def blocks(spark):
    rows = [
        # multiple successful txs: exactly the FIRST (by position) selected
        {"block_id": 1, "slot": 10, "ts": T0, "transactions": [tx(0, False), tx(1), tx(2)]},
        # no successful tx ⇒ no output row (consumer.rs:302-303)
        {"block_id": 2, "slot": 11, "ts": T0, "transactions": [tx(0, False)]},
        # missing optional sub-structs ⇒ "unknown" defaults
        {
            "block_id": 3,
            "slot": 12,
            "ts": T0,
            "transactions": [tx(0, True, [trade(program=None, buy_acct=None)], fee_payer=None)],
        },
        # dex extraction: first tx WITH trades (tx0 has none)
        {"block_id": 4, "slot": 13, "ts": T0, "transactions": [tx(0), tx(1, True, [trade(), trade(program="p2")])]},
    ]
    return spark.createDataFrame(rows, BLOCKS)


def test_first_successful_tx(blocks):
    out = {r["block_id"]: r for r in EX.extract_transaction(blocks).collect()}
    assert set(out) == {1, 3, 4}
    assert out[1]["signature"] == "sig1"  # first successful, not sig0/sig2
    assert out[3]["signer"] == "unknown"  # null fee_payer defaulted
    assert out[1]["logs_count"] == 2


def test_first_trade_extraction(blocks):
    out = {r["block_id"]: r for r in EX.extract_dex_trade(blocks).collect()}
    assert set(out) == {3, 4}
    assert out[4]["signature"] == "sig1"       # first tx WITH trades
    assert out[4]["program_id"] == "prog"      # first trade of that tx
    assert out[3]["program_id"] == "unknown"   # null program defaulted
    assert out[3]["maker"] == "unknown"


def test_explode_trades_1_to_n(blocks):
    rows = EX.explode_trades(blocks).collect()
    # block4/tx1 has 2 trades; block3/tx0 1 trade; failed txs excluded
    by_block = {}
    for r in rows:
        by_block.setdefault(r["block_id"], []).append(r)
    assert len(by_block[4]) == 2
    assert {r["trade_idx"] for r in by_block[4]} == {0, 1}
    assert len(by_block.get(3, [])) == 1
    assert 2 not in by_block


def test_value_tiers(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(15000.0,), (7000.0,), (2000.0,), (10.0,)], "usd double"
    ).withColumn("tier", EX.value_tier())
    assert [r["tier"] for r in df.collect()] == ["huge", "large", "big", "normal"]
