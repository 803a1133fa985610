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


# -- P2 token-transfer extraction (consumer.rs:306-346) -----------------------


def transfer(amount=1000, sender=b"\x01\x02", receiver=b"\x03\x04", mint=b"\x05", decimals=9):
    return {
        "amount": amount,
        "sender": {"address": sender} if sender is not None else None,
        "receiver": {"address": receiver} if receiver is not None else None,
        "currency": {"mint_address": mint, "decimals": decimals} if mint is not None else None,
    }


def token_tx(idx, transfers=()):
    return {"idx": idx, "signature": f"sig{idx}".encode(), "transfers": list(transfers)}


@pytest.fixture(scope="module")
def token_blocks(spark):
    from bitquery_kafka_streams_rust_spark.schemas import TOKEN_BLOCKS

    rows = [
        # first tx has no transfers → the SECOND tx selected; first transfer of it
        {"block_id": 1, "slot": 10, "ts": T0,
         "transactions": [token_tx(0), token_tx(1, [transfer(amount=7), transfer(amount=8)])]},
        # no tx with transfers ⇒ no output row (consumer.rs:345)
        {"block_id": 2, "slot": 11, "ts": T0, "transactions": [token_tx(0)]},
        # missing optional sender/receiver/currency ⇒ "unknown" + decimals 0
        {"block_id": 3, "slot": 12, "ts": T0,
         "transactions": [token_tx(0, [transfer(sender=None, receiver=None, mint=None)])]},
    ]
    return spark.createDataFrame(rows, TOKEN_BLOCKS)


def test_token_transfer_first_of_first(token_blocks):
    out = {r["block_id"]: r for r in EX.extract_token_transfer(token_blocks).collect()}
    assert set(out) == {1, 3}
    assert out[1]["signature"] == "sig1".encode().hex()  # first tx WITH transfers
    assert out[1]["amount"] == "7"                       # first transfer, string precision
    assert out[1]["from_account"] == "0102"
    assert out[1]["to_account"] == "0304"
    assert out[1]["mint"] == "05"
    assert out[1]["decimals"] == 9
    assert out[1]["event_type"] == "token_transfer"


def test_token_transfer_unknown_defaults(token_blocks):
    out = {r["block_id"]: r for r in EX.extract_token_transfer(token_blocks).collect()}
    r3 = out[3]
    assert r3["from_account"] == "unknown"
    assert r3["to_account"] == "unknown"
    assert r3["mint"] == "unknown"
    assert r3["decimals"] == 0
