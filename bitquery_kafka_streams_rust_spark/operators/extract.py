"""Projection / extraction — the reference's "SELECT".

The reference's parsers pick the FIRST matching child out of a repeated
field and project it with null-defaulting to "unknown"
(``src/consumer.rs:267-413``, P1-P3).  In Spark these are higher-order
array functions — ``filter`` + ``element_at`` — evaluated inside the
scan stage with zero shuffle, plus ``coalesce`` for the
``unwrap_or("unknown")`` defaults (``src/consumer.rs:315-327,377-389``).

Position-first selection is deterministic here because the fixture
carries an explicit ``idx`` (the reference relies on vector order —
SURVEY §7 hard-part 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNKNOWN = "unknown"


def _first(arr: Column, pred) -> Column:
    """First element of `arr` satisfying `pred` (NULL if none) — the
    `for … return first` loop at ``src/consumer.rs:271,310,352``."""
    return F.try_element_at(F.filter(arr, pred), F.lit(1))


def _coalesce_unknown(col: Column) -> Column:
    return F.coalesce(col, F.lit(UNKNOWN))


def extract_transaction(blocks: DataFrame) -> DataFrame:
    """P1 (``parse_block_message_content``, ``src/consumer.rs:267-304``):
    first *successful* tx per block → transaction event row; blocks with
    no successful tx produce no row (``:302-303``)."""
    tx = _first(F.col("transactions"), lambda t: t["success"])
    return (
        blocks.select(
            "block_id",
            "slot",
            "ts",
            tx.alias("tx"),
        )
        .where(F.col("tx").isNotNull())
        .select(
            "block_id",
            "slot",
            "ts",
            F.lit("transaction").alias("event_type"),
            F.col("tx.signature").alias("signature"),
            _coalesce_unknown(F.col("tx.fee_payer")).alias("signer"),
            F.col("tx.fee").alias("fee"),
            F.size("tx.trades").alias("trades_count"),
            F.size("tx.logs").alias("logs_count"),
        )
    )


def extract_token_transfer(blocks: DataFrame) -> DataFrame:
    """P2 (``parse_token_message_content``, ``src/consumer.rs:306-346``):
    first transfer of the first tx WITH transfers → token_transfer event
    row.  Byte fields (signature, addresses, mint) hex-encoded lowercase
    like the reference's ``hex::encode``; missing optional sub-structs
    default to "unknown" / decimals 0 (``:315-327``); amount rendered as
    a string for precision (``:338``)."""
    tx = _first(F.col("transactions"), lambda t: F.size(t["transfers"]) > 0)
    tr = F.try_element_at(F.col("tx.transfers"), F.lit(1))

    def _hex(col: Column) -> Column:
        return F.lower(F.hex(col))

    return (
        blocks.select("block_id", "slot", "ts", tx.alias("tx"))
        .where(F.col("tx").isNotNull())
        .select(
            "block_id",
            "slot",
            "ts",
            F.lit("token_transfer").alias("event_type"),
            _hex(F.col("tx.signature")).alias("signature"),
            tr.alias("t"),
        )
        .select(
            "block_id",
            "slot",
            "ts",
            "event_type",
            "signature",
            _coalesce_unknown(_hex(F.col("t.sender.address"))).alias("from_account"),
            _coalesce_unknown(_hex(F.col("t.receiver.address"))).alias("to_account"),
            _coalesce_unknown(_hex(F.col("t.currency.mint_address"))).alias("mint"),
            F.col("t.amount").cast("string").alias("amount"),
            F.coalesce(F.col("t.currency.decimals"), F.lit(0)).alias("decimals"),
        )
    )


def extract_dex_trade(blocks: DataFrame) -> DataFrame:
    """P3 (``parse_dex_message_content``, ``src/consumer.rs:348-413``):
    first trade of the first tx that has trades → dex_trade event row
    with "unknown" defaults for missing optional sub-structs."""
    tx = _first(F.col("transactions"), lambda t: F.size(t["trades"]) > 0)
    trade = F.try_element_at(F.col("tx.trades"), F.lit(1))
    return (
        blocks.select("block_id", "slot", "ts", tx.alias("tx"))
        .where(F.col("tx").isNotNull())
        .select(
            "block_id",
            "slot",
            "ts",
            F.lit("dex_trade").alias("event_type"),
            F.col("tx.signature").alias("signature"),
            trade.alias("t"),
        )
        .select(
            "block_id",
            "slot",
            "ts",
            "event_type",
            "signature",
            _coalesce_unknown(F.col("t.program_address")).alias("program_id"),
            _coalesce_unknown(F.col("t.market_address")).alias("market_address"),
            F.col("t.buy_amount").alias("amount_base"),
            F.col("t.sell_amount").alias("amount_quote"),
            _coalesce_unknown(F.col("t.buy_account")).alias("maker"),
            _coalesce_unknown(F.col("t.sell_account")).alias("taker"),
            F.col("t.fee").alias("fee"),
            F.col("t.royalty").alias("royalty"),
        )
    )


def explode_trades(blocks: DataFrame) -> DataFrame:
    """The faithful 1→N generalization of P1-P3 (SURVEY §2.12): every
    trade of every successful tx becomes a row.  `explode` is Spark's
    UDTF; ordering columns (tx idx, trade position) are kept so any
    "first" semantics stay reproducible."""
    tx = F.explode(F.filter("transactions", lambda t: t["success"])).alias("tx")
    ex = blocks.select("block_id", "slot", "ts", tx)
    tr = F.posexplode(F.col("tx.trades")).alias("pos", "t")
    return ex.select(
        "block_id",
        "slot",
        "ts",
        F.col("tx.idx").alias("tx_idx"),
        F.col("tx.signature").alias("signature"),
        tr,
    ).select(
        "block_id",
        "slot",
        "ts",
        "tx_idx",
        "signature",
        F.col("pos").alias("trade_idx"),
        _coalesce_unknown(F.col("t.program_address")).alias("program_id"),
        F.col("t.buy_amount").alias("amount_base"),
        F.col("t.sell_amount").alias("amount_quote"),
        F.col("t.fee").alias("fee"),
    )


# -- P4: typed accessors over dynamic JSON (src/events.rs:101-153) -----------


def json_accessor(json_col: str, *keys: str) -> Column:
    """Two-key fallback accessor: first non-null of ``$.key`` lookups —
    mirrors ``program_id()`` trying "program_id" then "program"
    (``src/events.rs:105-115``)."""
    return F.coalesce(*[F.get_json_object(F.col(json_col), f"$.{k}") for k in keys])


def json_double(json_col: str, key: str) -> Column:
    """String-precision numeric field → double (``src/events.rs:109-125``)."""
    return F.get_json_object(F.col(json_col), f"$.{key}").cast("double")


# -- P5/P6: derived value + CASE classification -------------------------------


def usd_value(amount_col: str = "amount_base", price_col: str = "price") -> Column:
    """``usd = amount_base * price``, 0 when price ≤ 0
    (``src/processors/dex_processor.rs:85``)."""
    return (
        F.when(F.col(price_col) > 0, F.col(amount_col) * F.col(price_col))
        .otherwise(F.lit(0.0))
        .alias("usd")
    )


def value_tier(usd_col: str = "usd") -> Column:
    """Tier classification >10k/>5k/>1k (``dex_processor.rs:144-148``)."""
    u = F.col(usd_col)
    return (
        F.when(u > 10_000, "huge")
        .when(u > 5_000, "large")
        .when(u > 1_000, "big")
        .otherwise("normal")
    )
