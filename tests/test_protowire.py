"""Jar-free protobuf wire codec (D4, sources/protowire.py).

Covers the three reference block-message shapes
(``schemas/{token_block_message,block_message,dex_block_message}.proto``)
wired to their extractors (P1-P3), poison pills, proto3 defaults,
unknown-field skipping — and golden hand-encoded bytes so decode
correctness does not depend on our own serializer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.extract import (
    extract_dex_trade,
    extract_token_transfer,
)
from bitquery_kafka_streams_rust_spark.sources import protowire as PW


# ---------------------------------------------------------------------------
# Pure-Python wire format (no Spark)
# ---------------------------------------------------------------------------


def test_golden_bytes_decode():
    # Hand-encoded TokenBlockMessage, independent of serialize_message:
    #   header  (field 1, wire 2): slot=300 (varint 0xac 0x02), ts=7
    #   tx      (field 2, wire 2): idx=1, signature=b"sig",
    #     transfer (field 5): amount=150 (0x96 0x01),
    #       sender  (field 3): address=b"AB"
    #       currency(field 6): decimals=9, mint=b"M"
    header = bytes([0x08, 0xAC, 0x02, 0x30, 0x07])
    sender = bytes([0x0A, 0x02]) + b"AB"
    currency = bytes([0x10, 0x09, 0x6A, 0x01]) + b"M"
    transfer = (
        bytes([0x10, 0x96, 0x01])
        + bytes([0x1A, len(sender)]) + sender
        + bytes([0x32, len(currency)]) + currency
    )
    tx = (
        bytes([0x08, 0x01])
        + bytes([0x12, 0x03]) + b"sig"
        + bytes([0x2A, len(transfer)]) + transfer
    )
    msg = (
        bytes([0x0A, len(header)]) + header
        + bytes([0x12, len(tx)]) + tx
    )
    out = PW.parse_message(msg, PW.TOKEN_BLOCK_MESSAGE)
    assert out["header"] == {"slot": 300, "timestamp": 7}
    (t,) = out["transactions"]
    assert t["idx"] == 1 and t["signature"] == b"sig"
    (tr,) = t["transfers"]
    assert tr["amount"] == 150
    assert tr["sender"] == {"address": b"AB"}
    assert tr["receiver"] is None  # absent submessage → None, not default
    assert tr["currency"] == {"decimals": 9, "mint_address": b"M"}


def test_proto3_defaults_and_negative_int64():
    # empty message: scalars default, submessages None, repeated []
    out = PW.parse_message(b"", PW.TOKEN_BLOCK_MESSAGE)
    assert out == {"header": None, "transactions": []}
    hdr = PW.parse_message(b"", PW.BLOCK_HEADER)
    assert hdr == {"slot": 0, "timestamp": 0}
    # int64 Timestamp < 0 (pre-epoch) survives: 10-byte varint round-trip
    wire = PW.serialize_message({"slot": 1, "timestamp": -5}, PW.BLOCK_HEADER)
    assert PW.parse_message(wire, PW.BLOCK_HEADER)["timestamp"] == -5
    # serializer omits default scalars like a proto3 serializer
    assert PW.serialize_message({"slot": 0, "timestamp": 0}, PW.BLOCK_HEADER) == b""


def test_unknown_fields_skipped():
    # Serialize with a RICHER descriptor (extra fields the reference
    # proto carries but our extractors never read), decode with the
    # narrow one: unknown varint/len-delimited/fixed fields all skip.
    rich = PW.Msg("RichHeader", {
        1: ("slot", "uint64", False),
        2: ("hash", "bytes", False),       # block_message.proto:84
        4: ("parent_slot", "uint64", False),
        6: ("timestamp", "int64", False),
    })
    wire = PW.serialize_message(
        {"slot": 42, "hash": b"\xde\xad", "parent_slot": 41, "timestamp": 9}, rich
    )
    assert PW.parse_message(wire, PW.BLOCK_HEADER) == {"slot": 42, "timestamp": 9}


def test_wrong_wire_type_and_range_poison_pill():
    """A declared field on the wrong wire type, a uint64 beyond int64,
    or a uint32 beyond int32 must RAISE (→ poison pill) — returning the
    raw value would pass corrupt=false and crash the Arrow conversion
    for the whole batch instead of dropping one row."""
    # field 1 (slot, declared uint64/varint) sent length-delimited
    bad_wt = bytes([0x0A, 0x02]) + b"xx"
    try:
        PW.parse_message(bad_wt, PW.BLOCK_HEADER)
        raise AssertionError("expected ValueError for wrong wire type")
    except ValueError as e:
        assert "wire type" in str(e)
    # legal proto3 uint64 = 2^63 (varint) → exceeds LongType
    big = bytearray([0x08])
    PW._write_varint(big, 1 << 63)
    try:
        PW.parse_message(bytes(big), PW.BLOCK_HEADER)
        raise AssertionError("expected ValueError for uint64 overflow")
    except ValueError as e:
        assert "int64" in str(e)
    # uint32 = 2^31 → exceeds IntegerType (Currency.decimals, field 2)
    big32 = bytearray([0x10])
    PW._write_varint(big32, 1 << 31)
    try:
        PW.parse_message(bytes(big32), PW.CURRENCY)
        raise AssertionError("expected ValueError for uint32 overflow")
    except ValueError as e:
        assert "int32" in str(e)
    # truncated fixed64 (unknown field 9, wire type 1) raises, same as
    # the varint/length-delimited paths
    try:
        PW.parse_message(bytes([0x49, 0x01, 0x02]), PW.BLOCK_HEADER)
        raise AssertionError("expected ValueError for truncated fixed64")
    except ValueError as e:
        assert "fixed64" in str(e)


def test_truncated_payload_raises():
    wire = PW.serialize_message({"slot": 300, "timestamp": 7}, PW.BLOCK_HEADER)
    for cut in (wire[:1], wire[:2] + b"\xff", wire + b"\x0a\x20"):
        try:
            PW.parse_message(cut, PW.BLOCK_HEADER)
        except ValueError:
            continue
        # some truncations still parse (suffix happens to be valid) — fine
    # definitely-corrupt: length prefix runs past the buffer
    try:
        PW.parse_message(b"\x0a\x7fxx", PW.TOKEN_BLOCK_MESSAGE)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_wire_roundtrip_property():
    """Property: serialize → parse is the identity (up to proto3
    normalization: default scalars indistinguishable from absent,
    None submessages preserved) for arbitrary TokenBlockMessage trees."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    accounts = st.one_of(st.none(), st.fixed_dictionaries({"address": st.binary(max_size=8)}))
    # decodable domain only: uint32 >= 2^31 / uint64 >= 2^63 are defined
    # poison pills (they don't fit Spark's int/long columns) — covered
    # by test_wrong_wire_type_and_range_poison_pill
    currencies = st.one_of(
        st.none(),
        st.fixed_dictionaries({
            "decimals": st.integers(0, 2**31 - 1),
            "mint_address": st.binary(max_size=8),
        }),
    )
    transfers = st.fixed_dictionaries({
        "amount": st.integers(0, 2**63 - 1),
        "sender": accounts,
        "receiver": accounts,
        "currency": currencies,
    })
    txs = st.fixed_dictionaries({
        "idx": st.integers(0, 2**31 - 1),
        "signature": st.binary(max_size=12),
        "transfers": st.lists(transfers, max_size=3),
    })
    msgs = st.fixed_dictionaries({
        "header": st.one_of(
            st.none(),
            st.fixed_dictionaries({
                "slot": st.integers(0, 2**63 - 1),
                "timestamp": st.integers(-(2**62), 2**62),
            }),
        ),
        "transactions": st.lists(txs, max_size=3),
    })

    def norm(v, desc):
        # what proto3 round-trip preserves: absent == default for scalars
        out = {}
        for fname, ftyp, repeated in desc.fields.values():
            x = None if v is None else v.get(fname)
            if repeated:
                sub = ftyp if isinstance(ftyp, PW.Msg) else None
                out[fname] = [norm(i, sub) if sub else i for i in (x or [])]
            elif isinstance(ftyp, PW.Msg):
                out[fname] = None if x is None else norm(x, ftyp)
            else:
                out[fname] = PW._SCALAR_DEFAULT[ftyp] if x is None else x
        return out

    @given(msgs)
    @settings(max_examples=150, deadline=None)
    def check(msg):
        wire = PW.serialize_message(msg, PW.TOKEN_BLOCK_MESSAGE)
        assert PW.parse_message(wire, PW.TOKEN_BLOCK_MESSAGE) == norm(
            msg, PW.TOKEN_BLOCK_MESSAGE
        )

    check()


# ---------------------------------------------------------------------------
# DataFrame codec (mapInPandas) + extractor wiring
# ---------------------------------------------------------------------------


def test_token_block_wire_roundtrip_p2(spark, sf_dir):
    from bitquery_kafka_streams_rust_spark import datagen

    blocks = datagen.token_blocks_view(spark, sf_dir).limit(40)
    prepped = blocks.select(
        F.col("block_id").alias("key"),
        F.struct(
            F.col("slot").alias("slot"), F.unix_timestamp("ts").alias("timestamp")
        ).alias("header"),
        "transactions",
    )
    wire = PW.encode_frame(prepped, PW.TOKEN_BLOCK_MESSAGE, key_col="key")
    decoded = PW.token_blocks_from_wire(wire)
    got = {
        r["block_id"]: r
        for r in extract_token_transfer(decoded).collect()
    }
    want = {
        r["block_id"]: r
        for r in extract_token_transfer(blocks).collect()
    }
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert got[k] == want[k]


def test_wire_poison_pill_dropped(spark):
    rows = [("1", bytearray(b"\xff\xff\xff\xff\xff")), ("2", None)]
    ok = PW.serialize_message(
        {"header": {"slot": 70, "timestamp": 3}, "transactions": []},
        PW.TOKEN_BLOCK_MESSAGE,
    )
    rows.append(("7", bytearray(ok)))
    wire = spark.createDataFrame(rows, "key string, value binary")
    out = PW.token_blocks_from_wire(wire).collect()
    assert [(r["block_id"], r["slot"]) for r in out] == [(7, 70)]
    # and the drop is countable (D5 log-count-commit-continue)
    n_bad = PW.decode_frame(wire, PW.TOKEN_BLOCK_MESSAGE).where("corrupt").count()
    assert n_bad == 2


def test_block_message_wire_p1(spark):
    """P1 shape (BlockMessage): first-successful-tx selection over the
    decoded reference-faithful transactions."""
    msgs = [
        {  # block 1: tx0 failed, tx1 success → picks tx1
            "header": {"slot": 10, "timestamp": 100},
            "transactions": [
                {"signature": b"t0", "status": {"success": False},
                 "header": {"fee": 5, "fee_payer": b"p0"}, "logs": ["a"], "index": 0},
                {"signature": b"t1", "status": {"success": True},
                 "header": {"fee": 7, "fee_payer": b"p1"}, "logs": ["a", "b"], "index": 1},
            ],
        },
        {  # block 2: no successful tx → no row
            "header": {"slot": 20, "timestamp": 200},
            "transactions": [
                {"signature": b"t2", "status": {"success": False},
                 "header": {"fee": 1, "fee_payer": b"p2"}, "logs": [], "index": 0},
            ],
        },
    ]
    wire = spark.createDataFrame(
        [(str(i + 1), bytearray(PW.serialize_message(m, PW.BLOCK_MESSAGE)))
         for i, m in enumerate(msgs)],
        "key string, value binary",
    )
    dec = PW.decode_frame(wire, PW.BLOCK_MESSAGE).where(~F.col("corrupt"))
    first_ok = F.try_element_at(
        F.filter("transactions", lambda t: t["status"]["success"]), F.lit(1)
    )
    out = (
        dec.select(
            F.col("key").cast("long").alias("block_id"),
            F.col("header.slot").alias("slot"),
            first_ok.alias("tx"),
        )
        .where(F.col("tx").isNotNull())
        .select(
            "block_id", "slot",
            F.col("tx.signature").alias("signature"),
            F.col("tx.header.fee").alias("fee"),
            F.col("tx.header.fee_payer").alias("fee_payer"),
            F.size("tx.logs").alias("logs_count"),
        )
        .collect()
    )
    assert [tuple(r) for r in out] == [(1, 10, bytearray(b"t1"), 7, bytearray(b"p1"), 2)]


def test_wire_decode_in_streaming_pipeline(spark, sf_dir, tmp_path):
    """The reference's front door is STREAMING decode (topic → protobuf
    → extract, consumer.rs:213-230): the wire codec must run identically
    under Structured Streaming.  Kafka-shaped (key, value) records
    stream from parquet → decode → P2 extract → memory sink; output
    equals the batch extraction row-for-row."""
    from bitquery_kafka_streams_rust_spark import datagen

    blocks = datagen.token_blocks_view(spark, sf_dir).limit(60)
    prepped = blocks.select(
        F.col("block_id").alias("key"),
        F.struct(
            F.col("slot").alias("slot"), F.unix_timestamp("ts").alias("timestamp")
        ).alias("header"),
        "transactions",
    )
    wire_dir = str(tmp_path / "wire")
    PW.encode_frame(prepped, PW.TOKEN_BLOCK_MESSAGE, key_col="key").write.parquet(wire_dir)

    stream = spark.readStream.schema("key string, value binary").parquet(wire_dir)
    out = extract_token_transfer(PW.token_blocks_from_wire(stream))
    q = (
        out.writeStream.format("memory")
        .queryName("wire_stream_p2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {r["block_id"]: r for r in spark.sql("SELECT * FROM wire_stream_p2").collect()}
    want = {r["block_id"]: r for r in extract_token_transfer(blocks).collect()}
    assert len(want) > 0 and set(got) == set(want)
    for k in want:
        assert got[k] == want[k]


def test_dex_message_wire_p3(spark):
    """P3 shape (DexParsedBlockMessage) through dex_blocks_from_wire →
    extract_dex_trade, including an absent Dex submessage → 'unknown'."""
    msgs = [
        {
            "header": {"slot": 30, "timestamp": 300},
            "transactions": [
                {"idx": 0, "signature": b"s0", "trades": []},  # skipped (no trades)
                {"idx": 1, "signature": b"s1", "trades": [
                    {"dex": {"program_address": b"PG"},
                     "market": {"market_address": b"MK"},
                     "buy": {"amount": 100, "account": {"address": b"BA"}},
                     "sell": {"amount": 200, "account": {"address": b"SA"}},
                     "royalty": 3, "fee": 4},
                ]},
            ],
        },
        {
            "header": {"slot": 40, "timestamp": 400},
            "transactions": [
                {"idx": 0, "signature": b"s2", "trades": [
                    {"dex": None,  # unwrap_or("unknown") branch
                     "market": {"market_address": b"M2"},
                     "buy": {"amount": 1, "account": {"address": b"B2"}},
                     "sell": {"amount": 2, "account": {"address": b"S2"}},
                     "royalty": 0, "fee": 0},
                ]},
            ],
        },
    ]
    wire = spark.createDataFrame(
        [(str(i + 1), bytearray(PW.serialize_message(m, PW.DEX_BLOCK_MESSAGE)))
         for i, m in enumerate(msgs)],
        "key string, value binary",
    )
    out = {
        r["block_id"]: r
        for r in extract_dex_trade(PW.dex_blocks_from_wire(wire)).collect()
    }
    assert set(out) == {1, 2}
    r1 = out[1]
    assert (r1["slot"], r1["signature"]) == (30, "7331")  # hex('s1')
    assert (r1["program_id"], r1["market_address"]) == ("5047", "4d4b")
    assert (r1["amount_base"], r1["amount_quote"]) == (100, 200)
    assert (r1["maker"], r1["taker"]) == ("4241", "5341")
    assert (r1["fee"], r1["royalty"]) == (4, 3)
    r2 = out[2]
    assert r2["program_id"] == "unknown"  # absent DexInfo → unknown
    assert (r2["amount_base"], r2["amount_quote"]) == (1, 2)


def test_parse_message_total_on_random_bytes():
    """Fuzz: parse_message over arbitrary byte strings either succeeds
    or raises ValueError (the controlled poison-pill signal) — never
    IndexError/KeyError/RecursionError, which would escape decode_frame's
    per-row containment as a task-killing bug class."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.binary(max_size=300))
    @settings(max_examples=300, deadline=None)
    def check(b):
        try:
            PW.parse_message(b, PW.TOKEN_BLOCK_MESSAGE)
        except ValueError:
            pass  # includes UnicodeDecodeError (a ValueError subclass)

    check()


def test_split_submessage_merges_proto3():
    """A non-repeated message field split across several wire
    occurrences must MERGE (proto3: decoding concatenated partial
    messages == decoding the concatenation), not last-wins-replace."""
    h1 = bytes([0x08, 0xAC, 0x02])  # slot=300
    h2 = bytes([0x30, 0x07])        # timestamp=7
    msg = bytes([0x0A, len(h1)]) + h1 + bytes([0x0A, len(h2)]) + h2
    out = PW.parse_message(msg, PW.TOKEN_BLOCK_MESSAGE)
    assert out["header"] == {"slot": 300, "timestamp": 7}


def test_split_submessage_scalar_last_wins():
    """Within a merged submessage, a scalar set in BOTH occurrences
    takes the later value; fields set only in the earlier occurrence
    survive (the later occurrence's absent-field defaults must not
    clobber them)."""
    h1 = bytes([0x08, 0x05, 0x30, 0x07])  # slot=5, timestamp=7
    h2 = bytes([0x08, 0x09])              # slot=9 — later wins
    msg = bytes([0x0A, len(h1)]) + h1 + bytes([0x0A, len(h2)]) + h2
    out = PW.parse_message(msg, PW.TOKEN_BLOCK_MESSAGE)
    assert out["header"] == {"slot": 9, "timestamp": 7}
