"""hex / base58 encodings (D6/D7, base58_cache.rs:106-178 analog)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bitquery_kafka_streams_rust_spark.functions import encoding as ENC


def test_base58_roundtrip(spark):
    rows = [
        ("a", bytearray(b"hello")),
        ("b", bytearray(b"\x00\x00\x01")),   # leading zeros → '1' padding
        ("c", bytearray(b"")),
        ("d", None),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([T.StructField("k", T.StringType()), T.StructField("b", T.BinaryType())]),
    )
    out = {
        r["k"]: (r["s"], bytes(r["back"]) if r["back"] is not None else None)
        for r in df.select(
            "k",
            ENC.base58_encode("b").alias("s"),
            ENC.base58_decode(ENC.base58_encode("b")).alias("back"),
        ).collect()
    }
    assert out["a"] == ("Cn8eVZg", b"hello")
    assert out["b"][0].startswith("11")
    assert out["b"][1] == b"\x00\x00\x01"
    assert out["c"] == ("", b"")
    assert out["d"] == (None, None)


def test_base58_invalid_decode(spark):
    df = spark.createDataFrame([("0OIl",)], "s string")  # chars outside alphabet
    assert df.select(ENC.base58_decode("s").alias("b")).collect()[0]["b"] is None


def test_hex_lower(spark):
    df = spark.createDataFrame([(bytearray(b"\xab\xcd"),)], "b binary")
    assert df.select(ENC.hex_lower("b").alias("h")).collect()[0]["h"] == "abcd"


def test_base58_of_long_matches_python_and_decodes(spark):
    """The pure-Catalyst integer base58 (D7 fast path) matches the
    python reference on boundary values up to 2^63-1 (the rounded
    division must never truncate a digit) and round-trips through
    base58_decode."""
    from pyspark.sql import functions as F

    ids = [0, 1, 57, 58, 59, 3363, 123456789, 2**31, 58**10 - 1, 58**10,
           2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r["id"]: r["b"] for r in
           df.select("id", ENC.base58_of_long("id").alias("b")).collect()}

    def py_b58(n):
        if n == 0:
            return "1"
        out = []
        while n:
            n, r = divmod(n, 58)
            out.append(ENC._B58_ALPHABET[r])
        return "".join(reversed(out))

    for i in ids:
        assert got[i] == py_b58(i), i
    # decode closes the loop: int value of the decoded bytes == id
    back = {r["id"]: bytes(r["d"]) for r in df.select(
        "id", ENC.base58_decode(ENC.base58_of_long("id")).alias("d")).collect()}
    for i in ids:
        assert int.from_bytes(back[i], "big") == i
