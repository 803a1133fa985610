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
