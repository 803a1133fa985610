"""Property-based tests (hypothesis) for the token kernel.

The reference's compression tests cover round-trip + corruption edges
by hand (compression.rs:202-394); properties generalize them: ANY token
array round-trips through the binary codec, ANY byte string either
decodes to a valid array or cleanly to NULL, and the portable checksum
matches its Python definition on arbitrary inputs."""

from __future__ import annotations

import zlib

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from bitquery_kafka_streams_rust_spark.schemas import VOCAB_SIZE  # noqa: E402

tokens_st = st.lists(st.integers(min_value=0, max_value=VOCAB_SIZE - 1), max_size=300)


@pytest.fixture(scope="module")
def toolbox(spark):
    """One reusable createDataFrame→collect helper (sessions are costly
    per-example; hypothesis drives the pure-Python halves instead)."""
    return spark


def py_checksum(toks):
    return sum((i + 1) * t for i, t in enumerate(toks)) % 2**31


@given(tokens_st)
@settings(max_examples=200, deadline=None)
def test_codec_roundtrip_pure(tokens):
    """Pure-python halves of the codec (same code the pandas UDFs run)."""
    import numpy as np

    raw = np.asarray(tokens, dtype="<i4").tobytes()
    z = zlib.compress(raw, 1)
    payload = z if len(z) < len(raw) else raw
    # decode logic mirrored from functions.tokens.decode_tokens —
    # including the fall-back-to-raw when the magic is a false positive
    # (first token ≡ 120 mod 256 makes raw bytes start with 0x78)
    b = payload
    if len(b) >= 2 and b[0] == 0x78 and b[1] in (0x01, 0x5E, 0x9C, 0xDA):
        try:
            b = zlib.decompress(bytes(b))
        except zlib.error:
            pass
    assert len(b) % 4 == 0
    back = list(np.frombuffer(b, dtype="<i4"))
    assert back == tokens


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_decode_never_raises(payload):
    """Arbitrary bytes → decode returns a list or None, never raises
    (poison-pill D5 guarantee)."""
    import numpy as np

    def dec(b):
        if b is None:
            return None
        try:
            if len(b) >= 2 and b[0] == 0x78:
                b = zlib.decompress(bytes(b))
            if len(b) % 4 != 0:
                return None
            return np.frombuffer(b, dtype="<i4")
        except Exception:
            return None

    out = dec(payload)
    if out is not None:
        source = payload
        if len(payload) >= 2 and payload[0] == 0x78:
            source = zlib.decompress(bytes(payload))
        assert len(out) * 4 == len(source)


@given(st.lists(tokens_st, min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_checksum_spark_matches_python(spark, batches):
    df = spark.createDataFrame([(t,) for t in batches], "tokens array<int>")
    from bitquery_kafka_streams_rust_spark.functions.tokens import token_checksum

    got = sorted(r["ck"] for r in df.select(token_checksum("tokens").alias("ck")).collect())
    assert got == sorted(py_checksum(t) for t in batches)
