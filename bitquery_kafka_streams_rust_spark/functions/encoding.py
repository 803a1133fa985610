"""Byte-encoding helpers — hex and base58.

Mirrors D6 hex encoding (``src/consumer.rs:276,353``, built-in) and D7
base58 with LRU cache (``src/core/utils/base58_cache.rs:47-103``).  The
reference caches because it re-encodes the same addresses per event;
here Arrow dictionary encoding + vectorization amortize repeats, so the
UDF is cache-free.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def hex_lower(col: Column | str) -> Column:
    """Reference renders signatures as lowercase hex (``consumer.rs:276``)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.lower(F.hex(col))


def _b58encode(b: bytes) -> str:
    n = int.from_bytes(b, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    pad = 0
    for ch in b:
        if ch == 0:
            pad += 1
        else:
            break
    return "1" * pad + "".join(reversed(out))


def _b58decode(s: str) -> bytes | None:
    n = 0
    for ch in s:
        v = _B58_INDEX.get(ch)
        if v is None:
            return None
        n = n * 58 + v
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    pad = len(s) - len(s.lstrip("1"))
    return b"\x00" * pad + raw


def base58_of_long(col: Column | str) -> Column:
    """Base58 of a non-negative bigint as a PURE Catalyst expression —
    no UDF, no Python (the D7 fast path for integer ids; byte-string
    payloads keep the pandas UDF below).

    Digit k (of 11 — 58^11 > 2^63 covers any long) is extracted with
    EXACT long modulos; the one division per digit divides two numbers
    whose quotient is exact (≤ 57), so round() recovers it despite the
    double intermediate (a bare cast("long") would truncate q−ε to
    q−1).  Leading zero-digits strip like the canonical encoding;
    0 → "1".  The identical arithmetic runs in DuckDB SQL (integer `//`
    there, no rounding needed), so the op is oracle-checkable."""
    n = (F.col(col) if isinstance(col, str) else col).cast("long")
    chars = []
    for k in range(10, -1, -1):
        hi = n % F.lit(58 ** (k + 1)) if k < 10 else n  # 58^11 > 2^63: top digit uses n
        digit = F.round((hi - n % F.lit(58**k)) / F.lit(58**k)).cast("int")
        chars.append(F.lit(_B58_ALPHABET).substr(digit + 1, F.lit(1)))
    s = F.regexp_replace(F.concat(*chars), "^1+", "")
    return F.when(n == 0, F.lit("1")).otherwise(
        F.when(s == "", F.lit("1")).otherwise(s)
    )


@F.pandas_udf(T.StringType())
def base58_encode(b: pd.Series) -> pd.Series:
    return b.map(lambda x: None if x is None else _b58encode(bytes(x)))


@F.pandas_udf(T.BinaryType())
def base58_decode(s: pd.Series) -> pd.Series:
    return s.map(lambda x: None if x is None else _b58decode(x))
