"""packing.span_corrupt: T5 multi-span corruption vs a pure-Python
reference (same geometry), structural invariants, degenerate sizes."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators.packing import (
    _SC_SALT,
    span_corrupt,
)

KNUTH, MOD = 2654435761, 2**31


def _frac(c, s):
    h = ((c * 131 + s) ^ _SC_SALT) % MOD * KNUTH % MOD
    for sh in (13, 17):
        h = (h ^ (h >> sh)) * KNUTH % MOD
    return h / MOD


def _ref(c, toks, sb=60000):
    """Textbook construction: explicit span list, explicit sequences —
    asserts non-overlap and in-bounds as it goes."""
    n = len(toks)
    nb = max(1, n * 3 // 20)
    k = max(1, nb // 3)
    base, rem = nb // k, nb % k
    spans = []
    for s in range(k):
        ln = base + (1 if s < rem else 0)
        seg_s, seg_e = s * n // k, (s + 1) * n // k
        st = seg_s + int(_frac(c, s) * (seg_e - seg_s - ln + 1)) + 1
        spans.append((st, ln))
    inp, tg, prev = [], [], 1
    for s, (st, ln) in enumerate(spans):
        assert prev <= st and st + ln - 1 <= n, (c, s, st, ln, n)
        inp += toks[prev - 1 : st - 1] + [sb + s]
        tg += [sb + s] + toks[st - 1 : st + ln - 1]
        prev = st + ln
    inp += toks[prev - 1 :]
    tg += [sb + k]
    ck = lambda a: sum((i + 1) * t for i, t in enumerate(a)) % MOD
    return (n, k, nb, len(inp), len(tg), ck(inp), ck(tg))


def _cases():
    out = {}
    for c, ntok in zip(
        (8, 9, 20, 33, 100, 250, 999, 5000, 77777),
        (8, 9, 12, 20, 41, 100, 333, 2047, 64),
    ):
        out[c] = [(c * 7 + i * 13) % 50257 for i in range(ntok)]
    return out


def test_matches_python_reference(spark):
    cases = _cases()
    df = spark.createDataFrame(
        [(f"doc{c}", t) for c, t in cases.items()],
        "doc_id string, tokens array<int>",
    )
    got = {r["doc_id"]: tuple(r)[1:] for r in span_corrupt(df).collect()}
    assert len(got) == len(cases)
    for c, toks in cases.items():
        assert got[f"doc{c}"] == _ref(c, toks), c


def test_length_identities_and_budget(spark):
    df = spark.createDataFrame(
        [(f"doc{c}", t) for c, t in _cases().items()],
        "doc_id string, tokens array<int>",
    )
    for r in span_corrupt(df).collect():
        # inputs drop nb noise tokens, add k sentinels; targets are the
        # nb noise tokens plus k span sentinels plus the terminator
        assert r["inputs_len"] == r["n_tok"] - r["noise_tok"] + r["n_spans"]
        assert r["targets_len"] == r["noise_tok"] + r["n_spans"] + 1
        # ~15% noise budget, never zero
        assert 1 <= r["noise_tok"] <= max(1, r["n_tok"] * 3 // 20)
        assert r["n_spans"] == max(1, r["noise_tok"] // 3)


def test_short_docs_excluded_and_dedup(spark):
    df = spark.createDataFrame(
        [
            ("doc1", [1, 2, 3, 4, 5, 6, 7]),  # n=7 < min_len
            ("doc2", list(range(10))),
            ("doc2", list(range(10))),  # bit-identical duplicate row
        ],
        "doc_id string, tokens array<int>",
    )
    out = span_corrupt(df).collect()
    assert [r["doc_id"] for r in out] == ["doc2"]
