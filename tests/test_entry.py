"""Driver-contract smoke: entry() rows>0, queries()/oracle_sql() keys align."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["win_start", "source", "n_seq", "sum_tok", "sum_cksum"]


def test_contract_keys_align():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    missing_oracle = set(q) - set(o)
    # every batch-expressible op has an oracle; streaming-only ops may not
    assert not missing_oracle or all(k.startswith("stream_") for k in missing_oracle)
