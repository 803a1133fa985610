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
    # every SQL-expressible op has an oracle; the hash/LSH family is
    # rows-only by design (xxhash64 doesn't exist in the oracle engine)
    assert missing_oracle == {"minhash_lsh_pairs", "simhash_pairs", "emb_lsh_ann", "seq_packing"}
