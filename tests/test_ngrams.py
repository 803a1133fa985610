"""Unit tests for operators/ngrams.py — LM n-gram count tables."""

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import ngrams as NG


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int",
    )


def test_explode_ngrams_values_and_short_docs(spark):
    df = _docs(
        spark,
        [
            ("a", [1, 2, 3, 4]),   # grams: 1,2,3 / 2,3,4
            ("b", [7, 8]),          # shorter than n: nothing
            ("c", []),              # empty: nothing
        ],
    )
    got = {(r["doc_id"], r["gram"]) for r in NG.explode_ngrams(df, 3).collect()}
    assert got == {("a", "1,2,3"), ("a", "2,3,4")}


def test_ngram_stats_counts_and_df(spark):
    df = _docs(
        spark,
        [
            ("a", [1, 2, 3, 1, 2, 3]),  # 1,2,3 x2 (once overlapping restart)
            ("b", [1, 2, 3]),           # 1,2,3 x1 in a second doc
            ("b", [1, 2, 3]),           # bit-identical duplicate row, same id
        ],
    )
    rows = {
        r["gram"]: (r["n_occur"], r["n_doc"])
        for r in NG.ngram_stats(df, 3, min_count=1, top_k=None).collect()
    }
    # occurrences count every row; document frequency counts ids once
    assert rows["1,2,3"] == (4, 2)
    assert rows["2,3,1"] == (1, 1)
    assert rows["3,1,2"] == (1, 1)


def test_ngram_stats_min_count_and_topk_determinism(spark):
    df = _docs(spark, [("a", [5, 5, 5, 5, 5]), ("b", [9, 9, 9])])
    out = NG.ngram_stats(df, 3, min_count=2, top_k=1).collect()
    assert [(r["gram"], r["n_occur"]) for r in out] == [("5,5,5", 3)]
    plan = out and NG.ngram_stats(df, 3, top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # bounded, never a global sort


def test_ngram_continuations_distribution(spark):
    # prefix (1,2) continues to 3 three times and 4 once
    df = _docs(
        spark,
        [
            ("a", [1, 2, 3, 0, 1, 2, 3, 0, 1, 2, 3]),
            ("b", [1, 2, 4]),
        ],
    )
    out = NG.ngram_continuations(df, 3, k=2, min_prefix_count=1).collect()
    by_prefix = {}
    for r in out:
        by_prefix.setdefault(r["prefix"], []).append(r)
    top = sorted(by_prefix["1,2"], key=lambda r: r["rank"])
    assert [(r["next_tok"], r["n_occur"], r["rank"]) for r in top] == [
        (3, 3, 1),
        (4, 1, 2),
    ]
    assert top[0]["prefix_total"] == 4
    assert abs(top[0]["prob"] - 0.75) < 1e-9
    assert abs(top[1]["prob"] - 0.25) < 1e-9


def test_ngram_continuations_limit_rows_deterministic(spark):
    df = _docs(spark, [("a", list(range(20))), ("b", list(range(20)))])
    full = NG.ngram_continuations(df, 3, k=1, min_prefix_count=1).count()
    cut = NG.ngram_continuations(df, 3, k=1, min_prefix_count=1, limit_rows=5)
    rows = cut.collect()
    assert full > 5 and len(rows) == 5
    # hottest-first ordering: every kept row's total >= any dropped row's
    assert all(r["prefix_total"] == 2 for r in rows)


def test_lm_score_matches_hand_model(spark):
    """Add-α trigram LM cross-entropy against a pure-Python model:
    P(w|pre) = (c(pre,w)+α)/(c(pre)+α·V); docs shorter than n emit no
    row; a repeated in-doc gram weighs by its multiplicity."""
    import math

    df = _docs(
        spark,
        [
            ("a", [1, 2, 3, 2, 3, 2, 3]),  # grams 123,232,323,232,323
            ("b", [1, 2, 4]),              # gram 124
            ("c", [9]),                    # too short: absent
        ],
    )
    out = {r["doc_id"]: r for r in NG.lm_score(df, 3, alpha=0.5).collect()}
    assert set(out) == {"a", "b"}
    V, al = 4, 0.5  # distinct tokens {1,2,3,4,9}? no: 9 IS in corpus -> 5
    V = 5
    c = {("1,2", 3): 1, ("1,2", 4): 1, ("2,3", 2): 2, ("3,2", 3): 2}
    cp = {"1,2": 2, "2,3": 2, "3,2": 2}

    def lp(pre, w):
        return math.log((c[(pre, w)] + al) / (cp[pre] + al * V))

    xa = -(lp("1,2", 3) + 2 * lp("2,3", 2) + 2 * lp("3,2", 3)) / 5
    xb = -lp("1,2", 4)
    assert out["a"]["n_grams"] == 5 and out["b"]["n_grams"] == 1
    assert abs(out["a"]["xent"] - round(xa, 4)) < 1e-9
    assert abs(out["b"]["xent"] - round(xb, 4)) < 1e-9
    assert abs(out["a"]["ppl"] - round(math.exp(round(xa, 4)), 3)) < 1e-9


def test_lm_score_vocab_override_and_no_array_shuffle(spark):
    df = _docs(spark, [("a", [1, 2, 3, 4]), ("b", [2, 3, 4, 5])])
    out = NG.lm_score(df, 3, alpha=0.5, vocab_size=100)
    rows = out.collect()
    assert len(rows) == 2
    # repo invariant: the tokens array never crosses a shuffle — no
    # exchange row schema mentions the array column
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "tokens" not in line


def test_lm_score_reliable_identical(spark):
    """reliable=True (lineage-keeping DISK_ONLY materialization of the
    corpus-sized docgram table) is value-identical to the default
    localCheckpoint path (VERDICT r4 item 5)."""
    from bitquery_kafka_streams_rust_spark.operators.ngrams import lm_score

    df = _docs(
        spark,
        [("a", [1, 2, 3, 2, 3, 2, 3]), ("b", [1, 2, 4]), ("d", [1, 2, 3, 4])],
    )
    base = sorted(map(tuple, lm_score(df, n=3, alpha=0.5).collect()))
    rel = sorted(map(tuple, lm_score(df, n=3, alpha=0.5, reliable=True).collect()))
    assert base == rel and len(base) == 3


def test_collocation_pmi_hand_model(spark):
    import math

    # corpus: [1,2,1,2] and [1,2,3] ->
    # bigrams: (1,2)x2+(2,1)x1 in doc a; (1,2),(2,3) in doc b
    # c(1,2)=3, c(2,1)=1, c(2,3)=1; T=5 bigram positions
    # unigrams: 1x3, 2x3, 3x1; U=7
    seq = _docs(spark, [("a", [1, 2, 1, 2]), ("b", [1, 2, 3])])
    out = NG.collocation_pmi(seq, min_count=2, top_k=10)
    rows = out.collect()
    assert len(rows) == 1  # only (1,2) clears min_count=2
    r = rows[0]
    assert (r["tok_a"], r["tok_b"], r["c_pair"], r["c_a"], r["c_b"]) == (1, 2, 3, 3, 3)
    expect = round(math.log((3 / 5.0) / ((3 / 7.0) * (3 / 7.0))), 6)
    assert r["pmi"] == expect


def test_collocation_pmi_topk_tiebreak(spark):
    # two pairs with identical counts -> identical pmi -> (tok_a, tok_b)
    # ascending tie-break decides the cut
    seq = _docs(spark, [("a", [5, 6]), ("b", [5, 6]), ("c", [7, 8]), ("d", [7, 8])])
    out = NG.collocation_pmi(seq, min_count=2, top_k=1)
    r = out.collect()[0]
    assert (r["tok_a"], r["tok_b"]) == (5, 6)


def test_nucleus_sets_hand_distribution(spark):
    from bitquery_kafka_streams_rust_spark.operators.ngrams import nucleus_sets

    # one prefix "1,2" with continuations: 5x3, 3x4, 1x5, 1x6 (total 10)
    docs = []
    for i, nxt in enumerate([3] * 5 + [4] * 3 + [5, 6]):
        docs.append((f"d{i}", [1, 2, nxt], 3))
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>, n_tok int")
    rows = nucleus_sets(df, 3, p_num=8, p_den=10, min_prefix_count=8).collect()
    got = sorted((r["next_tok"], r["rank"], r["cum_n"], r["nucleus_size"])
                 for r in rows)
    # p=0.8: keep 3 (cum 5, excl 0), 4 (cum 8, excl 5), 5 (excl 8 == 8 -> 8*10 < 8*10 false? no: excl*den=80 < num*total=80 is FALSE -> dropped)
    assert got == [(3, 1, 5, 2), (4, 2, 8, 2)]
    # p just above 0.8 admits the crossing third token
    rows2 = nucleus_sets(df, 3, p_num=81, p_den=100, min_prefix_count=8).collect()
    assert sorted(r["next_tok"] for r in rows2) == [3, 4, 5]


def test_nucleus_p_one_keeps_everything(spark):
    from bitquery_kafka_streams_rust_spark.operators.ngrams import nucleus_sets

    docs = [(f"d{i}", [1, 2, i % 4], 3) for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>, n_tok int")
    rows = nucleus_sets(df, 3, p_num=1, p_den=1, min_prefix_count=8).collect()
    assert sorted(r["next_tok"] for r in rows) == [0, 1, 2, 3]
    assert all(r["nucleus_size"] == 4 for r in rows)
