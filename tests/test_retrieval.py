"""BM25 top-k retrieval (operators/retrieval.py): hand-model parity,
determinism, and the TakeOrdered no-global-sort plan shape."""

from __future__ import annotations

import math

from bitquery_kafka_streams_rust_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    words = {d: [w for w in t.lower().split() if w] for d, t in corpus}
    n = len(words)
    avgdl = sum(len(w) for w in words.values()) / n
    out = {}
    for d, w in words.items():
        s = 0.0
        for t in terms:
            tf = w.count(t)
            df = sum(1 for ww in words.values() if t in ww)
            idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0), 9)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * len(w) / avgdl))
        out[d] = (len(w), round(s, 6))
    return out


def test_bm25_matches_python_model(spark):
    corpus = [
        (1, "hash join hash probe build"),
        (2, "merge sort merge spill merge"),
        (3, "window agg over partition"),
        (4, "scan filter project scan"),  # no query term: score 0, cut
        (5, "hash hash hash hash hash hash"),
    ]
    got = {
        r["doc_id"]: (r["dl"], r["score"])
        for r in bm25_topk(_docs(spark, corpus), ["hash", "merge"], k=10).collect()
    }
    ref = {d: v for d, v in _py_bm25(corpus, ["hash", "merge"]).items() if v[1] > 0}
    assert got == ref
    # saturation: six repeats of 'hash' must NOT score 6x one 'hash'
    assert got[5][1] < 3 * got[1][1]


def test_bm25_topk_cut_and_tiebreak(spark):
    corpus = [(i, "hash x") for i in range(1, 8)]  # identical scores
    rows = bm25_topk(_docs(spark, corpus), ["hash"], k=3).collect()
    assert [r["doc_id"] for r in rows] == [1, 2, 3]  # id-ascending ties


def test_bm25_plan_takeordered_no_nlj(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_topk(docs, ["hash", "merge", "window"], k=25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


# --- reciprocal-rank fusion ---------------------------------------------------


def test_rrf_matches_hand_model(spark):
    from bitquery_kafka_streams_rust_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "doc_id long, rank int")
    dense = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    rows = {
        r["doc_id"]: (r["rank_lex"], r["rank_dense"], r["rrf_score"])
        for r in rrf_fuse({"lex": lex, "dense": dense}, k=10).collect()
    }
    # doc 11 in both lists: 1/62 + 1/61
    assert rows[11] == (2, 1, round(1 / 62 + 1 / 61, 9))
    # absent list contributes 0 and surfaces the -1 sentinel
    assert rows[10] == (1, -1, round(1 / 61, 9))
    assert rows[13] == (-1, 2, round(1 / 62, 9))
    assert set(rows) == {10, 11, 12, 13}


def test_rrf_topk_and_tiebreak(spark):
    from bitquery_kafka_streams_rust_spark.operators.retrieval import rrf_fuse

    # equal scores -> ascending id wins; k cuts after the sort
    a = spark.createDataFrame([(i, 1) for i in (5, 3, 9)], "doc_id long, rank int")
    rows = rrf_fuse({"only": a}, k=2).collect()
    assert [r["doc_id"] for r in rows] == [3, 5]


def test_rrf_fixed_sum_order_is_deterministic(spark):
    from bitquery_kafka_streams_rust_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(i, i + 1) for i in range(20)], "doc_id long, rank int")
    dense = spark.createDataFrame([(i, 20 - i) for i in range(20)], "doc_id long, rank int")
    one = [(r["doc_id"], r["rrf_score"]) for r in rrf_fuse({"lex": lex, "dense": dense}, k=20).collect()]
    two = [(r["doc_id"], r["rrf_score"]) for r in rrf_fuse({"lex": lex, "dense": dense}, k=20).collect()]
    assert one == two and len(one) == 20


# --- retrieval_eval (recall / MRR / NDCG) --------------------------------------


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "q_id long, c_id long, rank int")


def test_retrieval_eval_perfect_and_disjoint(spark):
    from bitquery_kafka_streams_rust_spark.operators.retrieval import retrieval_eval

    truth = _ranked(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    perfect = retrieval_eval(truth, truth, k=3).collect()[0]
    assert (perfect["recall"], perfect["mrr"], perfect["ndcg"]) == (1.0, 1.0, 1.0)
    miss = _ranked(spark, [(1, 90, 1), (1, 91, 2), (1, 92, 3)])
    zero = retrieval_eval(miss, truth, k=3).collect()[0]
    assert (zero["recall"], zero["mrr"], zero["ndcg"]) == (0.0, 0.0, 0.0)


def test_retrieval_eval_hand_values(spark):
    from bitquery_kafka_streams_rust_spark.operators.retrieval import (
        dcg_discount_grid,
        retrieval_eval,
    )

    truth = _ranked(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    # candidate list hits truth docs at ranks 2 and 3 only
    cand = _ranked(spark, [(1, 99, 1), (1, 10, 2), (1, 12, 3)])
    r = retrieval_eval(cand, truth, k=3).collect()[0]
    g = dcg_discount_grid(3)
    assert r["recall"] == round(2 / 3, 6)
    assert r["mrr"] == 0.5
    assert r["ndcg"] == round((g[1] + g[2]) / sum(g), 6)


def test_retrieval_eval_order_sensitivity(spark):
    """Same hit SET, better order -> higher NDCG (recall ties)."""
    from bitquery_kafka_streams_rust_spark.operators.retrieval import retrieval_eval

    truth = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    good = _ranked(spark, [(1, 10, 1), (1, 99, 2)])
    bad = _ranked(spark, [(1, 99, 1), (1, 10, 2)])
    rg = retrieval_eval(good, truth, k=2).collect()[0]
    rb = retrieval_eval(bad, truth, k=2).collect()[0]
    assert rg["recall"] == rb["recall"]
    assert rg["ndcg"] > rb["ndcg"] and rg["mrr"] > rb["mrr"]
