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
