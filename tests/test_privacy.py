"""k-anonymity / l-diversity audit (operators/privacy.py) and TF-IDF
keyword extraction (operators/retrieval.py tfidf_topk_terms)."""

from __future__ import annotations

import math

from bitquery_kafka_streams_rust_spark.operators import privacy as PV
from bitquery_kafka_streams_rust_spark.operators.retrieval import tfidf_topk_terms

ROWS = [
    # (lang, band, source): class (en,0) has 5 rows / 2 sources;
    # (fr,1) has 2 rows / 1 source
    ("en", 0, "a"), ("en", 0, "a"), ("en", 0, "a"), ("en", 0, "b"), ("en", 0, "b"),
    ("fr", 1, "c"), ("fr", 1, "c"),
]


def test_k_anonymity_classes(spark):
    df = spark.createDataFrame(ROWS, "lang string, band int, source string")
    got = {
        (r["lang"], r["band"]): r
        for r in PV.k_anonymity(
            df, ["lang", "band"], k=5, sensitive_col="source", l=2
        ).collect()
    }
    en = got[("en", 0)]
    assert (en["class_n"], en["l_div"], en["at_risk_k"], en["at_risk_l"]) == (
        5, 2, False, False,
    )
    fr = got[("fr", 1)]
    assert (fr["class_n"], fr["l_div"], fr["at_risk_k"], fr["at_risk_l"]) == (
        2, 1, True, True,
    )


def test_k_anonymity_without_sensitive(spark):
    df = spark.createDataFrame(ROWS, "lang string, band int, source string")
    out = PV.k_anonymity(df, ["lang"], k=3)
    assert set(out.columns) == {"lang", "class_n", "at_risk_k"}
    got = {r["lang"]: r for r in out.collect()}
    assert not got["en"]["at_risk_k"] and got["fr"]["at_risk_k"]


def test_anonymity_summary(spark):
    df = spark.createDataFrame(ROWS, "lang string, band int, source string")
    cls = PV.k_anonymity(df, ["lang", "band"], k=5, sensitive_col="source", l=2)
    s = PV.anonymity_summary(cls).collect()[0]
    assert s["k_effective"] == 2 and s["n_classes"] == 2 and s["n_rows"] == 7
    assert s["rows_at_risk_k"] == 2 and s["rows_at_risk_l"] == 2
    assert abs(s["risk_share_k"] - round(2 / 7, 6)) <= 1e-9


def test_tfidf_ranks_discriminative_terms_first(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "spark spark spark common"),
            ("d2", "duck duck common"),
            ("d3", "common common plain"),
        ],
        "doc_id string, text string",
    )
    out = tfidf_topk_terms(docs, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = {d: sorted(rs, key=lambda r: r["rk"])[0] for d, rs in by_doc.items()}
    # the doc-specific term always outranks the corpus-wide 'common'
    assert top1["d1"]["term"] == "spark" and top1["d1"]["tf"] == 3
    assert top1["d2"]["term"] == "duck"
    # hand-check d2's duck score: tf=2, df=1, N=3
    idf9 = round(math.log(4 / 2), 9)
    assert abs(top1["d2"]["score"] - round(2 * idf9, 6)) <= 1e-9
    # rank never exceeds k and is dense from 1
    for rs in by_doc.values():
        assert sorted(r["rk"] for r in rs) == list(range(1, len(rs) + 1))


def test_tfidf_tie_breaks_by_term(spark):
    docs = spark.createDataFrame(
        [("d", "b a"), ("e", "x")], "doc_id string, text string"
    )
    rows = [r for r in tfidf_topk_terms(docs, k=2).collect() if r["doc_id"] == "d"]
    rows.sort(key=lambda r: r["rk"])
    assert [r["term"] for r in rows] == ["a", "b"]  # equal scores -> lexical
