"""Cross-doc repeated-substring spans (operators/spans.py): hand-built
span geometry, interval-union coverage, multiplicity invariance, and
the narrow-shuffle plan shape."""

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import spans as SP


def _seqs(spark, rows):
    return spark.createDataFrame(
        [(d, t) for d, t in rows], "doc_id string, tokens array<int>"
    )


def test_single_shared_window(spark):
    # b embeds exactly a[5..12] (one 8-gram match, nothing longer)
    a = list(range(1, 21))
    b = [101, 102] + a[4:12] + [201, 202, 203]
    out = {
        r["doc_id"]: r
        for r in SP.dup_span_stats(
            _seqs(spark, [("a", a), ("b", b)]), n=8
        ).collect()
    }
    assert set(out) == {"a", "b"}
    ra = out["a"]
    assert (ra["n_spans"], ra["dup_tok"], ra["max_span"]) == (1, 8, 8)
    assert ra["n_tok"] == 20 and abs(ra["dup_frac"] - 0.4) < 1e-9
    rb = out["b"]
    assert (rb["n_spans"], rb["dup_tok"]) == (1, 8)


def test_interval_union_no_double_count(spark):
    # a 10-token shared run = 3 overlapping 8-grams -> ONE span, 10
    # tokens covered (not 24)
    run = list(range(50, 60))
    a = run + [1, 2, 3]
    b = [7, 8] + run
    out = {
        r["doc_id"]: r
        for r in SP.dup_span_stats(_seqs(spark, [("a", a), ("b", b)]), n=8).collect()
    }
    assert (out["a"]["n_spans"], out["a"]["dup_tok"], out["a"]["max_span"]) == (
        1,
        10,
        10,
    )


def test_disjoint_runs_split_spans(spark):
    # two shared 8-runs separated by > n unshared tokens -> 2 spans
    r1, r2 = list(range(10, 18)), list(range(80, 88))
    filler = [1000 + i for i in range(12)]
    a = r1 + filler + r2
    b = r1 + [2000 + i for i in range(12)] + r2
    out = {
        r["doc_id"]: r
        for r in SP.dup_span_stats(_seqs(spark, [("a", a), ("b", b)]), n=8).collect()
    }
    assert (out["a"]["n_spans"], out["a"]["dup_tok"]) == (2, 16)


def test_short_docs_and_within_doc_repeats_excluded(spark):
    # docs shorter than n yield nothing; a gram repeated WITHIN one doc
    # is not cross-doc duplication (min_docs counts distinct ids)
    rep = list(range(30, 38))
    df = _seqs(
        spark,
        [("tiny", [1, 2, 3]), ("selfrep", rep + [999] * 9 + rep)],
    )
    assert SP.dup_span_stats(df, n=8).count() == 0


def test_duplicate_row_multiplicity_invariant(spark):
    # bit-identical duplicate rows (the fixture's aliased docs) must
    # not change any stat: distinct-id frequency + tie-safe islands
    a = list(range(1, 21))
    b = [0, 0] + a[4:12] + [201]
    base = _seqs(spark, [("a", a), ("b", b)])
    once = sorted(map(tuple, SP.dup_span_stats(base, n=8).collect()))
    twice = sorted(
        map(tuple, SP.dup_span_stats(base.union(base), n=8).collect())
    )
    assert once == twice
    # reliable materialization path (spot-executor durability knob)
    durable = sorted(
        map(tuple, SP.dup_span_stats(base, n=8, reliable=True).collect())
    )
    assert once == durable


def test_no_token_array_in_exchange(spark):
    # repo invariant: gram hashes are computed map-side; the token
    # array column never crosses a shuffle
    df = _seqs(spark, [("a", list(range(20))), ("b", list(range(5, 25)))])
    plan = (
        SP.dup_span_stats(df, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "tokens" not in line, line
