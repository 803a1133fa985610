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


def _trim_ref(docs, n=8, min_docs=2, mod=2**31 - 1):
    """Pure-Python reference: gram -> distinct docs, covered positions,
    trim, positional checksum."""
    from collections import defaultdict

    P = 2147483647
    gram_docs = defaultdict(set)
    grams = {}
    for d, t in docs.items():
        gs = []
        for i in range(len(t) - n + 1):
            h = 0
            for x in t[i : i + n]:
                h = (h * 313 + x) % P
            gs.append(h)
            gram_docs[h].add(d)
        grams[d] = gs
    out = {}
    for d, t in docs.items():
        cov = set()
        for i, h in enumerate(grams[d]):
            if len(gram_docs[h]) >= min_docs:
                cov.update(range(i, i + n))
        kept = [x for i, x in enumerate(t) if i not in cov]
        ck = sum(x * (i + 1) for i, x in enumerate(kept)) % mod
        out[d] = (len(t), len(kept), len(t) - len(kept), ck)
    return out


def test_trim_matches_python_reference(spark):
    run = list(range(50, 60))
    docs = {
        "a": run + [1, 2, 3, 4, 5],
        "b": [7, 8] + run + [9, 9, 9],
        "c": [200 + i for i in range(15)],  # untouched
        "d": list(range(50, 58)),  # fully covered (one shared 8-gram)
        "tiny": [1, 2],  # shorter than n: untouched by construction
    }
    got = {
        r["doc_id"]: (r["n_tok"], r["kept_n_tok"], r["removed_tok"], r["kept_checksum"])
        for r in SP.dup_span_trim(_seqs(spark, list(docs.items())), n=8).collect()
    }
    assert got == _trim_ref(docs)


def test_trim_row_per_doc_and_identities(spark):
    a = list(range(1, 21))
    b = [101, 102] + a[4:12] + [201, 202, 203]
    rows = SP.dup_span_trim(_seqs(spark, [("a", a), ("b", b), ("u", [9] * 3)]), n=8).collect()
    assert [r["doc_id"] for r in rows] == ["a", "b", "u"]  # ordered, all docs
    for r in rows:
        assert r["kept_n_tok"] + r["removed_tok"] == r["n_tok"]
    assert {r["doc_id"]: r["removed_tok"] for r in rows} == {"a": 8, "b": 8, "u": 0}


def test_trim_multiplicity_and_reliable(spark):
    a = list(range(1, 21))
    b = [0, 0] + a[4:12] + [201]
    base = _seqs(spark, [("a", a), ("b", b)])
    once = sorted(map(tuple, SP.dup_span_trim(base, n=8).collect()))
    twice = sorted(map(tuple, SP.dup_span_trim(base.union(base), n=8).collect()))
    durable = sorted(map(tuple, SP.dup_span_trim(base, n=8, reliable=True).collect()))
    assert once == twice == durable


def test_trim_no_token_array_in_exchange(spark):
    df = _seqs(spark, [("a", list(range(20))), ("b", list(range(5, 25)))])
    plan = (
        SP.dup_span_trim(df, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "tokens" not in line, line


def test_span_family_randomized_vs_python_reference(spark):
    """30 seeded random corpora (tiny alphabet -> dense collisions,
    overlaps, touching islands) evaluated in ONE Spark pass each for
    stats and trim, compared against independent pure-Python
    references."""
    import random

    def stats_ref(docs, n=4, min_docs=2):
        from collections import defaultdict

        P = 2147483647
        gd, grams = defaultdict(set), {}
        for d, t in docs.items():
            gs = []
            for i in range(len(t) - n + 1):
                h = 0
                for x in t[i : i + n]:
                    h = (h * 313 + x) % P
                gs.append(h)
                gd[h].add(d)
            grams[d] = gs
        out = {}
        for d, t in docs.items():
            pos = [i for i, h in enumerate(grams[d]) if len(gd[h]) >= min_docs]
            if not pos:
                continue
            spans, s, e = [], pos[0], pos[0]
            for p in pos[1:]:
                if p - e > n:
                    spans.append((s, e))
                    s = p
                e = p
            spans.append((s, e))
            cov = sum(e - s + n for s, e in spans)
            out[d] = (
                len(spans),
                cov,
                max(e - s + n for s, e in spans),
                len(t),
                round(cov / len(t), 6),
            )
        return out

    def trim_ref(docs, n=4):
        from collections import defaultdict

        P = 2147483647
        gd, grams = defaultdict(set), {}
        for d, t in docs.items():
            gs = []
            for i in range(len(t) - n + 1):
                h = 0
                for x in t[i : i + n]:
                    h = (h * 313 + x) % P
                gs.append(h)
                gd[h].add(d)
            grams[d] = gs
        out = {}
        for d, t in docs.items():
            cov = set()
            for i, h in enumerate(grams[d]):
                if len(gd[h]) >= 2:
                    cov.update(range(i, i + n))
            kept = [x for i, x in enumerate(t) if i not in cov]
            ck = sum(x * (i + 1) for i, x in enumerate(kept)) % (2**31 - 1)
            out[d] = (len(t), len(kept), len(t) - len(kept), ck)
        return out

    rng = random.Random(42)
    all_rows, exp_s, exp_t = [], {}, {}
    for corpus in range(30):
        n_docs = rng.randint(2, 6)
        docs = {}
        for d in range(n_docs):
            length = rng.randint(0, 25)
            docs[f"c{corpus}_d{d}"] = [rng.randint(0, 3) for _ in range(length)]
        # seed cross-doc duplication in half the corpora
        if corpus % 2 == 0 and n_docs >= 2:
            shared = [rng.randint(0, 3) for _ in range(rng.randint(4, 10))]
            ids = list(docs)
            for d in rng.sample(ids, 2):
                at = rng.randint(0, len(docs[d]))
                docs[d] = docs[d][:at] + shared + docs[d][at:]
        # grams are corpus-agnostic in the one shared Spark pass, so
        # give each corpus a disjoint token range (tokens 0-3 -> +10c)
        # to keep the per-corpus references independent
        docs = {d: [t + corpus * 10 for t in toks] for d, toks in docs.items()}
        all_rows += list(docs.items())
        for d, v in stats_ref(docs).items():
            exp_s[d] = v
        for d, v in trim_ref(docs).items():
            exp_t[d] = v
    df = _seqs(spark, all_rows)
    got_stats = {
        r["doc_id"]: (r["n_spans"], r["dup_tok"], r["max_span"], r["n_tok"], r["dup_frac"])
        for r in SP.dup_span_stats(df, n=4).collect()
    }
    assert got_stats == exp_s
    got_trim = {
        r["doc_id"]: (r["n_tok"], r["kept_n_tok"], r["removed_tok"], r["kept_checksum"])
        for r in SP.dup_span_trim(df, n=4).collect()
    }
    assert got_trim == exp_t


def test_trim_rank_window_gated_by_span_semi_join(spark):
    """Round-5 scale fix pin: the explode → rank-window path must be
    gated by a semi join against the span-bearing ids (its exchange
    carries only dup-affected docs' tokens), and the untouched branch
    must be window-free map-side work behind an anti join."""
    df = _seqs(
        spark,
        [
            ("a", list(range(20))),
            ("b", list(range(5, 25))),
            ("u", [900 + i for i in range(30)]),  # untouched
        ],
    )
    plan = (
        SP.dup_span_trim(df, n=8)._jdf.queryExecution().executedPlan().toString()
    )
    lines = plan.splitlines()
    win = [i for i, l in enumerate(lines) if "Window" in l]
    semi = [i for i, l in enumerate(lines) if "LeftSemi" in l]
    anti = [i for i, l in enumerate(lines) if "LeftAnti" in l]
    assert len(win) == 1, plan          # one rank window, span branch only
    # the semi join appears under both consumers of `affected` (lens
    # and the window's tok explode); the one INSIDE the window subtree
    # prints below the Window line — that's the gate being pinned
    assert semi and max(semi) > win[0], plan
    assert anti, plan                   # untouched docs split off map-side
