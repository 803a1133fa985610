"""Token-distribution drift (operators/drift.py): hand-model parity
and vocab-bounded plan shape."""

import math

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import drift as DR


def _seqs(spark, rows):
    return spark.createDataFrame(
        [(d, t, len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int",
    )


def test_token_drift_matches_hand_model(spark):
    old = _seqs(spark, [("a", [1, 1, 2])])
    new = _seqs(spark, [("b", [1, 2, 2, 3])])
    out = {r["token"]: r for r in DR.token_drift(old, new, alpha=0.5, vocab=10).collect()}
    assert set(out) == {1, 2, 3}
    no, nn, a, v = 3, 4, 0.5, 10

    def lr(co, cn):
        return math.log(((cn + a) / (nn + a * v)) / ((co + a) / (no + a * v)))

    assert out[1]["n_old"] == 2 and out[1]["n_new"] == 1
    assert abs(out[1]["log_ratio"] - round(lr(2, 1), 6)) < 1e-9
    assert abs(out[2]["log_ratio"] - round(lr(1, 2), 6)) < 1e-9
    # token 3 only in new: smoothing keeps it finite and positive
    assert out[3]["n_old"] == 0 and out[3]["log_ratio"] > 0


def test_drift_summary_matches_hand_model(spark):
    old = _seqs(spark, [("a", [1, 1, 2])])
    new = _seqs(spark, [("b", [1, 2, 2, 3])])
    row = DR.drift_summary(old, new, alpha=0.5, vocab=10).collect()[0]
    no, nn, a, v = 3, 4, 0.5, 10
    po = {1: 2.5 / 8, 2: 1.5 / 8, 3: 0.5 / 8}
    pn = {1: 1.5 / 9, 2: 2.5 / 9, 3: 1.5 / 9}
    kl = sum(pn[t] * math.log(pn[t] / po[t]) for t in (1, 2, 3))
    tvd = sum(abs(pn[t] - po[t]) for t in (1, 2, 3)) / 2
    assert abs(row["kl"] - round(kl, 8)) < 1e-9
    assert abs(row["tvd"] - round(tvd, 8)) < 1e-9
    assert row["vocab_old"] == 2 and row["vocab_new"] == 3


def test_token_drift_identical_corpora_is_flat(spark):
    df = _seqs(spark, [("a", [5, 6, 7]), ("b", [5, 5])])
    out = DR.token_drift(df, df, alpha=0.5, vocab=10)
    assert all(r["log_ratio"] == 0.0 for r in out.collect())
    row = DR.drift_summary(df, df, alpha=0.5, vocab=10).collect()[0]
    assert row["kl"] == 0.0 and row["tvd"] == 0.0


def test_token_drift_no_array_in_exchange(spark):
    df = _seqs(spark, [("a", list(range(50))), ("b", list(range(30)))])
    out = DR.token_drift(df, df, alpha=0.5, vocab=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "tokens" not in line


def test_centroid_drift_identity_and_known_shift(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import centroid_drift

    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 2.0]), (1, [0.0, 1.0])],
        "label int, embedding array<float>",
    )
    # identical snapshots: no drift
    same = {r["label"]: r for r in centroid_drift(a, a).collect()}
    assert all(r["centroid_cos"] == 1.0 and r["l2_shift"] == 0.0 for r in same.values())
    assert (same[0]["n_old"], same[0]["n_new"]) == (2, 2)
    # label-0 mean moves from (1.0, 1.0) to (0.0, 1.0): cos = 1/sqrt(2), l2 = 1
    b = spark.createDataFrame(
        [(0, [0.0, 1.0]), (0, [0.0, 1.0]), (1, [0.0, 1.0])],
        "label int, embedding array<float>",
    )
    moved = {r["label"]: r for r in centroid_drift(a, b).collect()}
    assert abs(moved[0]["centroid_cos"] - round(1 / 2**0.5, 6)) < 1e-9
    assert abs(moved[0]["l2_shift"] - 1.0) < 1e-9
    assert moved[1]["centroid_cos"] == 1.0 and moved[1]["l2_shift"] == 0.0


def test_centroid_drift_partition_invariant(spark):
    """Integer quantization makes the metric independent of
    partitioning / summation order."""
    from bitquery_kafka_streams_rust_spark.operators.drift import centroid_drift

    import random

    rng = random.Random(7)
    rows = [(i % 3, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    r1 = sorted(map(tuple, centroid_drift(df, df.limit(50)).collect()))
    r2 = sorted(
        map(tuple, centroid_drift(df.repartition(13), df.limit(50).repartition(3)).collect())
    )
    assert r1 == r2


def test_novelty_curve_hand_case_and_reference(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import novelty_curve

    # batch = doc suffix % 2; grams n=4 over a tiny alphabet
    docs = {
        "doc0": [1, 2, 3, 4, 5],          # batch 0: grams {1234, 2345}
        "doc2": [1, 2, 3, 4],             # batch 0: gram {1234} (dup in-batch)
        "doc1": [2, 3, 4, 5, 6],          # batch 1: {2345 old, 3456 new}
        "doc3": [9, 9, 9, 9],             # batch 1: {9999 new}
    }
    P = 2147483647

    def gh(t):
        h = 0
        for x in t:
            h = (h * 313 + x) % P
        return h

    seen = {}
    expect = {}
    for b in (0, 1):
        grams = []
        for d, t in docs.items():
            if int(d[3:]) % 2 != b:
                continue
            grams += [gh(t[i : i + 4]) for i in range(len(t) - 3)]
        new = {g for g in set(grams) if g not in seen}
        expect[b] = (len(grams), len(set(grams)), len(new),
                     round(len(new) / len(set(grams)), 6))
        for g in set(grams):
            seen.setdefault(g, b)
    df = spark.createDataFrame(list(docs.items()), "doc_id string, tokens array<int>")
    import pyspark.sql.functions as FX

    batch = FX.substring("doc_id", 4, 4).cast("long") % 2
    got = {
        r["batch"]: (r["n_pos"], r["n_distinct"], r["n_new"], r["novelty_frac"])
        for r in novelty_curve(df, batch, n=4).collect()
    }
    assert got == expect
    # duplicate-aliased rows are collapsed before counting positions
    got2 = {
        r["batch"]: (r["n_pos"], r["n_distinct"], r["n_new"], r["novelty_frac"])
        for r in novelty_curve(df.union(df), batch, n=4).collect()
    }
    assert got2 == expect


def test_psi_identical_periods_near_zero(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import psi_bins

    rows = [("g", float(v % 100), v % 2 == 0) for v in range(2000)]
    df = spark.createDataFrame(rows, "grp string, value double, is_base boolean")
    out = psi_bins(df, "value", F.col("is_base"), ["grp"]).collect()
    psi = sum(r["psi_term"] for r in out)
    assert abs(psi) < 0.01  # same distribution both sides
    assert sum(r["n_base"] for r in out) == 1000


def test_psi_flags_location_shift(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import psi_bins

    base = [("g", float(v % 100), True) for v in range(1000)]
    cur = [("g", float(v % 100) + 60.0, False) for v in range(1000)]
    df = spark.createDataFrame(base + cur, "grp string, value double, is_base boolean")
    out = psi_bins(df, "value", F.col("is_base"), ["grp"]).collect()
    psi = sum(r["psi_term"] for r in out)
    assert psi > 0.25  # "drifted" by the PSI rule of thumb
    # shares are proper distributions (clamped bins can nudge over 1)
    assert abs(sum(r["base_share"] for r in out) - 1.0) < 0.01


def test_chi2_homogeneous_groups_small(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import chi2_homogeneity

    # two groups drawn from the identical value cycle -> chi2 ~ 0
    rows = [("a", (v * 37) % 500) for v in range(1000)]
    rows += [("b", (v * 37) % 500) for v in range(1000)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in
           chi2_homogeneity(df, "n_chars", ["source"], bin_width=50).collect()}
    assert out["a"]["chi2"] < 1.0 and out["b"]["chi2"] < 1.0
    assert out["a"]["n"] == 1000


def test_chi2_flags_divergent_group(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import chi2_homogeneity

    rows = [("short", v % 100) for v in range(500)]
    rows += [("long", 400 + v % 100) for v in range(500)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = chi2_homogeneity(df, "n_chars", ["source"], bin_width=50).collect()
    # disjoint supports: each cell is all-one-group -> chi2 = N per group
    for r in out:
        assert r["chi2"] > 100


def test_chi2_matches_scipy_formula_by_hand(spark):
    from bitquery_kafka_streams_rust_spark.operators.drift import chi2_homogeneity

    # 2x2 table: a has 30 in bin0 / 10 in bin1; b has 10 / 30
    rows = ([("a", 10)] * 30 + [("a", 60)] * 10
            + [("b", 10)] * 10 + [("b", 60)] * 30)
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r["chi2"] for r in
           chi2_homogeneity(df, "n_chars", ["source"], bin_width=50).collect()}
    # per-group halves of the classic chi2 = Σ (O-E)^2/E over the table:
    # E = 20 everywhere, per-group sum = (10^2/20)*2 = 10
    assert abs(out["a"] - 10.0) < 1e-6 and abs(out["b"] - 10.0) < 1e-6
