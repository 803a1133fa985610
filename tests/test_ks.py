"""Two-sample KS test (operators/regress.py ks_two_sample)."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators.regress import ks_two_sample


def _df(spark, a_vals, b_vals, g="g"):
    rows = [(g, float(v), True) for v in a_vals] + [
        (g, float(v), False) for v in b_vals
    ]
    return spark.createDataFrame(rows, "grp string, v double, is_a boolean")


def _py_ks(a, b):
    vals = sorted(set(a) | set(b))
    na, nb, best = len(a), len(b), 0
    for v in vals:
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        best = max(best, abs(ca * nb - cb * na))
    return best / (na * nb)


def test_ks_matches_python_reference(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0, 5.0, 6.0]
    b = [2.5, 3.5, 4.5, 9.0]
    r = ks_two_sample(_df(spark, a, b), "v", "is_a", ["grp"]).collect()[0]
    assert (r["n_a"], r["n_b"]) == (7, 4)
    assert abs(r["ks_d"] - _py_ks(a, b)) <= 5e-7
    lam = _py_ks(a, b) * (7 * 4 / 11) ** 0.5
    assert abs(r["ks_lambda"] - lam) <= 5e-6


def test_ks_identical_distributions_zero(spark):
    a = [1.0, 2.0, 3.0]
    r = ks_two_sample(_df(spark, a, a), "v", "is_a", ["grp"]).collect()[0]
    assert r["ks_d"] == 0.0


def test_ks_disjoint_supports_is_one(spark):
    r = ks_two_sample(
        _df(spark, [1.0, 2.0], [10.0, 11.0]), "v", "is_a", ["grp"]
    ).collect()[0]
    assert r["ks_d"] == 1.0


def test_ks_one_empty_side_null(spark):
    df = spark.createDataFrame(
        [("g", 1.0, True), ("g", 2.0, True)], "grp string, v double, is_a boolean"
    )
    r = ks_two_sample(df, "v", "is_a", ["grp"]).collect()[0]
    assert r["n_b"] == 0 and r["ks_d"] is None and r["ks_lambda"] is None


def test_ks_detects_variance_shift_mean_test_misses(spark):
    # same mean 0, very different spread: z-test ~0, KS large
    a = [-0.1, 0.1] * 50
    b = [-10.0, 10.0] * 50
    r = ks_two_sample(_df(spark, a, b), "v", "is_a", ["grp"]).collect()[0]
    assert r["ks_d"] == 0.5  # CDFs differ by 1/2 everywhere between
