"""Distribution audits (operators/aggregates.py): HHI/entropy
concentration and the Benford first-digit test."""

from __future__ import annotations

import math

from bitquery_kafka_streams_rust_spark.operators import aggregates as AG


def test_concentration_hand_values(spark):
    # group g: items a×4, b×4, c×2 -> N=10, HHI=(16+16+4)/100=0.36
    rows = [("g", x) for x in "aaaabbbbcc"] + [("m", "z")]
    df = spark.createDataFrame(rows, "grp string, item string")
    got = {r["grp"]: r for r in AG.concentration(df, "item", ["grp"]).collect()}
    g = got["g"]
    assert (g["n_items"], g["n_rows"], g["hhi"]) == (3, 10, 0.36)
    h = -(0.4 * math.log(0.4) * 2 + 0.2 * math.log(0.2))
    assert abs(g["entropy"] - h) < 1e-5
    assert abs(g["entropy_norm"] - h / math.log(3)) < 1e-5
    # single-item group: zero entropy, HHI 1, norm undefined
    m = got["m"]
    assert (m["hhi"], m["entropy"], m["entropy_norm"]) == (1.0, 0.0, None)


def test_concentration_uniform_vs_skewed(spark):
    uni = [("u", str(i)) for i in range(100)]
    skew = [("s", "hot")] * 91 + [("s", str(i)) for i in range(9)]
    df = spark.createDataFrame(uni + skew, "grp string, item string")
    got = {r["grp"]: r for r in AG.concentration(df, "item", ["grp"]).collect()}
    assert got["u"]["hhi"] < 0.02 < 0.8 < got["s"]["hhi"]
    assert got["s"]["entropy_norm"] < 0.3 < 0.99 < got["u"]["entropy_norm"]


def test_benford_synthetic_benford_sample(spark):
    # values 10^(k/97) have log-uniform mantissas -> near-Benford digits
    rows = [("g", 10 ** (k / 97.0)) for k in range(97 * 3)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = AG.benford_digits(df, "value", ["grp"]).collect()
    assert sorted(r["digit"] for r in out) == list(range(1, 10))
    for r in out:
        assert r["abs_dev"] < 0.02
    assert abs(sum(r["obs_share"] for r in out) - 1.0) < 1e-5


def test_benford_flags_uniform_values(spark):
    # uniform [1, 2) values all start with digit 1 -> huge deviation
    rows = [("g", 1.0 + k / 500.0) for k in range(500)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = AG.benford_digits(df, "value", ["grp"]).collect()
    assert len(out) == 1 and out[0]["digit"] == 1
    assert out[0]["obs_share"] == 1.0 and out[0]["abs_dev"] > 0.69


def test_benford_drops_zeros_and_uses_abs(spark):
    df = spark.createDataFrame(
        [("g", 0.0), ("g", -300.0), ("g", 0.25)], "grp string, value double"
    )
    out = {r["digit"]: r["n_d"] for r in
           AG.benford_digits(df, "value", ["grp"]).collect()}
    assert out == {3: 1, 2: 1}  # -300 -> 3, 0.25 -> 2 (via 250000), 0 dropped
