"""operators/expectations.py: first-failing-rule attribution, the
three actions, NULL-predicate semantics, metrics, conservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.expectations import (
    Expectation,
    ExpectationError,
    apply_expectations,
    check_failures,
)


def _df(spark):
    rows = [
        (1, 10, "a"),
        (2, -1, "a"),     # violates positive
        (3, 5, "zz"),     # violates known_kind
        (4, -2, "zz"),    # violates BOTH -> attributed to FIRST (positive)
        (5, None, "a"),   # NULL predicate -> violation (positive)
    ]
    return spark.createDataFrame(rows, "id int, v int, kind string")


def _exps():
    return [
        Expectation("positive", F.col("v") > 0, action="quarantine"),
        Expectation("known_kind", F.col("kind").isin(["a", "b"]), action="drop"),
    ]


def test_split_and_first_rule_attribution(spark):
    df = _df(spark)
    passed, failed, metrics = apply_expectations(df, _exps())
    assert sorted(r["id"] for r in passed.collect()) == [1]
    got = {r["id"]: r["_violated"] for r in failed.collect()}
    assert got == {2: "positive", 3: "known_kind", 4: "positive", 5: "positive"}
    assert passed.count() + failed.count() == df.count()
    assert passed.columns == df.columns  # original schema on the pass side
    m = {r["rule"]: (r["action"], r["n_violations"]) for r in metrics.collect()}
    assert m == {"positive": ("quarantine", 3), "known_kind": ("drop", 1)}
    # declaration order preserved, zero-violation rules still reported
    _, _, m2 = apply_expectations(passed, _exps())
    assert [(r["rule"], r["n_violations"]) for r in m2.collect()] == [
        ("positive", 0),
        ("known_kind", 0),
    ]


def test_fail_action(spark):
    df = _df(spark)
    exps = [Expectation("positive", F.col("v") > 0, action="fail")]
    _, failed, _ = apply_expectations(df, exps)
    with pytest.raises(ExpectationError, match="positive=3"):
        check_failures(failed, exps)
    ok = df.where("v > 0")
    _, failed_ok, _ = apply_expectations(ok, exps)
    check_failures(failed_ok, exps)  # no raise


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        apply_expectations(df, [])
    with pytest.raises(ValueError):
        apply_expectations(df, [Expectation("x", F.lit(True))] * 2)
    with pytest.raises(ValueError):
        Expectation("x", F.lit(True), action="explode")


def test_classification_is_map_side(spark):
    """The split adds NO shuffle: both sides are filters over one
    codegen'd projection."""
    df = _df(spark)
    passed, failed, _ = apply_expectations(df, _exps())
    for side in (passed, failed):
        plan = side._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
