"""Group-wise OLS via exact integer moments (operators/regress.py)."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators import regress as RG


def test_ols_exact_line(spark):
    # y = 2x + 1 exactly: slope 2, intercept 1, r2 1 in every group
    rows = [("g", x, 2.0 * x + 1.0) for x in range(10)] + [
        ("h", x, -0.5 * x + 3.0) for x in range(5)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    got = {r["grp"]: r for r in RG.group_ols(df, "x", "y", ["grp"]).collect()}
    assert (got["g"]["slope"], got["g"]["intercept"], got["g"]["r2"]) == (2.0, 1.0, 1.0)
    assert (got["h"]["slope"], got["h"]["intercept"], got["h"]["r2"]) == (-0.5, 3.0, 1.0)
    assert got["g"]["n"] == 10 and got["h"]["n"] == 5


def test_ols_matches_closed_form_with_noise(spark):
    # deterministic pseudo-noise; compare against the same grid
    # arithmetic in pure Python (value quantization included)
    pts = [(x, 3.0 * x - 7.0 + ((x * 37) % 11 - 5) / 3.0) for x in range(50)]
    df = spark.createDataFrame([("g", x, y) for x, y in pts], "grp string, x long, y double")
    r = RG.group_ols(df, "x", "y", ["grp"]).collect()[0]
    qy = [round(y * 1000) for _, y in pts]
    xs = [x for x, _ in pts]
    n = float(len(pts))
    sx, sy = float(sum(xs)), float(sum(qy))
    sxx, syy = float(sum(x * x for x in xs)), float(sum(q * q for q in qy))
    sxy = float(sum(x * q for x, q in zip(xs, qy)))
    cov_n, var_x_n, var_y_n = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    assert r["slope"] == round(cov_n / var_x_n * 1.0 / 1000.0, 12)
    assert r["intercept"] == round((sy - cov_n / var_x_n * sx) / n / 1000.0, 6)
    assert r["r2"] == round(cov_n * cov_n / (var_x_n * var_y_n), 6)


def test_ols_degenerate_groups_null(spark):
    rows = [("one", 5, 1.0),  # n = 1
            ("flat", 3, 1.0), ("flat", 3, 2.0),  # zero x-variance
            ("consty", 1, 4.0), ("consty", 2, 4.0)]  # zero y-variance
    df = spark.createDataFrame(rows, "grp string, x long, y double")
    got = {r["grp"]: r for r in RG.group_ols(df, "x", "y", ["grp"]).collect()}
    assert got["one"]["slope"] is None and got["one"]["r2"] is None
    assert got["flat"]["slope"] is None and got["flat"]["intercept"] is None
    # zero y-variance: the fit line is flat (slope 0) but r2 is 0/0
    assert got["consty"]["slope"] == 0.0 and got["consty"]["r2"] is None


def test_ols_single_exchange_partial_agg(spark):
    df = spark.createDataFrame(
        [("g", x, float(x)) for x in range(20)], "grp string, x long, y double"
    )
    out = RG.group_ols(df, "x", "y", ["grp"])
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert plan.count("Exchange") == 1
    assert "partial_" in plan
