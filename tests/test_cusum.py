"""Two-sided CUSUM changepoint detection (operators/drift.py
cusum_changepoint): closed-form prefix-extremum vs the textbook
recursion, degenerate inputs, single-sort plan."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators import drift as DR


def _py_cusum(vals, k=0.25, h=2.0, scale=1000):
    """Textbook recursion s_i = max(0, s_{i-1} + x_i) on the SAME
    n-cleared integer grid the operator uses."""
    q = [round(v * scale) for v in vals]
    n, s = len(q), sum(q)
    kq, hq = round(k * scale), round(h * scale)
    sh = sl = 0
    n_hi = n_lo = 0
    first_hi = first_lo = -1
    max_hi = max_lo = 0
    for i, qi in enumerate(q):
        e = n * qi - s
        sh = max(0, sh + e - kq * n)
        sl = max(0, sl - e - kq * n)
        max_hi, max_lo = max(max_hi, sh), max(max_lo, sl)
        if sh > hq * n:
            n_hi += 1
            if first_hi < 0:
                first_hi = i
        if sl > hq * n:
            n_lo += 1
            if first_lo < 0:
                first_lo = i
    d = float(n * scale)
    return (n, n_hi, n_lo, first_hi, first_lo,
            round(max_hi / d, 6), round(max_lo / d, 6))


def _run(spark, series: dict[str, list[float]], **kw):
    rows = [
        (g, i, i, v) for g, vals in series.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, tb long, v double")
    out = DR.cusum_changepoint(df, ["grp"], "x", "v", "tb", **kw)
    return {r["grp"]: tuple(r)[1:] for r in out.collect()}


def test_matches_textbook_recursion(spark):
    # a level shift upward halfway, one downward, one stationary
    series = {
        "up": [1.0] * 20 + [3.0] * 20,
        "down": [5.0] * 25 + [2.0] * 15,
        "flat": [2.0, 2.1, 1.9, 2.0] * 10,
    }
    got = _run(spark, series)
    for g, vals in series.items():
        assert got[g] == _py_cusum(vals), g
    # deviations are vs the key's GLOBAL mean, so a step change alarms
    # both sides (pre-shift samples sit below it, post-shift above) —
    # but the hi-side alarms start only after the upward shift
    assert got["up"][1] > 0 and got["up"][3] >= 20
    assert got["down"][2] > 0 and got["down"][4] >= 25
    assert got["flat"][1] == 0 and got["flat"][2] == 0


def test_first_alarm_sentinel_and_order(spark):
    # a one-sided excursion: oscillating bulk (low side accumulates
    # ~0.4/pair, max ~7.2 < h), spikes push the high side past h
    series = {"spiky": [1.0, 3.0] * 18 + [9.0] * 4}
    got = _run(spark, series, k=0.5, h=10.0)
    ref = _py_cusum(series["spiky"], k=0.5, h=10.0)
    assert got["spiky"] == ref
    assert got["spiky"][3] >= 36  # first hi alarm inside the spike run
    assert got["spiky"][4] == -1  # no low-side alarm → sentinel


def test_degenerate_single_row_and_constant(spark):
    got = _run(spark, {"one": [7.0], "const": [3.0] * 8})
    # e_i == 0 everywhere → no alarms, zero statistics
    for g in ("one", "const"):
        assert got[g][1:] == (0, 0, -1, -1, 0.0, 0.0)


def test_plan_single_sort_one_exchange(spark):
    df = spark.createDataFrame(
        [("g", i, i, float(i % 5)) for i in range(40)],
        "grp string, x long, tb long, v double",
    )
    out = DR.cusum_changepoint(df, ["grp"], "x", "v", "tb")
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    # window partitioning is reused by the final groupBy: one exchange,
    # one sort for both running-window passes
    assert plan.count("Exchange") == 1
    assert plan.count("Sort") <= 2
