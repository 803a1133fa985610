"""operators/funnel.py: funnel step semantics (window-from-first-step,
ordering, horizon) and session path mining (boundaries, tie-break,
depth clamp) against hand-built fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.funnel import (
    funnel_counts,
    funnel_step_times,
    retention_cohorts,
    top_session_paths,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, 0).fromtimestamp(1704067200 + s), u, t, 0.0, "{}")
         for i, (s, u, t) in enumerate(rows)],
        SCHEMA,
    )


def test_funnel_hand_values(spark):
    """u1 full conversion; u2 clicks BEFORE viewing (must not count past
    step 1); u3 converts outside the horizon; u4 never starts."""
    rows = [
        # u1: view@0, click@10, purchase@20 — full funnel
        (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"),
        # u2: click@0, view@10 — click precedes first view: stops at step 1
        (0, 2, "click"), (10, 2, "view"),
        # u3: view@0, click@5000 — click after horizon (3600): stops at step 1
        (0, 3, "view"), (5000, 3, "click"),
        # u4: purchase only — never enters the funnel
        (0, 4, "purchase"),
    ]
    got = {
        r["step"]: (r["n_users"], r["conv_overall"], r["conv_prev"])
        for r in funnel_counts(
            _ev(spark, rows), ["view", "click", "purchase"], horizon_s=3600
        ).collect()
    }
    assert got[1] == (3, 1.0, 1.0)
    assert got[2] == (1, round(1 / 3, 9), round(1 / 3, 9))
    assert got[3] == (1, round(1 / 3, 9), 1.0)


def test_funnel_step_time_is_earliest_qualifying(spark):
    """Step-2 time = earliest click AT OR AFTER the first view, not the
    global earliest click; step 3 must be at/after step 2."""
    rows = [
        (100, 1, "view"),
        (50, 1, "click"),    # before the first view: ignored
        (150, 1, "click"),   # the qualifying click
        (120, 1, "purchase"),  # before the click: must NOT count for step 3
        (200, 1, "purchase"),
    ]
    r = funnel_step_times(
        _ev(spark, rows), ["view", "click", "purchase"], horizon_s=3600
    ).collect()[0]
    base = 1704067200
    assert (r["t_0"], r["t_1"], r["t_2"]) == (base + 100, base + 150, base + 200)


def test_funnel_horizon_anchored_at_first_step(spark):
    """The horizon is measured from step-1 time for EVERY later step:
    a purchase 3601 s after the first view is out even though it is
    within 3600 s of the click."""
    rows = [(0, 1, "view"), (3500, 1, "click"), (3601, 1, "purchase")]
    r = funnel_step_times(
        _ev(spark, rows), ["view", "click", "purchase"], horizon_s=3600
    ).collect()[0]
    assert r["t_1"] == 1704067200 + 3500
    assert r["t_2"] is None


def test_top_paths_hand_values_and_tiebreak(spark):
    """Two sessions for u1 (gap > 1800 splits), one for u2; the path
    string is the first 3 types in (ts, event_id) order; equal counts
    order by path ASC."""
    rows = [
        (0, 1, "view"), (10, 1, "click"), (20, 1, "purchase"), (30, 1, "error"),
        (10000, 1, "view"), (10010, 1, "click"), (10020, 1, "purchase"),
        (0, 2, "signup"),
    ]
    got = [(r["path"], r["n_sessions"])
           for r in top_session_paths(_ev(spark, rows), gap_s=1800, depth=3, k=10).collect()]
    assert got == [("view>click>purchase", 2), ("signup", 1)]


def test_top_paths_session_boundary_exactly_gap_merges(spark):
    """A gap of exactly gap_s does NOT break the session (strictly-
    greater rule, same as streaming/sessions.py)."""
    rows = [(0, 1, "view"), (1800, 1, "click"), (3601, 1, "signup")]
    got = [(r["path"], r["n_sessions"])
           for r in top_session_paths(_ev(spark, rows), gap_s=1800, depth=3, k=10).collect()]
    # 0→1800 merges (== gap); 1800→3601 breaks (1801 > gap)
    assert got == [("signup", 1), ("view>click", 1)]


def test_top_paths_ts_tie_breaks_by_event_id(spark):
    rows = [(0, 1, "view"), (0, 1, "click")]  # event_ids 0, 1 in row order
    got = top_session_paths(_ev(spark, rows), depth=2, k=1).collect()
    assert got[0]["path"] == "view>click"


# --- retention cohorts -------------------------------------------------------


def test_retention_cohorts_hand_values(spark):
    """u1,u2 cohort day 0 (u1 active days 0,1; u2 day 0 only);
    u3 cohort day 1, active days 1 and 3."""
    day = 86400
    rows = [
        (0, 1, "view"), (day + 5, 1, "click"),           # u1: offsets 0, 1
        (10, 2, "view"), (20, 2, "view"),                # u2: offset 0 (dedup)
        (day, 3, "view"), (3 * day + 1, 3, "purchase"),  # u3: offsets 0, 2
    ]
    out = retention_cohorts(_ev(spark, rows))
    got = {(r["cohort_day"], r["day_offset"]): (r["n_users"], r["retention"]) for r in out.collect()}
    # fixture epoch base 1704067200 = day 19723 exactly (divisible by 86400)
    base = 1704067200 // day
    assert got == {
        (base, 0): (2, 1.0),
        (base, 1): (1, 0.5),
        (base + 1, 0): (1, 1.0),
        (base + 1, 2): (1, 1.0),
    }


def test_retention_cohorts_max_offset_and_broadcast(spark):
    day = 86400
    rows = [(0, 1, "view"), (5 * day, 1, "view")]
    out = retention_cohorts(_ev(spark, rows), max_offset=2)
    assert [r["day_offset"] for r in out.collect()] == [0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_attribution_first_last_and_direct(spark):
    from bitquery_kafka_streams_rust_spark.operators.funnel import attribution

    # user 1: view@0, click@100, purchase@200 (val 10) ->
    #   first=view, last=click
    # user 2: purchase@50 (val 5), no touches -> direct/direct
    # user 3: click@0, purchase@90000 (val 7) -> outside 1-day lookback
    #   when lookback_s=3600 -> direct
    # user 4: two clicks at the SAME second (ids 7,8) then purchase ->
    #   tie broken by event id for both models
    rows = [
        (0, 1, "view"), (100, 1, "click"), (200, 1, "purchase"),
        (50, 2, "purchase"),
        (0, 3, "click"), (90000, 3, "purchase"),
        (300, 4, "click"), (300, 4, "click"), (400, 4, "purchase"),
    ]
    ev = _ev(spark, rows)
    out = attribution(
        ev, lookback_s=3600, touch_types=("click", "view"),
    )
    got = {(r["model"], r["channel"]): (r["n_conv"], r["value_sum"]) for r in out.collect()}
    assert got[("first_touch", "view")][0] == 1       # user 1
    assert got[("last_touch", "click")][0] == 2       # users 1 and 4
    assert got[("first_touch", "direct")][0] == 2     # users 2 and 3
    assert got[("last_touch", "direct")][0] == 2
    # value conservation: each model credits every conversion exactly once
    tot = {m: 0.0 for m in ("first_touch", "last_touch")}
    cnt = {m: 0 for m in ("first_touch", "last_touch")}
    for (m, _ch), (n, v) in got.items():
        tot[m] += v
        cnt[m] += n
    assert cnt["first_touch"] == cnt["last_touch"] == 4
    assert abs(tot["first_touch"] - tot["last_touch"]) < 1e-9
