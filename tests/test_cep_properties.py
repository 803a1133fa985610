"""Property-based CEP kernel tests (hypothesis, no Spark session).

The streaming twins' pandas kernels (`_match`, `_nfb_match`,
`_chain_match`) must emit EXACTLY what the batch window forms define,
for ANY in-order event sequence and ANY micro-batch segmentation —
including pairs/chains straddling batch boundaries and state carried
across many batches.  Hypothesis drives pure-Python references derived
directly from the match rules (most-recent strictly-preceding A; first
following B; inductive most-recent valid prefix) against the kernels
fed with random contiguous batch splits and a watermark that advances
like Spark's (max event time seen through the PREVIOUS batch, minus
delay)."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
import pandas as pd  # noqa: E402
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from bitquery_kafka_streams_rust_spark.operators.cep import (  # noqa: E402
    _chain_match,
    _match,
    _nfb_match,
)

BASE_US = 1_700_000_000_000_000  # epoch anchor (us)


class FakeState:
    """Minimal GroupState stand-in for driving the kernels directly."""

    def __init__(self):
        self.exists = False
        self._v = None
        self.hasTimedOut = False
        self.wm_ms = 0
        self.timeout_ms = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True

    def remove(self):
        self._v = None
        self.exists = False
        self.timeout_ms = None

    def getCurrentWatermarkMs(self):
        return self.wm_ms

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


# events: (id, ts_seconds, type); ids unique, sequence sorted by (ts, id)
def _events_strategy(types):
    ev = st.tuples(
        st.integers(min_value=0, max_value=10_000),  # ts seconds
        st.sampled_from(types),
    )
    return st.lists(ev, min_size=0, max_size=40).map(
        lambda raw: [
            (i, ts, t) for i, (ts, t) in enumerate(sorted(raw, key=lambda x: x[0]))
        ]
    )


splits_st = st.lists(st.integers(min_value=0, max_value=40), max_size=4)


def _batches(events, split_points):
    """Contiguous batches from sorted events (the in-order arrival
    contract); empty batches allowed."""
    cuts = sorted({min(s, len(events)) for s in split_points})
    out, prev = [], 0
    for c in cuts + [len(events)]:
        out.append(events[prev:c])
        prev = c
    return out


def _pdf(batch):
    return pd.DataFrame(
        {
            "ts": pd.to_datetime(
                pd.Series([BASE_US + ts * 1_000_000 for _, ts, _ in batch]), unit="us"
            ),
            "event_type": [t for _, _, t in batch],
            "event_id": [i for i, _, _ in batch],
        }
    )


@given(_events_strategy(["a", "b", "x"]), splits_st)
@settings(max_examples=300, deadline=None)
def test_followed_by_kernel_property(events, split_points):
    gap = 50
    # reference: for each b, the most recent strictly-preceding a
    want = []
    last_a = None
    for i, ts, t in events:
        if t == "b" and last_a is not None and ts - last_a <= gap:
            want.append((i, last_a, ts - last_a))
        if t == "a":
            last_a = ts
    state = FakeState()
    got = []
    for batch in _batches(events, split_points):
        (out,) = list(_match((1,), iter([_pdf(batch)]), state, "a", "b", gap))
        for _, r in out.iterrows():
            a_s = int(r["a_ts"].timestamp()) - BASE_US // 1_000_000
            got.append((int(r["b_id"]), a_s, int(r["gap_actual_s"])))
    assert got == want


@given(_events_strategy(["a", "b", "x"]), splits_st, st.booleans())
@settings(max_examples=300, deadline=None)
def test_not_followed_by_kernel_property(events, split_points, odd_wm):
    gap, delay = 50, 30
    # reference: for each a, the first strictly-following b; alert when
    # none exists within gap
    want = []
    for i, ts, t in events:
        if t != "a":
            continue
        nxt = next((ts2 for j, ts2, t2 in events if t2 == "b" and (ts2, j) > (ts, i)), None)
        if nxt is None or nxt - ts > gap:
            want.append((i, ts))
    state = FakeState()
    got = []
    wm_us = 0
    for batch in _batches(events, split_points):
        state.wm_ms = wm_us // 1000
        state.hasTimedOut = False
        (out,) = list(_nfb_match((1,), iter([_pdf(batch)]), state, "a", "b", gap))
        for _, r in out.iterrows():
            got.append((int(r["a_id"]), int(r["a_ts"].timestamp()) - BASE_US // 1_000_000))
        if batch:
            # Spark: watermark reflects data through this batch only at
            # the NEXT batch; optionally advance lazily to fuzz timing
            if not odd_wm:
                wm_us = max(wm_us, BASE_US + (max(ts for _, ts, _ in batch) - delay) * 1_000_000)
    # final flush: watermark beyond every deadline, timeout invocation
    if state.exists:
        state.wm_ms = (BASE_US + 100_000 * 1_000_000) // 1000
        state.hasTimedOut = True
        (out,) = list(_nfb_match((1,), iter([]), state, "a", "b", gap))
        for _, r in out.iterrows():
            got.append((int(r["a_id"]), int(r["a_ts"].timestamp()) - BASE_US // 1_000_000))
    assert sorted(got) == sorted(want)


@given(_events_strategy(["a", "b", "c", "x"]), splits_st)
@settings(max_examples=300, deadline=None)
def test_chain_kernel_property(events, split_points):
    gaps = [40, 60]
    # reference: inductive most-recent valid prefix, strictly preceding
    want = []
    pref_a = None          # ts of last a
    pref_ab = None         # (a_ts, b_ts) of last valid a->b
    for i, ts, t in events:
        new_a, new_ab = pref_a, pref_ab
        if t == "a":
            new_a = ts
        if t == "b" and pref_a is not None and ts - pref_a <= gaps[0]:
            new_ab = (pref_a, ts)
        if t == "c" and pref_ab is not None and ts - pref_ab[1] <= gaps[1]:
            want.append((i, pref_ab[0], pref_ab[1], ts))
        pref_a, pref_ab = new_a, new_ab
    state = FakeState()
    got = []
    for batch in _batches(events, split_points):
        (out,) = list(
            _chain_match((1,), iter([_pdf(batch)]), state, ["a", "b", "c"], gaps)
        )
        for _, r in out.iterrows():
            sec = lambda col: int(r[col].timestamp()) - BASE_US // 1_000_000  # noqa: E731
            got.append((int(r["last_id"]), sec("step0_ts"), sec("step1_ts"), sec("last_ts")))
    assert got == want


@given(_events_strategy(["a", "b", "c", "x"]), splits_st)
@settings(max_examples=200, deadline=None)
def test_chain_kernel_expire_property(events, split_points):
    """expire=True with a Spark-like advancing watermark must not change
    chain completions on in-order input (pruned prefixes are exactly
    those no in-watermark event could extend)."""
    gaps = [40, 60]
    state_plain, state_exp = FakeState(), FakeState()
    plain, exp = [], []
    wm_us = 0
    for batch in _batches(events, split_points):
        (o1,) = list(
            _chain_match((1,), iter([_pdf(batch)]), state_plain, ["a", "b", "c"], gaps)
        )
        state_exp.wm_ms = wm_us // 1000
        state_exp.hasTimedOut = False
        (o2,) = list(
            _chain_match(
                (1,), iter([_pdf(batch)]), state_exp, ["a", "b", "c"], gaps, expire=True
            )
        )
        plain += [tuple(r) for _, r in o1.iterrows()]
        exp += [tuple(r) for _, r in o2.iterrows()]
        if batch:
            wm_us = max(wm_us, BASE_US + (max(ts for _, ts, _ in batch) - 30) * 1_000_000)
    assert plain == exp
