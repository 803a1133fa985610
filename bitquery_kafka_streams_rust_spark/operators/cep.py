"""CEP pattern detection — "A followed by B within gap" per key.

The engine's CEP surface (north rule): the reference's closest analog
is threshold alerting (``src/processors/dex_processor.rs:156-164``),
which is stateless; a real pattern needs per-key memory of the last
A-event.  Two implementations with identical semantics:

- ``followed_by`` (batch / oracle form): one window over (key, ts) —
  the last A-event timestamp is carried forward to each row by a
  ``max(case …)`` over the strictly-preceding rows, then B rows within
  ``gap_s`` of their carried A are emitted.  Hash-partitioned window
  (never single-partition); one shuffle on the key, codegen'd carry —
  the same scale shape as operators/asof.py.
- ``followed_by_stream`` (streaming twin): ``applyInPandasWithState``
  keeping ONE float per key (last A-event epoch) — O(keys) state, no
  event buffering.  Within a micro-batch events are sorted by
  (ts, id); across micro-batches arrival must be time-ordered per key
  (the engine's sources deliver ordered batches; bounded disorder
  inside one batch is fine because the whole batch is sorted before
  matching).  Emits matched pairs append-style per batch.

Match rule (both forms): for each B event, the most recent A event of
the same key STRICTLY earlier in (ts, id) order with
``b_ts - a_ts <= gap_s``.  Deterministic under ties via the id
tie-break.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def followed_by(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch form: B events preceded by an A event of the same key
    within ``gap_s`` seconds → (key, a_ts, b_id, b_ts, gap_s_actual)."""
    ev = events.where(F.col(type_col).isin(type_a, type_b))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    a_ts = F.max(F.when(F.col(type_col) == type_a, F.col(ts_col))).over(w)
    carried = ev.withColumn("_a_ts", a_ts)
    return (
        carried.where(
            (F.col(type_col) == type_b)
            & F.col("_a_ts").isNotNull()
            & (F.unix_timestamp(ts_col) - F.unix_timestamp("_a_ts") <= gap_s)
        )
        .select(
            F.col(key_col).alias("key"),
            F.col("_a_ts").alias("a_ts"),
            F.col(id_col).alias("b_id"),
            F.col(ts_col).alias("b_ts"),
            (F.unix_timestamp(ts_col) - F.unix_timestamp("_a_ts")).alias("gap_actual_s"),
        )
    )


def not_followed_by(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Negative pattern: A events with NO B event of the same key in
    the ``gap_s`` seconds after them (strictly later in (ts, id) order)
    → (key, a_id, a_ts, next_b_ts nullable).  The dual of
    ``followed_by``: the NEXT B timestamp is carried backward by a
    ``min(case …)`` over the strictly-following rows — same
    hash-partitioned one-window shape.  In streaming this is the
    timer/timeout pattern (emit when the watermark passes a_ts+gap);
    the batch form is the oracle-checkable ground truth."""
    ev = events.where(F.col(type_col).isin(type_a, type_b))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_b = F.min(F.when(F.col(type_col) == type_b, F.col(ts_col))).over(w)
    carried = ev.withColumn("_b_ts", next_b)
    return carried.where(
        (F.col(type_col) == type_a)
        & (
            F.col("_b_ts").isNull()
            | (F.unix_timestamp("_b_ts") - F.unix_timestamp(ts_col) > gap_s)
        )
    ).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("a_id"),
        F.col(ts_col).alias("a_ts"),
        F.col("_b_ts").alias("next_b_ts"),
    )


_OUT_SCHEMA = "key long, a_ts timestamp, b_id long, b_ts timestamp, gap_actual_s long"
# exact integer microseconds — a float epoch would drift ~1 us at 2024
# timestamps and break bit-parity with the batch form's carried a_ts
_STATE_SCHEMA = "last_a_us long"


def _match(key, pdfs: Iterator[pd.DataFrame], state, type_a, type_b, gap_s,
           type_col="event_type", ts_col="ts", id_col="event_id",
           expire=False):
    last_a_us = state.get[0] if state.exists else None
    if expire and state.hasTimedOut:
        # watermark passed last_a + gap: no in-watermark B can ever
        # match this A again, so the key's state can go (semantics
        # preserved — a B that WOULD match would be late-dropped)
        state.remove()
        yield pd.DataFrame({c: [] for c in ("key", "a_ts", "b_id", "b_ts", "gap_actual_s")})
        return
    chunks = [p for p in pdfs if len(p)]
    rows = {"key": [], "a_ts": [], "b_id": [], "b_ts": [], "gap_actual_s": []}
    if chunks:
        # sort the WHOLE batch, not per chunk (chunk boundaries would
        # break the strictly-preceding order — same pitfall as
        # streaming/state.py's session counter)
        pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, id_col])
        pdf = pdf.reset_index(drop=True)
        # normalize to int64 MICROSECONDS regardless of the incoming
        # datetime64 resolution (ns under pandas<2-style conversion)
        ts_us = (
            pd.to_datetime(pd.Series(pdf[ts_col].values))
            .astype("datetime64[us]")
            .astype("int64")
        )
        is_a = pd.Series((pdf[type_col] == type_a).values)
        # carried last-A per row: A rows' stamps forward-filled, shifted
        # one row so the match is STRICTLY preceding, seeded with state
        a_us = ts_us.where(is_a).ffill().shift(1)
        if last_a_us is not None:
            a_us = a_us.fillna(float(last_a_us))
        is_b = pd.Series((pdf[type_col] == type_b).values)
        # whole-second gap via floor division — mirrors the batch
        # form's unix_timestamp() flooring exactly
        ok = is_b & a_us.notna()
        for pos in ok[ok].index:
            a = int(a_us.iloc[pos])
            gap = ts_us.iloc[pos] // 10**6 - a // 10**6
            # 0 <= gap: a straggler B older than the carried A (cross-
            # batch disorder, outside the documented in-order contract)
            # must not emit a pair the strictly-preceding batch window
            # could never produce — degrade gracefully instead
            if 0 <= gap <= gap_s:
                rows["key"].append(key[0])
                rows["a_ts"].append(pd.Timestamp(a, unit="us"))
                rows["b_id"].append(int(pdf[id_col].iloc[pos]))
                rows["b_ts"].append(pdf[ts_col].iloc[pos])
                rows["gap_actual_s"].append(int(gap))
        if is_a.any():
            last_a_us = int(ts_us[is_a].iloc[-1])
    if expire and last_a_us is None:
        # B-only keys carry nothing matchable: don't pin them in the
        # store forever
        state.remove()
    else:
        state.update((last_a_us,))
        if expire:
            deadline_ms = last_a_us // 1000 + int(gap_s * 1000) + 1
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
    yield pd.DataFrame(rows)


def followed_by_stream(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    expire_state: bool = False,
) -> DataFrame:
    """Streaming twin: one float of state per key (last A epoch).
    Column names are parameterized like the batch form's.

    ``expire_state=True`` (requires ``withWatermark`` upstream) evicts
    a key's state once the watermark passes ``last_a + gap_s`` — at
    10^12 keys the NoTimeout default retains one entry per key EVER
    seen, which is the unbounded-state hazard; expiry is
    semantics-preserving because a B that could still match an evicted
    A would be dropped as watermark-late anyway."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(key_col).applyInPandasWithState(
        lambda key, pdfs, state: _match(
            key, pdfs, state, type_a, type_b, gap_s, type_col, ts_col, id_col,
            expire_state,
        ),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if expire_state
            else GroupStateTimeout.NoTimeout
        ),
    )


# ---------------------------------------------------------------------------
# Streaming not-followed-by: the timeout/absence pattern
# ---------------------------------------------------------------------------

_NFB_OUT_SCHEMA = "key long, a_id long, a_ts timestamp"
# variable-length pending set: A events awaiting a B or their deadline.
# Microsecond ints for bit-parity with the batch form (same rationale
# as _STATE_SCHEMA above).
_NFB_STATE_SCHEMA = "a_ids array<long>, a_ts_us array<long>"


def _nfb_match(
    key,
    pdfs: Iterator[pd.DataFrame],
    state,
    type_a,
    type_b,
    gap_s,
    type_col="event_type",
    ts_col="ts",
    id_col="event_id",
):
    """Per-key kernel for ``not_followed_by_stream``.

    State = the pending A events (id, ts).  Resolution:

    - an IN-GAP B arrives (``0 <= b_ts - a_ts <= gap_s``) → the pattern
      matched: every pending A it covers is suppressed and cleared;
    - ABSENCE is certified only by the event-time watermark passing
      ``a_ts + gap_s`` (either the timer firing — Spark invokes the
      group with ``hasTimedOut`` — or the watermark loop below on a
      data-carrying invocation).  A too-late B (``b_ts - a_ts >
      gap_s``) proves NOTHING by itself under out-of-order arrival: an
      in-gap B may still arrive in a later micro-batch while the
      watermark is < a_ts + gap (not yet late-droppable), so the A
      stays pending — its timer deadline already covers it.  Emitting
      on the too-late B (the pre-round-5 behavior) produced false
      alerts the batch twin never emits whenever an in-gap B trailed a
      later-stamped B across micro-batches.

    Emits (key, a_id, a_ts) — the alert identity; the batch form's
    next_b_ts diagnostic column has no stable meaning under streaming
    emission times (a timeout alert by definition has not seen a B).
    """
    if state.exists:
        a_ids, a_ts_us = (list(state.get[0]), list(state.get[1]))
    else:
        a_ids, a_ts_us = [], []
    pending = list(zip(a_ids, a_ts_us))
    rows = {"key": [], "a_id": [], "a_ts": []}

    def emit(aid: int, aus: int) -> None:
        rows["key"].append(key[0])
        rows["a_id"].append(int(aid))
        rows["a_ts"].append(pd.Timestamp(aus, unit="us"))

    chunks = [] if state.hasTimedOut else [p for p in pdfs if len(p)]
    if chunks:
        # whole-batch sort — chunk boundaries must not break the
        # strictly-preceding order (same pitfall as _match above)
        pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, id_col])
        pdf = pdf.reset_index(drop=True)
        ts_us = (
            pd.to_datetime(pd.Series(pdf[ts_col].values))
            .astype("datetime64[us]")
            .astype("int64")
        )
        types = pdf[type_col].values
        ids = pdf[id_col].values
        # the batch twin compares WHOLE-SECOND gaps (unix_timestamp
        # floors) and only over rows STRICTLY following in (ts, id)
        # order — mirror both exactly, or sub-second boundaries
        # (a=.900, b=gap+.950: floored diff == gap, suppress) and
        # same-ts id ties diverge between the twins
        for pos in range(len(pdf)):
            if types[pos] == type_a:
                pending.append((int(ids[pos]), int(ts_us[pos])))
            elif types[pos] == type_b:
                b_us = int(ts_us[pos])
                b_id = int(ids[pos])
                b_sec = b_us // 10**6
                # in-gap B → matched, suppress; strictly-earlier or
                # too-late B → keep the A pending (see docstring: only
                # the watermark certifies absence)
                pending = [
                    (aid, aus)
                    for aid, aus in pending
                    if not (
                        ((b_us > aus) or (b_us == aus and b_id > aid))
                        and b_sec - aus // 10**6 <= gap_s
                    )
                ]
    # expire pending A's the watermark has passed (covers both the
    # timed-out invocation and late watermark advancement with data).
    # Under the batch twin's floored-second gap, the LAST suppressing
    # B for an A lies anywhere below (floor(a_ts) + floor(gap) + 1) s —
    # absence is certain only once the watermark reaches that bucket
    # end, not a_ts + gap exactly (a sub-second A would otherwise emit
    # while a still-admissible in-floor-gap B is outstanding).
    gap_floor = math.floor(gap_s)

    def deadline_us(aus: int) -> int:
        return (aus // 10**6 + gap_floor + 1) * 10**6

    wm_us = state.getCurrentWatermarkMs() * 1000
    if wm_us > 0:
        still = []
        for aid, aus in pending:
            if deadline_us(aus) <= wm_us:
                emit(aid, aus)  # no B within gap, watermark certain
            else:
                still.append((aid, aus))
        pending = still
    if pending:
        state.update((
            [a for a, _ in pending],
            [u for _, u in pending],
        ))
        # earliest outstanding deadline; must be strictly ahead of the
        # watermark or Spark rejects it
        deadline_ms = min(deadline_us(u) for _, u in pending) // 1000
        state.setTimeoutTimestamp(max(deadline_ms, state.getCurrentWatermarkMs() + 1))
    else:
        state.remove()
    yield pd.DataFrame(rows)


def not_followed_by_stream(
    events: DataFrame,
    type_a: str,
    type_b: str,
    gap_s: float,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``not_followed_by`` — the canonical CEP
    timeout/absence pattern (the reference's alert path,
    ``src/processors/dex_processor.rs:156-164``, fires on a condition;
    this fires on the ABSENCE of one): emit A once the event-time
    watermark passes ``a_ts + gap_s`` with no matching B seen — the
    only sound absence certificate under out-of-order arrival (a
    too-late B is NOT one: an in-gap B can still arrive in a later
    micro-batch until the watermark closes the gap window).  Requires
    ``withWatermark`` on ``ts_col`` upstream (EventTimeTimeout needs a
    watermark).  State is O(pending A's per key); every resolution
    path clears it."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy(key_col).applyInPandasWithState(
        lambda key, pdfs, state: _nfb_match(
            key, pdfs, state, type_a, type_b, gap_s, type_col, ts_col, id_col
        ),
        outputStructType=_NFB_OUT_SCHEMA,
        stateStructType=_NFB_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Multi-step pattern chain: t0 -> t1 -> ... -> t_{n-1} with per-step gaps
# ---------------------------------------------------------------------------


def pattern_chain(
    events: DataFrame,
    types: list[str],
    gaps_s: list[float],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """N-step CEP chain: for each final-step event, the most recent
    valid prefix chain strictly earlier in (ts, id) order, where step i
    must follow step i-1 within ``gaps_s[i-1]`` seconds ("most recent"
    at every step — the same last-A rule as ``followed_by``, applied
    inductively).

    ONE hash-partitioned window pass per prefix step over the SAME
    (key, ts, id) sort — Catalyst stacks the Window operators on a
    single exchange+sort, so the whole chain costs one shuffle
    regardless of length.  Step i carries
    ``max(struct(ts_i, ts_{i-1}, …, ts_0))`` over the strictly-
    preceding frame: struct ordering is by the LATEST step's timestamp
    first, so the carried value is the most recent valid prefix and
    brings every earlier step's timestamp along for the output.

    Output: (key, step0_ts … step{n-2}_ts, last_id, last_ts).
    Reference analog: the alert cascade in
    ``src/processors/dex_processor.rs:156-164`` is single-step; this is
    the general funnel form."""
    n = len(types)
    if n < 2 or len(gaps_s) != n - 1:
        raise ValueError("need >= 2 types and exactly len(types)-1 gaps")
    ev = events.where(F.col(type_col).isin(*types))
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    df = ev
    for i in range(n - 1):
        if i == 0:
            carried = F.max(
                F.when(
                    F.col(type_col) == types[0],
                    F.struct(F.col(ts_col).alias("ts0")),
                )
            ).over(w)
        else:
            prev = F.col(f"_c{i - 1}")
            valid = (
                (F.col(type_col) == types[i])
                & prev.isNotNull()
                & (
                    F.unix_timestamp(ts_col) - F.unix_timestamp(prev[f"ts{i - 1}"])
                    <= gaps_s[i - 1]
                )
            )
            fields = [F.col(ts_col).alias(f"ts{i}")] + [
                prev[f"ts{j}"].alias(f"ts{j}") for j in range(i - 1, -1, -1)
            ]
            carried = F.max(F.when(valid, F.struct(*fields))).over(w)
        df = df.withColumn(f"_c{i}", carried)
    last = F.col(f"_c{n - 2}")
    final = df.where(
        (F.col(type_col) == types[-1])
        & last.isNotNull()
        & (
            F.unix_timestamp(ts_col) - F.unix_timestamp(last[f"ts{n - 2}"])
            <= gaps_s[-1]
        )
    )
    return final.select(
        F.col(key_col).alias("key"),
        *[last[f"ts{i}"].alias(f"step{i}_ts") for i in range(n - 1)],
        F.col(id_col).alias("last_id"),
        F.col(ts_col).alias("last_ts"),
    )


_CHAIN_STATE_SCHEMA = "prefix_us array<long>"


def _chain_match(
    key,
    pdfs: Iterator[pd.DataFrame],
    state,
    types,
    gaps_s,
    type_col="event_type",
    ts_col="ts",
    id_col="event_id",
    expire=False,
):
    """Streaming kernel for ``pattern_chain_stream``: state is one
    int64-microsecond timestamp array per key — ``prefix_us[i]`` = the
    latest valid chain prefix ending at step i (its per-step
    timestamps), exactly the batch form's carried struct."""
    n = len(types)
    # prefix[i] = list of i+1 step timestamps (us) or None
    if state.exists:
        flat = list(state.get[0])
        prefix = []
        pos = 0
        for i in range(n - 1):
            chunk = flat[pos : pos + i + 1]
            pos += i + 1
            prefix.append(chunk if all(u >= 0 for u in chunk) else None)
    else:
        prefix = [None] * (n - 1)
    gaps_us = [int(g * 1_000_000) for g in gaps_s]
    if expire and state.hasTimedOut:
        state.remove()
        yield pd.DataFrame(
            [],
            columns=["key"]
            + [f"step{i}_ts" for i in range(n - 1)]
            + ["last_id", "last_ts"],
        )
        return
    cols = (
        ["key"]
        + [f"step{i}_ts" for i in range(n - 1)]
        + ["last_id", "last_ts"]
    )
    rows: list[list] = []
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values([ts_col, id_col])
        pdf = pdf.reset_index(drop=True)
        ts_us = (
            pd.to_datetime(pd.Series(pdf[ts_col].values))
            .astype("datetime64[us]")
            .astype("int64")
        )
        tvals = pdf[type_col].values
        ids = pdf[id_col].values
        for pos2 in range(len(pdf)):
            t, us = tvals[pos2], int(ts_us[pos2])
            # snapshot-then-apply: when the SAME type appears at several
            # chain steps (e.g. A->A), one event plays every matching
            # role — but each role must read the prefixes as they stood
            # BEFORE this event (the strictly-preceding rule: an event
            # cannot extend a chain it just advanced)
            updates: dict[int, list[int]] = {}
            for i in range(n):
                if t != types[i]:
                    continue
                if i == 0:
                    updates[0] = [us]
                else:
                    base = prefix[i - 1]
                    if base is not None and (
                        us // 10**6 - base[-1] // 10**6 <= gaps_s[i - 1]
                    ):
                        if i == n - 1:
                            rows.append(
                                [key[0]]
                                + [pd.Timestamp(u, unit="us") for u in base]
                                + [int(ids[pos2]), pdf[ts_col].iloc[pos2]]
                            )
                        else:
                            updates[i] = base + [us]
            for i, v in updates.items():
                prefix[i] = v
    if expire:
        # a prefix ending at step i can only extend within gaps_s[i];
        # once the watermark passes last_ts + gaps_s[i] the candidate
        # extension would be late-dropped, so the prefix is dead weight
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0:
            for i in range(n - 1):
                if prefix[i] is not None and prefix[i][-1] + gaps_us[i] < wm_us:
                    prefix[i] = None
    if expire and all(p is None for p in prefix):
        state.remove()
    else:
        flat_out: list[int] = []
        for i in range(n - 1):
            flat_out += prefix[i] if prefix[i] is not None else [-1] * (i + 1)
        state.update((flat_out,))
        if expire:
            deadline_ms = (
                min(
                    prefix[i][-1] + gaps_us[i]
                    for i in range(n - 1)
                    if prefix[i] is not None
                )
                // 1000
                + 1
            )
            state.setTimeoutTimestamp(
                max(deadline_ms, state.getCurrentWatermarkMs() + 1)
            )
    yield pd.DataFrame(rows, columns=cols)


def pattern_chain_stream(
    events: DataFrame,
    types: list[str],
    gaps_s: list[float],
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    expire_state: bool = False,
) -> DataFrame:
    """Streaming twin of ``pattern_chain``: O(n_steps) timestamps of
    state per key, no event buffering — each arriving event either
    extends the latest valid prefix one step or completes the chain.

    ``expire_state=True`` (requires ``withWatermark`` upstream) prunes
    prefixes the watermark has made unextendable and evicts emptied
    keys — the bounded-state mode for 10^12-key deployments; without it
    every key ever seen keeps an entry forever."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    n = len(types)
    if n < 2 or len(gaps_s) != n - 1:
        raise ValueError("need >= 2 types and exactly len(types)-1 gaps")
    out_schema = (
        "key long, "
        + ", ".join(f"step{i}_ts timestamp" for i in range(n - 1))
        + ", last_id long, last_ts timestamp"
    )
    return events.groupBy(key_col).applyInPandasWithState(
        lambda key, pdfs, state: _chain_match(
            key, pdfs, state, types, gaps_s, type_col, ts_col, id_col, expire_state
        ),
        outputStructType=out_schema,
        stateStructType=_CHAIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if expire_state
            else GroupStateTimeout.NoTimeout
        ),
    )
