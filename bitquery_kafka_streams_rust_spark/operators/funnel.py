"""Ordered-step funnel conversion and session path mining.

The product-analytics face of the CEP family: ``cep.followed_by``
emits every individual A→B match; a funnel wants the AGGREGATE — how
many users reached step 1, of those how many reached step 2 within
the horizon, and so on (the reference's per-key pattern caches in
src/processors/dex_processor.rs track exactly this per-key "did the
next stage happen" progression; here it is rolled up corpus-wide).

Funnel semantics (the classic "window from first step" model):

- step 1 time  = the user's EARLIEST step-1 event;
- step i time  = the earliest step-i event at or after the step-(i-1)
  time and no later than ``t_step1 + horizon_s``;
- a user counts toward step i only if they count toward step i-1.

Scale shape: one groupBy per step on the user key, each preceded by a
type filter that shrinks the candidate side before the shuffle; the
per-step frames join back on the SAME key, so AQE reuses the
partitioning (no re-shuffle of an already user-partitioned side) and
identical aggregate subtrees dedup via ReusedExchange.  Per-user state
is a handful of timestamps — a hot user contributes one partial per
partition through every aggregate (partial combine on min).  The
summary is a 1-row aggregate exploded to len(steps) rows: no global
window, no driver-side loop.

Session paths: sessionize by inactivity gap (the arithmetic twin of
the events_sessionize contract query, ordered by (ts, event_id) so
ties are deterministic), take each session's first ``depth`` event
types as a '>'-joined string, count paths, keep the top k.  The
per-session fold is ONE aggregate (sort_array over struct rows inside
the group — bounded by events-per-session, never corpus-wide), and the
top-k is an orderBy+limit that plans as a TakeOrdered heap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_step_times(
    events: DataFrame,
    steps: Sequence[str],
    *,
    horizon_s: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user step-completion times: one row per user who completed
    step 1, with nullable ``t_0 .. t_{k-1}`` epoch-second columns
    (``t_i`` null = dropped out before step i+1)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.unix_timestamp(ts_col).alias("uts"),
    )
    first = (
        e.where(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("uts").alias("t_0"))
    )
    frames = [first]
    for i, st in enumerate(steps[1:], start=1):
        prev = frames[-1].select(
            "u", F.col("t_0"), F.col(f"t_{i - 1}").alias("t_prev")
        )
        nxt = (
            e.where(F.col("et") == st)
            .join(prev, "u")
            .where(
                (F.col("uts") >= F.col("t_prev"))
                & (F.col("uts") <= F.col("t_0") + F.lit(int(horizon_s)))
            )
            .groupBy("u", "t_0")
            .agg(F.min("uts").alias(f"t_{i}"))
        )
        frames.append(nxt)
    out = frames[0]
    for i in range(1, len(steps)):
        out = out.join(
            frames[i].select("u", f"t_{i}"), "u", "left"
        )
    return out


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    *,
    horizon_s: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per funnel step: users reaching it, conversion from
    step 1 and from the previous step (both rounded to 9 dp; 0.0 when
    the denominator is empty, so an empty corpus yields all-zero rows
    instead of nulls)."""
    times = funnel_step_times(
        events,
        steps,
        horizon_s=horizon_s,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
    )
    counts = times.agg(
        *[F.count(f"t_{i}").alias(f"n_{i}") for i in range(len(steps))]
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i + 1).alias("step"),
                    F.lit(steps[i]).alias("step_name"),
                    F.col(f"n_{i}").alias("n_users"),
                    F.col("n_0").alias("_n_first"),
                    F.col(f"n_{max(i - 1, 0)}").alias("_n_prev"),
                )
                for i in range(len(steps))
            ]
        )
    ).alias("r")
    r = counts.select(rows).select("r.*")
    safe = lambda num, den: F.when(  # noqa: E731
        F.col(den) > 0, F.round(F.col(num).cast("double") / F.col(den), 9)
    ).otherwise(F.lit(0.0))
    return r.select(
        "step",
        "step_name",
        "n_users",
        safe("n_users", "_n_first").alias("conv_overall"),
        safe("n_users", "_n_prev").alias("conv_prev"),
    ).orderBy("step")


def top_session_paths(
    events: DataFrame,
    *,
    gap_s: int = 1800,
    depth: int = 3,
    k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` session-opening paths: the first ``depth`` event
    types of each inactivity-gap session, '>'-joined, counted, ordered
    by (count DESC, path ASC).  Session boundaries use the SAME
    strictly-greater-than-gap rule as ``streaming/sessions.py`` and
    the events_sessionize oracle."""
    uts = F.unix_timestamp(ts_col)
    w = Window.partitionBy(user_col).orderBy(uts, F.col(id_col))
    lagged = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("et"),
        F.col(id_col).alias("eid"),
        uts.alias("uts"),
        F.lag(uts).over(w).alias("prev_uts"),
    )
    brk = (
        F.col("prev_uts").isNull()
        | ((F.col("uts") - F.col("prev_uts")) > F.lit(int(gap_s)))
    ).cast("int")
    sess = (
        lagged.withColumn("brk", brk)
        .withColumn(
            "sess",
            F.sum("brk").over(
                Window.partitionBy("u")
                .orderBy("uts", "eid")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    paths = sess.groupBy("u", "sess").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("uts", "eid", "et"))
                    ),
                    1,
                    depth,
                ),
                lambda x: x.getField("et"),
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(k)
    )


def retention_cohorts(
    events: DataFrame,
    *,
    bucket_s: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the time bucket
    of their FIRST event; cell (cohort, offset) counts the distinct
    users of that cohort active ``offset`` buckets later, plus the
    retention ratio against the cohort's size (its offset-0 cell —
    every user is active in their own first bucket by construction).

    The reference's per-key first-seen caches
    (src/processors/dex_processor.rs) track exactly this "when did the
    key first appear / is it still active" progression per key; this is
    the corpus-wide rollup a product-analytics user reads as the
    retention triangle.

    Scale shape: one min-aggregate on the user key, a join back to the
    activity rows on that SAME key (AQE reuses the user partitioning,
    identical subtrees dedup via ReusedExchange), a distinct on the
    narrow (user, cohort, offset) triple, then a count whose
    (cohort, offset) key space is calendar-bounded metadata.  The
    cohort-size side is that same aggregate filtered to offset 0 —
    broadcast, never a global window.  A hot user folds to one partial
    per partition through the min; the distinct bounds any user's
    contribution to one row per (cohort, offset) cell.

    Retention is rounded to 9 dp (repo float-parity convention).
    """
    b = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(int(bucket_s))).cast("long")
    e = events.select(F.col(user_col).alias("u"), b.alias("b"))
    first = e.groupBy("u").agg(F.min("b").alias("cohort_b"))
    act = (
        e.join(first, "u")
        .select("u", "cohort_b", (F.col("b") - F.col("cohort_b")).alias("day_offset"))
    )
    if max_offset is not None:
        act = act.where(F.col("day_offset") <= int(max_offset))
    cells = (
        act.distinct()
        .groupBy("cohort_b", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )
    sizes = cells.where(F.col("day_offset") == 0).select(
        "cohort_b", F.col("n_users").alias("_size")
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_b")
        .select(
            F.col("cohort_b").alias("cohort_day"),
            "day_offset",
            "n_users",
            F.round(F.col("n_users").cast("double") / F.col("_size"), 9).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "day_offset")
    )


def attribution(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_types: Sequence[str] = ("click", "view", "signup"),
    lookback_s: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: credit each
    conversion event's value to the channel (event type) of the user's
    earliest / latest qualifying touch within ``lookback_s`` seconds
    before the conversion; conversions with no qualifying touch credit
    the ``'direct'`` channel.  Output one row per (model, channel):
    ``model in ('first_touch', 'last_touch')``, ``n_conv``,
    ``value_sum`` (display-rounded to 6 dp on both engines).

    Scale shape: both sides are type-filtered BEFORE the user-key
    equi-join (the range predicate rides the join as a residual, never
    a cartesian); per-conversion first/last touches are one partial-
    combined ``min_by/max_by`` aggregate keyed by the conversion id
    with a (touch time, touch id) struct tie-break, so a hot user's
    touch history collapses map-side; the unattributed remainder is a
    churn-sized anti-join.  The final rollup is channel-cardinality
    bounded.  Mirrors the reference's per-key event-correlation caches
    (``src/processors/dex_processor.rs``) rolled up corpus-wide.
    """
    uts = F.unix_timestamp(ts_col)
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("u"),
        F.col(id_col).alias("conv_id"),
        uts.alias("c_uts"),
        F.col(value_col).alias("val"),
    )
    touch = events.where(F.col(type_col).isin(list(touch_types))).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("channel"),
        F.col(id_col).alias("t_id"),
        uts.alias("t_uts"),
    )
    attributed = (
        conv.join(touch, "u")
        .where(
            (F.col("t_uts") <= F.col("c_uts"))
            & (F.col("t_uts") >= F.col("c_uts") - F.lit(int(lookback_s)))
        )
        .groupBy("conv_id", "val")
        .agg(
            F.min_by("channel", F.struct("t_uts", "t_id")).alias("first_ch"),
            F.max_by("channel", F.struct("t_uts", "t_id")).alias("last_ch"),
        )
    )
    direct = conv.join(attributed.select("conv_id"), "conv_id", "left_anti").select(
        "conv_id", "val", F.lit("direct").alias("first_ch"), F.lit("direct").alias("last_ch")
    )
    per_conv = attributed.select("conv_id", "val", "first_ch", "last_ch").unionByName(
        direct
    )
    models = per_conv.select(
        "val",
        F.explode(
            F.array(
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("first_ch").alias("channel"),
                ),
                F.struct(
                    F.lit("last_touch").alias("model"),
                    F.col("last_ch").alias("channel"),
                ),
            )
        ).alias("m"),
    )
    return (
        models.groupBy(F.col("m.model").alias("model"), F.col("m.channel").alias("channel"))
        .agg(
            F.count("*").alias("n_conv"),
            F.round(F.sum("val"), 6).alias("value_sum"),
        )
        .orderBy("model", "channel")
    )


def transition_matrix(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    state_col: str,
    *,
    id_col: str = "event_id",
    out_dp: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-subject event
    sequences: for every (prev_state, state) pair, the transition
    count and row-normalized probability — the generative summary of
    user behavior that ``top_session_paths`` samples and the funnel
    queries slice.

    Shape: ONE subject-partitioned lag window (ordered by ts, id —
    parallel per subject) produces the narrow (prev, cur) pairs; one
    partial-combined aggregate counts them; the row normalizer is a
    window SUM over the ≤|states| cells of a prev-row — never a
    data-scale window.  Counts are exact longs; prob is one division
    rounded to ``out_dp``."""
    w = Window.partitionBy(subject_col).orderBy(
        F.unix_timestamp(F.col(ts_col)), F.col(id_col)
    )
    pairs = (
        df.select(
            F.col(subject_col),
            F.col(state_col).alias("state"),
            F.lag(F.col(state_col)).over(w).alias("prev_state"),
        )
        .where(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_row = Window.partitionBy("prev_state")
    total = F.sum("n").over(w_row).cast("double")
    return pairs.select(
        "prev_state",
        "state",
        "n",
        F.round(F.col("n").cast("double") / total, out_dp).alias("prob"),
    )
