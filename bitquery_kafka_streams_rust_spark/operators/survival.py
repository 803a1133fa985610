"""Kaplan-Meier survival estimation — time-to-event with censoring.

"How long until a signed-up user converts?" is a SURVIVAL question:
users who never converted are not failures to discard but CENSORED
observations (they survived at least as long as we watched).  Naive
conversion-delay averages over converters only are biased; the
Kaplan-Meier product-limit estimator is the standard fix, and it
decomposes perfectly for Spark:

1. collapse observations to one row per (group, duration) with event
   and censor counts — ONE partial-combined aggregate (the 100 TB
   reduction: curve cardinality is distinct durations, not subjects);
2. the at-risk count n(t) = N − (events+censors strictly before t) is
   an exclusive running sum over a window PARTITIONED BY GROUP ordered
   by duration — never a global window;
3. S(t) = Π_{t' ≤ t} (1 − d/n) evaluates in log space as a running
   INTEGER sum of map-side-quantized terms round(ln(1−d/n)·1e9) — the
   repo's round-the-libm-call + integer-grid doctrine, so the running
   product is order-independent and bit-equal in DuckDB; exp() of the
   identical double finishes it.  A step where d = n sends survival to
   exactly 0 (flagged, not ln(0)) and pins every later step to 0.

Reference analog: the reference's session/alert timers
(``src/processors/dex_processor.rs`` threshold paths) measure "did X
happen within the gap"; Kaplan-Meier is the full distribution of WHEN,
with the never-happened mass handled honestly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def survival_km(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: Sequence[str] = (),
    *,
    out_dp: int = 6,
) -> DataFrame:
    """Kaplan-Meier curve per group from (duration, event 0/1) rows —
    event=1 is an observed event at ``duration``, event=0 a censored
    subject last seen at ``duration``.

    Output: one row per (group, distinct duration):
    (*group_cols, duration, n_risk, n_event, n_censored, survival),
    survival rounded to ``out_dp``."""
    group_cols = list(group_cols)
    ev = F.col(event_col).cast("long")
    agg = df.groupBy(*group_cols, F.col(duration_col).alias("duration")).agg(
        F.sum(ev).alias("n_event"),
        (F.count(F.lit(1)) - F.sum(ev)).alias("n_censored"),
    )
    w_ord = Window.partitionBy(*group_cols).orderBy("duration")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy(*group_cols)
    leaving = (F.col("n_event") + F.col("n_censored")).cast("long")
    n_risk = (
        F.sum(leaving).over(w_all)
        - F.coalesce(
            F.sum(leaving).over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
    ).alias("n_risk")
    staged = agg.select(*group_cols, "duration", "n_event", "n_censored", n_risk)
    d, n = F.col("n_event").cast("double"), F.col("n_risk").cast("double")
    # quantized log-factor: exact long, order-independent running sum
    lq = F.when(
        F.col("n_event") < F.col("n_risk"),
        F.round(F.round(F.log(F.lit(1.0) - d / n), 9) * F.lit(1e9), 0).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    dead = F.when(F.col("n_event") >= F.col("n_risk"), 1).otherwise(0)
    staged = staged.select(
        *group_cols,
        "duration",
        "n_risk",
        "n_event",
        "n_censored",
        F.sum(lq).over(w_cum).alias("_ls"),
        F.max(dead).over(w_cum).alias("_dead"),
    )
    surv = F.when(F.col("_dead") == 1, F.lit(0.0)).otherwise(
        F.exp(F.col("_ls").cast("double") / F.lit(1e9))
    )
    return staged.select(
        *group_cols,
        "duration",
        "n_risk",
        "n_event",
        "n_censored",
        F.round(surv, out_dp).alias("survival"),
    )


def durations_to_event(
    df: DataFrame,
    subject_col: str,
    ts_col: str,
    *,
    start_pred,
    event_pred,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-subject (duration_s, event) pairs from an event log: the
    clock starts at the subject's FIRST row matching ``start_pred``;
    event=1 at the first ``event_pred`` row at-or-after the start,
    else censored at the subject's last observed row.  Subjects with
    no start row drop.  ONE subject-keyed aggregate — min/max/min-if
    are partial-aggregable (conditional min_by shape)."""
    group_cols = list(group_cols)
    uts = F.unix_timestamp(F.col(ts_col))
    starts = (
        df.where(start_pred)
        .groupBy(subject_col)
        .agg(F.min(uts).alias("_t0"))
    )
    # both aggregates key on the subject — the second exchange reuses
    # the first's partitioning (AQE), and the join is narrow same-key
    joined = df.join(starts, subject_col).select(
        subject_col,
        *group_cols,
        F.col("_t0"),
        uts.alias("_uts"),
        (event_pred & (uts >= F.col("_t0"))).alias("_is_ev"),
    )
    g = joined.groupBy(subject_col, *group_cols).agg(
        F.min("_t0").alias("_t0"),
        F.max("_uts").alias("_tlast"),
        F.min(F.when(F.col("_is_ev"), F.col("_uts"))).alias("_tev"),
    )
    has_event = F.col("_tev").isNotNull()
    return g.select(
        subject_col,
        *group_cols,
        F.when(has_event, F.col("_tev") - F.col("_t0"))
        .otherwise(F.col("_tlast") - F.col("_t0"))
        .cast("long")
        .alias("duration_s"),
        has_event.cast("int").alias("event"),
    )
