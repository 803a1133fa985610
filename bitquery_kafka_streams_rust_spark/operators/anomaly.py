"""Robust outlier detection — median/MAD deviation gates.

The reference's alerting path compares each event's value against a
FIXED threshold (src/processors/dex_processor.rs min-amount gates and
the alert sink's cutoffs).  A corpus-scale curation/monitoring pipeline
wants the adaptive version: flag values that are extreme *relative to
the key's own distribution*, using the median/MAD pair because both
are rank statistics — a handful of corrupt 1e30 rows moves a mean/std
gate's threshold arbitrarily but barely moves the median.

Float-parity contract (repo convention — round on BOTH sides): the
median and the MAD are rounded to 6 dp the moment they are computed
(exactly the events_percentiles precedent: Spark ``F.percentile`` and
DuckDB ``quantile_cont`` agree at 6 dp), so every downstream term —
``abs(v - med)``, ``k * mad`` — is IEEE-exact arithmetic on identical
inputs and the flag comparison cannot flip across engines.  The MAD is
definitionally the median of ``abs(v - rounded-median)``.

Scale shape: two aggregates on the SAME group key (the second consumes
the first's join-back, so AQE reuses the partitioning) plus two
broadcast joins of group-cardinality metadata; the gate itself is
map-side.  ``approx=True`` swaps exact ``F.percentile`` (which buffers
every value per group — fine for oracles, wrong at 100 TB) for the
mergeable ``F.percentile_approx`` sketch, one partial-combined pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_stats(
    df: DataFrame,
    value_col: str,
    by: str,
    *,
    approx: bool = False,
) -> DataFrame:
    """Per-group (med, mad), both rounded to 6 dp (see module
    docstring for why the rounding happens HERE, not at display)."""
    pct = F.percentile_approx if approx else F.percentile
    v = F.col(value_col)
    med = df.groupBy(by).agg(F.round(pct(v, 0.5), 6).alias("med"))
    dev = df.join(F.broadcast(med), by).select(
        F.col(by), F.abs(v - F.col("med")).alias("_adev")
    )
    mad = dev.groupBy(by).agg(F.round(pct(F.col("_adev"), 0.5), 6).alias("mad"))
    # both sides are group-cardinality metadata — broadcast one so the
    # stats pairing never plans a sort-merge exchange
    return med.join(F.broadcast(mad), by)


def mad_outliers(
    df: DataFrame,
    value_col: str,
    by: str,
    *,
    k: float = 3.0,
    approx: bool = False,
) -> DataFrame:
    """Rows whose value deviates from the group median by more than
    ``k`` MADs: input columns + (med, mad, deviation).  Degenerate
    groups (mad = 0, >=50% of values identical) flag every non-median
    value — the conventional reading; gate upstream if unwanted."""
    stats = mad_stats(df, value_col, by, approx=approx)
    v = F.col(value_col)
    return (
        df.join(F.broadcast(stats), by)
        .where(F.abs(v - F.col("med")) > F.lit(float(k)) * F.col("mad"))
        .withColumn("deviation", F.round(F.abs(v - F.col("med")), 6))
    )


def winsorize_stats(
    df: DataFrame,
    value_col: str,
    by: str,
    *,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    approx: bool = False,
    q_scale: int = 1_000_000,
) -> DataFrame:
    """Per-group winsorized (clipped-tail) summary — the robust-mean
    companion to the MAD gate: instead of DROPPING outliers it clamps
    values into [p_lo, p_hi] percentile cutoffs before aggregating, the
    standard treatment for long-tailed reward/value columns feeding a
    training mix.

    Float-parity contract: cutoffs round to 6 dp the moment they are
    computed (the mad_stats / events_percentiles precedent), and the
    clipped values quantize to a ``round(v * q_scale)`` integer grid
    BEFORE the sum — so the group mean derives from exact long sums,
    order-independent and bit-equal in DuckDB (the ab_test doctrine;
    a raw double sum would drift with partition order).

    Scale shape: one percentile aggregate per group (``approx=True``
    for the mergeable sketch at 100 TB), the group-cardinality cutoff
    table broadcast back, then ONE map-side-combined aggregate — the
    clamp itself never shuffles.

    Output: (by, n, n_lo, n_hi, cut_lo, cut_hi, win_mean) where
    n_lo/n_hi count clamped rows."""
    pct = F.percentile_approx if approx else F.percentile
    v = F.col(value_col)
    cuts = df.groupBy(by).agg(
        F.round(pct(v, float(p_lo)), 6).alias("cut_lo"),
        F.round(pct(v, float(p_hi)), 6).alias("cut_hi"),
    )
    clipped = F.least(F.greatest(v, F.col("cut_lo")), F.col("cut_hi"))
    qc = F.round(clipped * F.lit(int(q_scale)), 0).cast("long")
    return (
        df.join(F.broadcast(cuts), by)
        .groupBy(by, "cut_lo", "cut_hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((v < F.col("cut_lo")).cast("long")).alias("n_lo"),
            F.sum((v > F.col("cut_hi")).cast("long")).alias("n_hi"),
            F.sum(qc).alias("_sq"),
        )
        .select(
            by,
            "n",
            "n_lo",
            "n_hi",
            "cut_lo",
            "cut_hi",
            F.round(
                F.col("_sq").cast("double")
                / F.lit(float(q_scale))
                / F.col("n").cast("double"),
                6,
            ).alias("win_mean"),
        )
    )
