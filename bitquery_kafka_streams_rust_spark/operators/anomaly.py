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
