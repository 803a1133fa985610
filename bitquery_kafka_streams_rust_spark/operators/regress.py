"""Group-wise ordinary least squares in ONE aggregation pass.

The classic scalable-regression shape: OLS over (x, y) needs only five
sufficient statistics per group — Σx, Σy, Σx², Σy², Σxy — all
partial-aggregable, so a 100 TB fact table collapses map-side to one
moment row per (group, partition) before the single exchange.  No
window, no join, no second scan.  This upgrades the reference's flat
per-key counters (``src/processors/dex_processor.rs:91-117``) to trend
estimation: slope/intercept/r² per key.

Cross-engine exactness doctrine (CLAUDE.md): the caller supplies x as
an INTEGER column (epoch seconds minus a fixed literal origin, a
pre-quantized log, ...) and y quantizes map-side to
``round(y * y_scale)`` longs, so all five sums are EXACT integer
arithmetic — order-independent, restart-identical, and bit-equal in
DuckDB (whose BIGINT sums widen to HUGEINT; both engines then cast the
same exact integer to double, and the readout runs one identical IEEE
sequence — parity needs no tolerance beyond the output rounding).

Overflow headroom is the caller's contract: with |x| ≤ X and n rows
per group, Σx² ≤ n·X² must stay under 2^63 (~9.2e18) — at X=2.6e6
(a month of seconds) that is n ≤ 1.3e6 per group; coarsen the x unit
(hours) or shrink y_scale for longer spans/denser groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ols_moments(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    *,
    y_scale: int = 1000,
) -> DataFrame:
    """Per-group exact-integer OLS sufficient statistics: (n, Σx, Σy,
    Σx², Σy², Σxy) on the quantized grid.  Pure partial-aggregable
    long sums — order-independent, so the SAME expression doubles as a
    streaming aggregation whose state after N micro-batches is
    bit-identical to the batch aggregate over their union (see
    ``streaming/trend_monitor.py``)."""
    qx = F.col(x_col).cast("long")
    qy = F.round(F.col(y_col).cast("double") * F.lit(y_scale), 0).cast("long")
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count("*").alias("n"),
        F.sum(qx).alias("_sx"),
        F.sum(qy).alias("_sy"),
        F.sum(qx * qx).alias("_sxx"),
        F.sum(qy * qy).alias("_syy"),
        F.sum(qx * qy).alias("_sxy"),
    )


def ols_readout(
    m: DataFrame,
    group_cols: Sequence[str] = (),
    *,
    y_scale: int = 1000,
    x_scale: int = 1,
    slope_dp: int = 12,
    out_dp: int = 6,
) -> DataFrame:
    """Project a moment table (``ols_moments`` output / streaming
    state) to slope/intercept/r² — one identical IEEE sequence from
    exact longs in any engine."""
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, syy = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x_n = n * sxx - sx * sx
    var_y_n = n * syy - sy * sy
    ok = (F.col("n") > 1) & (var_x_n != 0)
    slope_q = cov_n / var_x_n
    slope = slope_q * F.lit(float(x_scale)) / F.lit(float(y_scale))
    intercept = (sy - slope_q * sx) / n / F.lit(float(y_scale))
    r2 = (cov_n * cov_n) / (var_x_n * var_y_n)
    return m.select(
        *group_cols,
        "n",
        F.when(ok, F.round(slope, slope_dp)).alias("slope"),
        F.when(ok, F.round(intercept, out_dp)).alias("intercept"),
        F.when(ok & (var_y_n != 0), F.round(r2, out_dp)).alias("r2"),
    )


def group_ols(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: Sequence[str] = (),
    *,
    y_scale: int = 1000,
    x_scale: int = 1,
    slope_dp: int = 12,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group OLS fit of ``y ~ slope * x + intercept`` plus r².

    ``x_col`` must already be integer-valued (the caller fixes the
    origin/unit: portable across engines only if both sides derive it
    identically).  If x itself was pre-quantized from a real axis as
    ``round(x_real * x_scale)``, pass that ``x_scale`` so the reported
    slope is in real-axis units.  ``y`` quantizes to a
    ``round(y * y_scale)`` grid map-side.

    Groups with < 2 rows or zero x-variance emit NULL fit columns;
    zero y-variance additionally NULLs r² (0/0).  Rounding: slope to
    ``slope_dp`` (its magnitude is y-units per x-unit — tiny for
    per-second trends), intercept/r² to ``out_dp``."""
    return ols_readout(
        ols_moments(df, x_col, y_col, group_cols, y_scale=y_scale),
        group_cols,
        y_scale=y_scale,
        x_scale=x_scale,
        slope_dp=slope_dp,
        out_dp=out_dp,
    )


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
    group_cols: Sequence[str] = (),
    *,
    y_scale: int = 1_000_000,
    out_dp: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test per group — the
    NONPARAMETRIC companion to the Welch-z A/B readout: compares the
    WHOLE value distribution of side A vs side B (``side_col`` boolean,
    true = A), catching variance/shape shifts a mean test misses.

    Exactness doctrine: values quantize map-side to round(v·y_scale)
    longs and duplicate values collapse in ONE partial-combined
    aggregate (output cardinality = distinct values per group); the
    running CDFs are cumulative INTEGER sums in a group-partitioned
    window; the KS statistic maximizes the integer cross-multiplication
    |cum_a·n_b − cum_b·n_a| (zero float until the final division), so
    both engines agree bit-for-bit.  Overflow contract:
    n_a·n_b < 2^63 — fine to ~3e9 rows per side per group.

    Output: (*group_cols, n_a, n_b, ks_d, ks_lambda) where
    ks_lambda = D·sqrt(n_a·n_b/(n_a+n_b)) (the asymptotic
    significance argument; reject at ~1.36 for α=0.05)."""
    group_cols = list(group_cols)
    qv = F.round(F.col(value_col).cast("double") * F.lit(int(y_scale)), 0).cast(
        "long"
    )
    is_a = F.col(side_col).cast("boolean")
    per_v = (
        df.select(*group_cols, qv.alias("_v"), is_a.alias("_a"))
        .groupBy(*group_cols, "_v")
        .agg(
            F.sum(F.col("_a").cast("long")).alias("_ca"),
            F.sum((~F.col("_a")).cast("long")).alias("_cb"),
        )
    )
    w_ord = (
        Window.partitionBy(*group_cols)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    staged = per_v.select(
        *group_cols,
        F.sum("_ca").over(w_ord).alias("_cuma"),
        F.sum("_cb").over(w_ord).alias("_cumb"),
        F.sum("_ca").over(w_all).alias("_na"),
        F.sum("_cb").over(w_all).alias("_nb"),
    )
    d2 = F.abs(F.col("_cuma") * F.col("_nb") - F.col("_cumb") * F.col("_na"))
    g = staged.groupBy(*group_cols).agg(
        F.max(d2).alias("_d2"),
        F.max("_na").alias("n_a"),
        F.max("_nb").alias("n_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    d = F.col("_d2").cast("double") / (na * nb)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0)
    return g.select(
        *group_cols,
        "n_a",
        "n_b",
        F.when(ok, F.round(d, out_dp)).alias("ks_d"),
        F.when(ok, F.round(d * F.sqrt(na * nb / (na + nb)), out_dp)).alias(
            "ks_lambda"
        ),
    )
