"""Aggregations — the reference's counters/rollups as declarative aggs.

A1 running counters (``src/processors/dex_processor.rs:91-117``),
A2 threshold alerting (``:156-164``), A4 histogram percentiles
(``src/observability/metrics.rs:26-34,109-124``), A5 per-key business
rollups + market share (``:62-107``), A6 rate windows
(``examples/high_volume_processor.rs:171-189``).

All are single-shuffle hash aggregations with map-side partial
aggregation (Catalyst plans partial_+final HashAggregate automatically);
market share adds one tiny second stage over the already-aggregated
rows.  ``approx_count_distinct`` / ``percentile_approx`` are the sketch
(HLL / KLL-ish) variants for the 100 TB path; the exact forms are used
where a DuckDB oracle must match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def conditional_count(cond: Column) -> Column:
    """count-if — the atomic-counter pattern A1."""
    return F.sum(F.when(cond, 1).otherwise(0))


def global_counters(df: DataFrame, tiers: dict[str, Column]) -> DataFrame:
    """A1: one row of named conditional counters + total."""
    aggs = [F.count("*").alias("total")] + [
        conditional_count(c).alias(name) for name, c in tiers.items()
    ]
    return df.agg(*aggs)


def threshold_alerts(df: DataFrame, value_col: str, thresholds: dict[str, float]) -> DataFrame:
    """A2: rows exceeding alert thresholds, tagged by tier (whale >1M,
    big >100k in the reference)."""
    tier = None
    for name, t in sorted(thresholds.items(), key=lambda kv: -kv[1]):
        branch = F.when(F.col(value_col) > t, name)
        tier = branch if tier is None else tier.when(F.col(value_col) > t, name)
    lo = min(thresholds.values())
    return df.where(F.col(value_col) > lo).withColumn("alert_tier", tier)


def percentile_summary(
    df: DataFrame, value_col: str, by: Sequence[str] = (), approx: bool = False
) -> DataFrame:
    """A4: p50/p90/p95/p99 + max/avg/count.  ``approx=True`` uses the
    mergeable sketch (single-pass at scale); exact form for oracles."""
    pct = F.percentile_approx if approx else F.percentile
    qs = [0.5, 0.9, 0.95, 0.99]
    v = F.col(value_col)
    aggs = [
        F.count("*").alias("n"),
        F.round(F.avg(v), 6).alias("avg"),
        F.max(v).alias("max"),
    ] + [F.round(pct(v, q), 6).alias(f"p{int(q * 100)}") for q in qs]
    g = df.groupBy(*by) if by else df.groupBy()
    return g.agg(*aggs)


def rollup_with_share(
    df: DataFrame,
    key: str,
    value_col: str,
    user_col: str | None = None,
    approx_users: bool = False,
) -> DataFrame:
    """A5: per-key count/volume/avg + market share (share of total
    volume) + distinct users.

    Share = global-window sum over the AGGREGATED frame: the window's
    input is |keys| rows (the per-key aggregate), never the corpus —
    the one extra exchange carries metadata-scale data, and the base
    table is scanned exactly ONCE.  The alternatives both cost more at
    scale: a scalar-total broadcast join re-executes the aggregation
    from the scan (2 full passes — Catalyst constant-folds a literal
    join key into a cross join and cannot reuse the uncached subplan),
    and a driver-side collect of the total is the same double scan.
    audit_plans.py allowlists exactly this window-over-aggregate shape
    (GLOBAL_WINDOW_OK) while still failing corpus-input windows."""
    from pyspark.sql import Window

    aggs = [
        F.count("*").alias("n"),
        F.round(F.sum(value_col), 4).alias("volume"),
        F.round(F.avg(value_col), 6).alias("avg_value"),
    ]
    if user_col:
        aggs.append(
            (F.approx_count_distinct(user_col) if approx_users else F.countDistinct(user_col)).alias(
                "unique_users"
            )
        )
    agg = df.groupBy(key).agg(*aggs)
    total = F.sum("volume").over(Window.partitionBy())
    return agg.withColumn("market_share", F.round(F.col("volume") / total, 6))


def rate_per_window(df: DataFrame, ts_col: str, window_s: int, by: Sequence[str] = ()) -> DataFrame:
    """A6: events/sec per tumbling window (reference: delta/10 s monitor)."""
    cols = [F.window(F.col(ts_col), f"{window_s} seconds").alias("win"), *[F.col(c) for c in by]]
    return (
        df.groupBy(*cols)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            *by,
            "n",
            F.round(F.col("n") / window_s, 6).alias("rate_per_s"),
        )
    )


def windowed_stats(
    df: DataFrame,
    ts_col: str,
    window: str,
    slide: str | None = None,
    by: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """A3/T5: tumbling (or sliding, if ``slide``) window stats — the
    idiomatic replacement for the reference's every-10th-event print."""
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    aggs = [F.count("*").alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("total"))
    return (
        df.groupBy(win.alias("win"), *[F.col(c) for c in by])
        .agg(*aggs)
        .select(F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), *by,
                *[F.col(a) for a in (["n", "total"] if value_col else ["n"])])
    )


def profile_table(df: DataFrame, cols: Sequence[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """Per-column data-quality profile in ONE aggregate pass: non-null
    count, distinct count, min, max (stringified for a uniform schema),
    one output row per column.

    The whole profile is a single partial-aggregated scan regardless of
    column count (every per-column aggregate lands in the same agg node
    → one shuffle of one row per partition).  ``exact_distinct=False``
    swaps count_distinct for approx_count_distinct (HLL sketch,
    mergeable) — the 100 TB setting where exact distinct's per-column
    expand would be the cost."""
    cols = list(cols or df.columns)
    distinct_fn = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            distinct_fn(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__nd`, `{c}__mn`, `{c}__mx`" for c in cols
    )
    return one.select(
        F.col("_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nonnull, n_distinct, min_s, max_s)"
        ),
    ).select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")


def rollup_cascade(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    by: Sequence[str] = (),
    levels: Sequence[int] = (60, 3600, 86400),
) -> DataFrame:
    """Multi-resolution time rollup where each coarser level RE-AGGREGATES
    the next finer level's partials instead of rescanning the input —
    the hypertable/continuous-aggregate maintenance pattern (the
    reference keeps only flat per-key counters,
    ``src/processors/dex_processor.rs:91-117``; a 100 TB store needs
    the cascade).

    count/sum/min/max are re-aggregable (sum of partial sums == direct
    sum up to float association), so level k+1 reads level k's few
    thousand rows: ONE full-data shuffle total (the finest grain); every
    later Exchange is over geometrically shrinking aggregate rows.
    Returns the union of all levels tagged with ``resolution_s``;
    ``bucket_start`` is epoch seconds (BIGINT — timestamp columns do not
    survive the oracle's NaT-unfriendly value compare)."""
    if not levels or any(b <= a for a, b in zip(levels, levels[1:])):
        raise ValueError("levels must be ascending and non-empty")
    keys = list(by)
    epoch = F.unix_timestamp(F.col(ts_col))  # NTZ-safe integer seconds
    finest = levels[0]
    cur = (
        df.groupBy(
            ((epoch / finest).cast("long") * finest).alias("bucket_start"), *keys
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("_sum"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    return rollup_cascade_from_partials(cur, by=keys, levels=levels)


def rollup_cascade_from_partials(
    partials: DataFrame,
    by: Sequence[str] = (),
    levels: Sequence[int] = (60, 3600, 86400),
) -> DataFrame:
    """The cascade's re-aggregation half, entered from ALREADY-BUILT
    finest-grain partials — rows of (bucket_start, *by, n_events, _sum,
    min_value, max_value) at ``levels[0]`` resolution, e.g. the parquet
    output of ``streaming.rollup.minute_partials_stream``.  This is how
    the continuous aggregate is maintained at 100 TB: the stream keeps
    the finest grain incrementally; coarser resolutions are derived
    from partials on demand and NEVER rescan raw data."""
    if not levels or any(b <= a for a, b in zip(levels, levels[1:])):
        raise ValueError("levels must be ascending and non-empty")
    keys = list(by)
    cur = partials
    out = []
    for res, nxt in zip(levels, list(levels[1:]) + [None]):
        out.append(
            cur.select(
                F.lit(res).cast("long").alias("resolution_s"),
                "bucket_start",
                *keys,
                "n_events",
                F.round("_sum", 3).alias("sum_value"),
                "min_value",
                "max_value",
            )
        )
        if nxt is not None:
            cur = (
                cur.groupBy(
                    ((F.col("bucket_start") / nxt).cast("long") * nxt).alias(
                        "bucket_start"
                    ),
                    *keys,
                )
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("_sum").alias("_sum"),
                    F.min("min_value").alias("min_value"),
                    F.max("max_value").alias("max_value"),
                )
            )
    res_df = out[0]
    for o in out[1:]:
        res_df = res_df.unionByName(o)
    return res_df


def ab_test(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    frac_a: float = 0.5,
    seed: int = 0,
    stage: int = 11,
) -> DataFrame:
    """Two-sample experiment readout with deterministic assignment.

    Units are assigned to variant A iff ``hash_frac(id, seed, stage) <
    frac_a`` (sampling.py's portable Knuth hash; stage 11 is the
    experiment-assignment slot in the XOR salt registry, so an A/B
    readout composed over already-sampled/split data stays independent
    of every earlier gate).  Per ``group_cols`` cell emits counts,
    means, the mean lift A-B, and the Welch z statistic — the
    threshold-alert shape of ``src/processors/dex_processor.rs:156-164``
    upgraded to a variance-aware test.

    Cross-engine float parity: means and variances are computed from
    raw (sum, sumsq, n) moments then rounded to 9 dp BEFORE the z
    arithmetic, and z/lift round to 6 dp — both engines run the same
    IEEE op sequence on identical rounded inputs.  Cells where either
    arm has < 2 observations emit NULL z (variance undefined).

    Plan shape: ONE map-side-combined hash aggregation — assignment is
    a map-side expression over the id, the six moments are
    partial-aggregable, so a 100 TB fact table collapses to one row
    per (group, partition) before the exchange; no window, no join."""
    from bitquery_kafka_streams_rust_spark.operators.sampling import hash_frac

    is_a = hash_frac(F.col(id_col), seed, stage) < F.lit(frac_a)
    v = F.col(value_col).cast("double")
    agg = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.when(is_a, 1)).alias("n_a"),
        F.count(F.when(~is_a, 1)).alias("n_b"),
        F.sum(F.when(is_a, v)).alias("_s_a"),
        F.sum(F.when(~is_a, v)).alias("_s_b"),
        F.sum(F.when(is_a, v * v)).alias("_ss_a"),
        F.sum(F.when(~is_a, v * v)).alias("_ss_b"),
    )
    return _ab_select(agg, group_cols)


def _ab_select(agg: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Mean/var/lift/Welch-z projection over a moments frame with
    columns (n_a, n_b, _s_a, _s_b, _ss_a, _ss_b) — shared by the
    oracle-exact batch readout and the streaming monitor's
    integer-grid state (streaming/experiment_monitor.py), so both
    paths run the identical rounded IEEE sequence."""
    mean_a = F.round(F.col("_s_a") / F.col("n_a"), 9)
    mean_b = F.round(F.col("_s_b") / F.col("n_b"), 9)
    var_a = F.round(
        (F.col("_ss_a") - F.col("_s_a") * F.col("_s_a") / F.col("n_a"))
        / (F.col("n_a") - 1),
        9,
    )
    var_b = F.round(
        (F.col("_ss_b") - F.col("_s_b") * F.col("_s_b") / F.col("n_b"))
        / (F.col("n_b") - 1),
        9,
    )
    ok = (F.col("n_a") > 1) & (F.col("n_b") > 1)
    z = F.round(
        (mean_a - mean_b)
        / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
        6,
    )
    return agg.select(
        *group_cols,
        "n_a",
        "n_b",
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.when(ok, F.round(mean_a - mean_b, 6)).alias("lift"),
        F.when(ok, z).alias("z_welch"),
    )


def ab_moments(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    frac_a: float = 0.5,
    seed: int = 0,
    stage: int = 11,
    scale: int = 1_000_000,
) -> DataFrame:
    """Order-independent experiment moments on an integer grid.

    Same stage-11 assignment as ``ab_test`` but values quantize
    map-side to ``round(value * scale)`` longs, so the per-(group, arm)
    (n, s_q, ss_q) sums are EXACT integer arithmetic — any summation
    order (batch, micro-batch increments, restart replay) produces
    bit-identical state.  This is the drift-monitor doctrine
    (operators/drift.py): quantize first, then the running aggregate
    IS the batch aggregate.  ss_q headroom: |value| * scale must stay
    under ~3e9 so the squared term fits a long.

    Output: one row per (group, arm) — the shape a streaming
    complete-mode groupBy keeps as metadata-sized state."""
    from bitquery_kafka_streams_rust_spark.operators.sampling import hash_frac

    is_a = hash_frac(F.col(id_col), seed, stage) < F.lit(frac_a)
    q = F.round(F.col(value_col).cast("double") * F.lit(scale), 0).cast("long")
    return (
        df.select(
            *group_cols,
            F.when(is_a, F.lit("A")).otherwise(F.lit("B")).alias("arm"),
            q.alias("_q"),
        )
        .groupBy(*group_cols, "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("_q").alias("s_q"),
            F.sum(F.col("_q") * F.col("_q")).alias("ss_q"),
        )
    )


def ab_readout(
    moments: DataFrame,
    group_cols: Sequence[str] = (),
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Welch-z readout from an ``ab_moments`` frame: pivot the two arm
    rows back to columns, rescale the integer moments to value units
    (s_q/scale, ss_q/scale²), then run the SAME rounded projection as
    ``ab_test``.  Input is metadata-sized (2 rows per cell), so every
    epoch's readout in the streaming monitor costs nothing."""
    s = float(scale)
    arm_a = F.col("arm") == "A"
    agg = moments.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.coalesce(F.sum(F.when(arm_a, F.col("n"))), F.lit(0)).alias("n_a"),
        F.coalesce(F.sum(F.when(~arm_a, F.col("n"))), F.lit(0)).alias("n_b"),
        (F.sum(F.when(arm_a, F.col("s_q"))).cast("double") / F.lit(s)).alias("_s_a"),
        (F.sum(F.when(~arm_a, F.col("s_q"))).cast("double") / F.lit(s)).alias("_s_b"),
        (F.sum(F.when(arm_a, F.col("ss_q"))).cast("double") / F.lit(s * s)).alias("_ss_a"),
        (F.sum(F.when(~arm_a, F.col("ss_q"))).cast("double") / F.lit(s * s)).alias("_ss_b"),
    )
    return _ab_select(agg, group_cols)


# -- distribution audits: concentration (HHI/entropy) and Benford ------------

_BENFORD_EXP9 = [
    0.301029996, 0.176091259, 0.124938737, 0.096910013, 0.079181246,
    0.06694679, 0.057991947, 0.051152522, 0.045757491,
]  # round(log10(1 + 1/d), 9) for d = 1..9 — fixed literals on BOTH engines


def concentration(
    df: DataFrame,
    item_col: str,
    group_cols: Sequence[str] = (),
    *,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group concentration of ``item_col``: Herfindahl-Hirschman
    index and normalized Shannon entropy — the "is one key dominating
    this slice" audit (hot-user detection, domain-mix skew, dedup-
    cluster lopsidedness).

    Float-parity doctrine: item counts are exact longs, so
    HHI = Σc²/N² is ONE division from exact integers.  Entropy uses
    H = ln(N) − (Σ c·ln(c))/N with each term quantized map-side:
    round(c · round(ln(c), 9) · 1e6) is an exact long (the lm_score
    round-the-libm-call convention + the ab_test integer-grid sum), so
    the cross-item sum is order-independent.  Overflow contract: Σc²
    needs n·c_max² < 2^63 — at c_max = 1e6 that is 9e6 items per
    group; quantized entropy terms are < 1e11 each.

    Scale shape: one (group, item) exchange with map-side combine,
    then one group-level partial-combined aggregate.  Output:
    (*group_cols, n_items, n_rows, hhi, entropy, entropy_norm)."""
    group_cols = list(group_cols)
    c = (
        df.groupBy(*group_cols, F.col(item_col).alias("_item"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    t = F.round(
        F.col("_c").cast("double") * F.round(F.log(F.col("_c").cast("double")), 9)
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    g = c.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("_c").alias("n_rows"),
        F.sum(F.col("_c") * F.col("_c")).alias("_sc2"),
        F.sum(t).alias("_st"),
    )
    n = F.col("n_rows").cast("double")
    ent = F.round(F.log(n), 9) - F.col("_st").cast("double") / F.lit(1e6) / n
    ln_items = F.round(F.log(F.col("n_items").cast("double")), 9)
    return g.select(
        *group_cols,
        "n_items",
        "n_rows",
        F.round(F.col("_sc2").cast("double") / (n * n), out_dp).alias("hhi"),
        F.round(ent, out_dp).alias("entropy"),
        F.when(F.col("n_items") > 1, F.round(ent / ln_items, out_dp)).alias(
            "entropy_norm"
        ),
    )


def benford_digits(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    *,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group first-significant-digit distribution vs Benford's law
    — the classic fabricated/synthetic-data smell test for value
    columns.  One row per (group, digit 1..9) with observed share,
    expected share (9-dp literals, identical on both engines), and
    absolute deviation.

    Portability: the digit comes from the DECIMAL STRING of the exact
    long round(|v|·1e6) — integer-to-string is identical everywhere,
    where floor(log10(v)) arithmetic can straddle a ulp at powers of
    ten.  Zero values drop (no leading digit).  One narrow (group,
    digit) aggregate; the per-group total is a window over ≤ 9 rows."""
    group_cols = list(group_cols)
    q = F.round(F.abs(F.col(value_col).cast("double")) * F.lit(1e6), 0).cast("long")
    digit = F.substring(q.cast("string"), 1, 1).cast("int")
    d = (
        df.select(*group_cols, q.alias("_q"), digit.alias("digit"))
        .where(F.col("_q") > 0)
        .groupBy(*group_cols, "digit")
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    w_grp = Window.partitionBy(*group_cols)
    total = F.sum("n_d").over(w_grp).cast("double")
    exp9 = F.element_at(
        F.array(*[F.lit(v) for v in _BENFORD_EXP9]), F.col("digit")
    )
    obs = F.round(F.col("n_d").cast("double") / total, 9)
    return d.select(
        *group_cols,
        "digit",
        "n_d",
        F.round(obs, out_dp).alias("obs_share"),
        F.round(exp9, out_dp).alias("exp_share"),
        F.round(F.abs(obs - exp9), out_dp).alias("abs_dev"),
    )
