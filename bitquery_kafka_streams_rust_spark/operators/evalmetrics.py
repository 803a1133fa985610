"""Classifier-gate evaluation: exact rank AUC and calibration bins.

A curation pipeline that thresholds on a quality-classifier score
(``functions/text.py classifier_score`` — the FineWeb-Edu / DCLM gate)
needs to EVALUATE that gate before trusting it: ranking quality (AUC)
and probability calibration (reliability bins + ECE).  Both are
classic one-or-two-pass shapes that survive 100 TB:

- ``binary_auc``: the Mann-Whitney identity
  ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)`` where R_pos is
  the positives' mid-rank sum.  ONE rank window per group (partitioned
  by the group columns, so per-group parallel) + one partial-combined
  aggregate.  All rank arithmetic stays in EXACT integers — mid-ranks
  are tracked doubled (``2*rank_min + ties - 1``) so ties never touch a
  float — and the single division happens once per group from exact
  longs: order-independent, restart-identical, bit-equal in DuckDB.
  At extreme per-group cardinality the window sort is the inherent
  cost of an exact AUC; the scale relief is per-group sampling before
  this operator, not a different algorithm.

- ``calibration_bins``: reliability diagram + per-bin ECE terms from
  ONE map-side-combined aggregate.  Scores arrive 6-dp rounded (the
  classifier contract), so ``round(score * 1e6)`` is an EXACT long —
  per-bin confidence sums are integer arithmetic, order-independent.
  The per-bin state (n, Σlabel, Σqscore) is mergeable, which is what
  makes the streaming twin (``streaming/calibration_monitor.py``)
  bit-identical to the batch aggregate over the same rows.

Reference analog: the per-event scoring gate the reference cuts on
(``src/processors/dex_processor.rs:179-223``) — these operators are the
offline audit of that gate's quality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q_SCALE = 1_000_000  # classifier scores are 6-dp rounded -> exact longs


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
    *,
    out_dp: int = 6,
) -> DataFrame:
    """Exact per-group ROC AUC of ``score_col`` against binary
    ``label_col`` (0/1 ints), ties resolved by mid-ranks (the
    Mann-Whitney convention, so AUC is invariant to row order).

    Output: (*group_cols, n_pos, n_neg, auc).  Groups with no
    positives or no negatives emit NULL auc.  ``auc`` rounds to
    ``out_dp`` after one exact-integer division — DuckDB replays the
    identical arithmetic."""
    group_cols = list(group_cols)
    w_rank = Window.partitionBy(*group_cols).orderBy(F.col(score_col))
    w_ties = Window.partitionBy(*group_cols, F.col(score_col))
    lbl = F.col(label_col).cast("long")
    ranked = df.select(
        *group_cols,
        lbl.alias("_y"),
        # doubled mid-rank: 2*rank_min + ties - 1 (exact integer)
        (
            F.rank().over(w_rank).cast("long") * 2
            + F.count(F.lit(1)).over(w_ties).cast("long")
            - 1
        ).alias("_mr2"),
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.sum("_y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_y")).alias("n_neg"),
        F.sum(F.col("_mr2") * F.col("_y")).alias("_s2"),
    )
    np_, nn = F.col("n_pos"), F.col("n_neg")
    # AUC = (S2 - np*(np+1)) / (2*np*nn), S2 = doubled positive rank sum
    auc = (F.col("_s2") - np_ * (np_ + 1)).cast("double") / (
        (np_ * nn * 2).cast("double")
    )
    return agg.select(
        *group_cols,
        "n_pos",
        "n_neg",
        F.when((np_ > 0) & (nn > 0), F.round(auc, out_dp)).alias("auc"),
    )


def calibration_moments(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Per-(group, bin) mergeable calibration state: (bin, n, Σlabel,
    Σ round(score*1e6)) — pure long sums, ONE map-side-combined
    aggregate, order-independent.  Shared by the batch readout below
    and the streaming monitor (whose keyed state holds exactly these
    three longs per bin)."""
    group_cols = list(group_cols)
    score = F.col(score_col).cast("double")
    bin_ = F.least(
        F.floor(score * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    return (
        df.select(
            *group_cols,
            bin_,
            F.col(label_col).cast("long").alias("_y"),
            F.round(score * F.lit(_Q_SCALE), 0).cast("long").alias("_qs"),
        )
        .groupBy(*group_cols, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("_sy"),
            F.sum("_qs").alias("_sq"),
        )
    )


def calibration_readout(
    m: DataFrame,
    group_cols: Sequence[str] = (),
    *,
    out_dp: int = 6,
) -> DataFrame:
    """Project calibration state to the reliability table: per-bin
    accuracy (label mean), confidence (score mean), |gap|, and the
    bin's ECE term ``n/N * |acc - conf|``.  N comes from a window SUM
    partitioned by the group columns (bins per group are bounded by
    ``n_bins`` — never a data-scale window).  Means round to 9 dp
    before the gap arithmetic and outputs to ``out_dp``, identically
    on both engines."""
    group_cols = list(group_cols)
    w_grp = Window.partitionBy(*group_cols)
    n = F.col("n").cast("double")
    acc9 = F.round(F.col("_sy").cast("double") / n, 9)
    conf9 = F.round(F.col("_sq").cast("double") / F.lit(float(_Q_SCALE)) / n, 9)
    total = F.sum("n").over(w_grp).cast("double")
    gap9 = F.abs(acc9 - conf9)
    return m.select(
        *group_cols,
        "bin",
        "n",
        F.round(acc9, out_dp).alias("acc"),
        F.round(conf9, out_dp).alias("conf"),
        F.round(gap9, out_dp).alias("abs_gap"),
        F.round(n / total * gap9, out_dp).alias("ece_term"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str] = (),
    *,
    n_bins: int = 10,
    out_dp: int = 6,
) -> DataFrame:
    """Reliability diagram + ECE terms per (group, bin); ECE per group
    is the sum of ``ece_term`` over its bins."""
    return calibration_readout(
        calibration_moments(df, score_col, label_col, group_cols, n_bins=n_bins),
        group_cols,
        out_dp=out_dp,
    )


def zscore_normalize(
    df: DataFrame,
    score_col: str,
    group_cols: Sequence[str],
    *,
    q_scale: int = 1_000_000,
    out_dp: int = 6,
) -> DataFrame:
    """Per-group z-score normalization of a score column — the
    cross-source calibration step before a single global threshold
    cuts a corpus whose sources have different score distributions
    (a raw 0.6 from a verbose source ≠ 0.6 from a terse one).

    Exactness: scores are 6-dp rounded (the classifier contract), so
    round(score·q_scale) longs make the per-group (n, Σq, Σq²) moments
    exact and order-independent (the ab_test doctrine); mean/std round
    to 9 dp before the per-row readout, which broadcasts the
    group-cardinality stats back and runs one identical IEEE sequence
    per row.  Groups with < 2 rows or zero variance emit NULL z.

    Output: input group/score columns + (z)."""
    group_cols = list(group_cols)
    q = F.round(F.col(score_col).cast("double") * F.lit(int(q_scale)), 0).cast(
        "long"
    )
    m = (
        df.select(*group_cols, q.alias("_q"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_q").alias("_s"),
            F.sum(F.col("_q") * F.col("_q")).alias("_ss"),
        )
    )
    n = F.col("_n").cast("double")
    s, ss = F.col("_s").cast("double"), F.col("_ss").cast("double")
    scale = F.lit(float(q_scale))
    mean9 = F.round(s / scale / n, 9)
    var9 = F.round(
        (ss / (scale * scale) - (s / scale) * (s / scale) / n) / (n - 1), 9
    )
    stats = m.select(
        *group_cols,
        "_n",
        mean9.alias("_mean9"),
        F.when((F.col("_n") > 1) & (var9 > 0), F.sqrt(var9)).alias("_std9"),
    )
    joined = df.join(F.broadcast(stats), group_cols)
    return joined.select(
        *df.columns,
        F.when(
            F.col("_std9").isNotNull(),
            F.round((F.col(score_col) - F.col("_mean9")) / F.col("_std9"), out_dp),
        ).alias("z"),
    )


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: Sequence[str],
    *,
    id_col: str = "doc_id",
    n_tiles: int = 10,
    out_dp: int = 6,
) -> DataFrame:
    """Cumulative gains / lift table per group — the business-facing
    companion to AUC: sort by score, cut into ``n_tiles`` equal
    tiles, and report how much of the positive mass each score band
    captures ("the top decile holds 4× its share of keepers" is what
    justifies a threshold to a human).

    Determinism/exactness: the tile assignment is ``ntile`` over a
    fully-ordered (score DESC, id ASC) group window — identical
    remainder-to-early-tiles semantics on Spark and DuckDB; every
    count is an exact long; cum_recall and lift are single divisions
    of integer cross-products, rounded at the end.

    Output: (*group_cols, tile, n, n_pos, cum_pos, cum_recall, lift);
    lift is NULL for groups with no positives."""
    group_cols = list(group_cols)
    w_ord = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    tiled = df.select(
        *group_cols,
        F.col(label_col).cast("long").alias("_y"),
        F.ntile(int(n_tiles)).over(w_ord).alias("tile"),
    )
    g = tiled.groupBy(*group_cols, "tile").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_y").alias("n_pos")
    )
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy("tile")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*group_cols)
    cum = F.sum("n_pos").over(w_cum)
    tot_pos = F.sum("n_pos").over(w_all)
    tot_n = F.sum("n").over(w_all)
    return g.select(
        *group_cols,
        "tile",
        "n",
        "n_pos",
        cum.alias("cum_pos"),
        F.when(
            tot_pos > 0,
            F.round(cum.cast("double") / tot_pos.cast("double"), out_dp),
        ).alias("cum_recall"),
        F.when(
            tot_pos > 0,
            F.round(
                (F.col("n_pos") * tot_n).cast("double")
                / (F.col("n") * tot_pos).cast("double"),
                out_dp,
            ),
        ).alias("lift"),
    )
