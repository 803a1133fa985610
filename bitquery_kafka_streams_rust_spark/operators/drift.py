"""Token-distribution drift between corpus snapshots.

Training-data monitoring: when a new crawl/snapshot lands, compare its
token unigram distribution against the previous one — per-token count
deltas and smoothed log-likelihood ratios, plus corpus-level KL /
total-variation summaries.  Catches tokenizer regressions, source-mix
shifts and contamination bursts before a model trains on them.

Plan shape: each side is one map-side explode + partial-combined count
(token ids cross the shuffle, never token arrays — repo invariant);
the comparison is a full-outer equi-join on the token id whose size is
bounded by VOCAB (≤ |tokenizer|, ~50k), independent of corpus scale.
Totals are collected driver-side (2 metadata scalars) and inlined as
literals — the scalar-subquery form would constant-fold back into a
BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_histogram(seq: DataFrame, *, token_col: str = "tokens") -> DataFrame:
    """(token, n) corpus unigram counts — map-side explode, hash
    aggregate with partial combine (hot tokens cannot skew the
    reduce)."""
    return (
        seq.select(F.explode(token_col).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


def token_drift(
    old_seq: DataFrame,
    new_seq: DataFrame,
    *,
    alpha: float = 0.5,
    vocab: int = 50257,
    token_col: str = "tokens",
) -> DataFrame:
    """Per-token drift table over the UNION vocabulary: counts on each
    side and the add-α-smoothed log-likelihood ratio
    ``ln(p_new/p_old)`` (positive = token became more common).
    ``p = (n + α) / (N + α·V)`` keeps one-sided tokens finite.  Output
    is vocab-bounded regardless of corpus size; deterministic ordered
    by token id."""
    ho = token_histogram(old_seq, token_col=token_col)
    hn = token_histogram(new_seq, token_col=token_col)
    n_old_total = ho.agg(F.sum("n")).collect()[0][0] or 0
    n_new_total = hn.agg(F.sum("n")).collect()[0][0] or 0
    j = ho.withColumnRenamed("n", "n_old").join(
        hn.withColumnRenamed("n", "n_new"), "token", "full_outer"
    )
    a = float(alpha)
    p_old = (F.coalesce(F.col("n_old"), F.lit(0)) + a) / F.lit(
        n_old_total + a * vocab
    )
    p_new = (F.coalesce(F.col("n_new"), F.lit(0)) + a) / F.lit(
        n_new_total + a * vocab
    )
    return (
        j.select(
            "token",
            F.coalesce(F.col("n_old"), F.lit(0)).cast("long").alias("n_old"),
            F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias("n_new"),
            F.round(F.log(p_new / p_old), 6).alias("log_ratio"),
        )
        .orderBy("token")
    )


def drift_summary(
    old_seq: DataFrame,
    new_seq: DataFrame,
    *,
    alpha: float = 0.5,
    vocab: int = 50257,
    token_col: str = "tokens",
) -> DataFrame:
    """One-row corpus-level drift: ``kl`` = KL(new‖old) over the
    smoothed union-vocab distributions restricted to observed tokens,
    ``tvd`` = total variation distance on the same support, plus
    support sizes.  A vocab-bounded aggregate over the drift table."""
    ho = token_histogram(old_seq, token_col=token_col)
    hn = token_histogram(new_seq, token_col=token_col)
    n_old_total = ho.agg(F.sum("n")).collect()[0][0] or 0
    n_new_total = hn.agg(F.sum("n")).collect()[0][0] or 0
    j = ho.withColumnRenamed("n", "n_old").join(
        hn.withColumnRenamed("n", "n_new"), "token", "full_outer"
    )
    a = float(alpha)
    p_old = (F.coalesce(F.col("n_old"), F.lit(0)) + a) / F.lit(
        n_old_total + a * vocab
    )
    p_new = (F.coalesce(F.col("n_new"), F.lit(0)) + a) / F.lit(
        n_new_total + a * vocab
    )
    return j.agg(
        F.round(F.sum(p_new * F.log(p_new / p_old)), 8).alias("kl"),
        F.round(F.sum(F.abs(p_new - p_old)) / 2, 8).alias("tvd"),
        F.sum(F.col("n_old").isNotNull().cast("long")).alias("vocab_old"),
        F.sum(F.col("n_new").isNotNull().cast("long")).alias("vocab_new"),
    )
