"""Privacy risk audit: k-anonymity / l-diversity over quasi-identifiers.

A training-data pipeline that scrubs direct identifiers
(``functions/text.pii_scrub``) still leaks through QUASI-identifiers:
combinations of innocuous columns (language × source × length band)
whose equivalence classes are small enough to re-identify a record.
The standard audit is k-anonymity (every class ≥ k rows) and
l-diversity (every class carries ≥ l distinct sensitive values, so
membership doesn't reveal the sensitive attribute).

Shape at 100 TB: ONE partial-combined aggregate over the quasi columns
— class counts and the exact distinct-sensitive count collapse
map-side; class cardinality is bounded by the quasi domain, not the
row count.  The exact countDistinct is oracle-parity; swap
approx_count_distinct at extreme class counts (the HLL sketch in
``sketches.py`` is the mergeable path).  The audit emits one row per
equivalence class plus at_risk flags; suppression/generalization is
the caller's next stage (filter on the flag, or coarsen a quasi
column and re-audit).

Reference analog: the reference has no privacy stage — this extends
its filter/gate family (``src/filters.rs``) with the audit a public
corpus release requires.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    *,
    k: int = 5,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One row per quasi-identifier equivalence class:
    (*quasi_cols, class_n, at_risk_k [, l_div, at_risk_l]).

    ``at_risk_k``: class has fewer than ``k`` rows (re-identification
    risk).  With ``sensitive_col``: ``l_div`` is the class's distinct
    sensitive-value count and ``at_risk_l`` flags classes below ``l``
    (attribute-disclosure risk)."""
    aggs = [F.count(F.lit(1)).alias("class_n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("l_div"))
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = out.withColumn("at_risk_k", F.col("class_n") < F.lit(int(k)))
    if sensitive_col is not None:
        out = out.withColumn("at_risk_l", F.col("l_div") < F.lit(int(l)))
    return out


def anonymity_summary(
    classes: DataFrame,
    *,
    out_dp: int = 6,
) -> DataFrame:
    """Corpus-level readout of a ``k_anonymity`` class table: the
    minimum class size (the corpus's effective k), how many classes /
    rows sit at risk, and the at-risk row share.  Input is already
    class-cardinality metadata — ONE tiny aggregate."""
    has_l = "at_risk_l" in classes.columns
    aggs = [
        F.min("class_n").alias("k_effective"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_n").alias("n_rows"),
        F.sum(F.when(F.col("at_risk_k"), F.col("class_n")).otherwise(0)).alias(
            "rows_at_risk_k"
        ),
    ]
    if has_l:
        aggs.append(
            F.sum(F.when(F.col("at_risk_l"), F.col("class_n")).otherwise(0)).alias(
                "rows_at_risk_l"
            )
        )
    out = classes.agg(*aggs)
    return out.withColumn(
        "risk_share_k",
        F.round(
            F.col("rows_at_risk_k").cast("double") / F.col("n_rows").cast("double"),
            out_dp,
        ),
    )
