"""Association-rule mining — pairwise support / confidence / lift.

Market-basket analysis over per-subject item sets ("users who trigger
`error` also trigger `purchase`?"): the co-occurrence summary that
complements the TEMPORAL views (transition matrix, funnel, CEP) with
an order-free one.

Scale decomposition (the classic a-priori first level):

- baskets are the DISTINCT (subject, item) pairs — one partial-
  combined aggregate kills per-subject repetition before anything
  quadratic;
- pair candidates come from a self-equi-join ON THE SUBJECT KEY with
  ``item_a < item_b`` — the quadratic is confined to each basket,
  and ``max_basket_size`` drops degenerate baskets from candidate
  generation (the fuzzy-blocking / DF-cap convention: a documented
  recall trade that bounds the worst basket at the cap²);
- counts are exact longs; support/confidence/lift are single divisions
  from exact integers (basket total N is a driver-side metadata
  scalar inlined as a literal — no scalar-subquery BNLJ), rounded
  identically on both engines.

Output is one row per ORDERED rule (a→b and b→a both emitted: same
support/lift, different confidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pair_rules(
    df: DataFrame,
    subject_col: str,
    item_col: str,
    *,
    min_pair_n: int = 1,
    max_basket_size: int | None = 1000,
    out_dp: int = 6,
) -> DataFrame:
    """Pairwise association rules over per-subject item baskets.

    Output: (antecedent, consequent, n_pair, support, confidence,
    lift) — support = P(a,b), confidence = P(b|a), lift =
    P(a,b)/(P(a)P(b)); all from exact integer counts.

    All probabilities are over the CAPPED basket population: a basket
    dropped by ``max_basket_size`` contributes to neither pair counts
    nor the N denominator (the self-consistent reading; the contract
    oracle's item domain is far below the cap, so it never binds
    there)."""
    baskets = df.select(
        F.col(subject_col).alias("s"), F.col(item_col).alias("i")
    ).distinct()
    if max_basket_size is not None:
        ok = (
            baskets.groupBy("s")
            .agg(F.count(F.lit(1)).alias("_bs"))
            .where(F.col("_bs") <= int(max_basket_size))
            .select("s")
        )
        baskets = baskets.join(ok, "s", "left_semi")
    n_subjects = baskets.select("s").distinct().count()  # metadata scalar
    item_n = baskets.groupBy("i").agg(F.count(F.lit(1)).alias("n_item"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.i") < F.col("b.i")))
        .groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= int(min_pair_n))
    )
    directed = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"), "n_pair"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"), F.col("ia").alias("consequent"), "n_pair"
        )
    )
    # item counts are item-domain-bounded — broadcast both enrichments
    enriched = (
        directed.join(
            F.broadcast(item_n.withColumnRenamed("i", "antecedent")
                        .withColumnRenamed("n_item", "n_ante")),
            "antecedent",
        )
        .join(
            F.broadcast(item_n.withColumnRenamed("i", "consequent")
                        .withColumnRenamed("n_item", "n_cons")),
            "consequent",
        )
    )
    np_ = F.col("n_pair").cast("double")
    return enriched.select(
        "antecedent",
        "consequent",
        "n_pair",
        F.round(np_ / F.lit(float(n_subjects)), out_dp).alias("support"),
        F.round(np_ / F.col("n_ante").cast("double"), out_dp).alias("confidence"),
        F.round(
            np_ * F.lit(float(n_subjects))
            / (F.col("n_ante").cast("double") * F.col("n_cons").cast("double")),
            out_dp,
        ).alias("lift"),
    )
