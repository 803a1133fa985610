"""Lexical retrieval scoring — BM25 top-k over the document corpus.

The retrieval-side twin of the embedding ANN family
(operators/similarity.py): score every document against a small query
term set with Okapi BM25 and keep the top-k.  A training-data pipeline
uses this for targeted corpus slicing ("pull the docs about X"),
retrieval-based decontamination review, and as the lexical baseline
next to embedding search.  Reference analog: the filter+score+select
shape of ``src/processors/dex_processor.rs:179-223``, generalized to
ranked retrieval.

Scale shape: term frequencies and doc length are MAP-SIDE per-row
array expressions (the text never crosses a shuffle); the corpus
statistics BM25 needs (N, avgdl, per-term document frequencies) come
from ONE partial-aggregated pass, collected driver-side (a handful of
scalars) and inlined as literals — the repo's aggregate-then-inline
convention (a scalar-subquery formulation would constant-fold into the
BroadcastNestedLoopJoin the plan audit bans).  The final top-k is
``orderBy().limit(k)`` → TakeOrderedAndProject (per-partition bounded
heaps, no global sort).

Cross-engine float parity: doc-length sums are integers (exact in
double), so N/avgdl/df are bit-identical on both engines without
rounding; the only libm call is the IDF log, computed ONCE driver-side
and rounded to 9 decimals (the oracle rounds its SQL-side ln the same
way); the per-doc saturation fraction is a fixed sequence of IEEE
ops on identical inputs; the final score rounds to 6.
"""

from __future__ import annotations

import functools
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _words(text: Column) -> Column:
    # the classifier/BM25 shared tokenizer — one definition, one DuckDB
    # twin (see functions/text.whitespace_words)
    from bitquery_kafka_streams_rust_spark.functions.text import whitespace_words

    return whitespace_words(text)


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents by BM25 score against ``terms``
    (lowercased whole-word matches), ties broken by ascending id.
    Output: (id_col, dl, score) with score rounded to 6 decimals.

    score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t)   = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)   (Robertson/Lucene form)
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    terms = [t.lower() for t in terms]
    w = _words(F.col(text_col))

    def _tf(term: str) -> Column:
        # bind via closure, NOT a default arg: HOF lambdas dispatch on
        # declared arity, and `lambda x, t=t` reads as the two-arg
        # (element, index) form — t would silently become the index
        return F.size(F.filter(w, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"_tf{i}") for i, t in enumerate(terms)]
    per_doc = docs.select(F.col(id_col), F.size(w).alias("dl"), *tf_cols)
    # ONE metadata pass: N, Σdl (ints — exact in double on both engines),
    # df per term; collected and inlined as literals
    aggs = [F.count("*").alias("n"), F.sum("dl").alias("sum_dl")] + [
        F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
        for i in range(len(terms))
    ]
    m = per_doc.agg(*aggs).collect()[0]
    n_docs = m["n"]
    if not n_docs:
        # empty corpus: every df/sum is NULL — short-circuit to an
        # empty frame with the output schema instead of feeding None
        # into the IDF arithmetic
        return per_doc.select(
            id_col, "dl", F.lit(0.0).alias("score")
        ).where(F.lit(False))
    avgdl = float(m["sum_dl"]) / n_docs
    score: Column = F.lit(0.0)
    for i in range(len(terms)):
        df_t = m[f"_df{i}"]
        idf = round(math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0), 9)
        tf = F.col(f"_tf{i}").cast("double")
        sat = (tf * (k1 + 1.0)) / (
            tf + F.lit(k1) * (1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl))
        )
        score = score + F.lit(idf) * sat
    return (
        per_doc.select(id_col, "dl", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def tfidf_topk_terms(
    docs: DataFrame,
    *,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the per-doc inverse of
    ``bm25_topk`` (which scores docs against one query): keyword
    extraction for corpus cards, slice labeling, and topic drift
    tracking.

    Scale shape: words explode map-side into narrow (id, term) rows;
    ONE partial-combined groupBy yields per-doc term frequencies, and
    the document-frequency table re-aggregates those narrow rows by
    term (vocab-bounded — Zipf guarantees the partial combine kills the
    hot grams) and is BROADCAST back.  The per-doc rank is a
    WindowGroupLimit (rank <= k prunes inside the window operator, no
    full sort materialization).

    Float parity: tf/df/N are exact integers; the lone libm call is
    the smoothed idf ``ln((1+N)/(1+df))`` rounded to 9 dp engine-side
    (the lm_score exp-of-rounded convention), and score = tf · idf9
    rounds to 6.  Ranks tie-break by term, so top-k is deterministic.

    Output: (id_col, term, tf, score, rk), rk in 1..k."""
    n_docs = docs.count()  # metadata scalar, inlined as a literal
    terms = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf9 = F.round(
        F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1).cast("double")), 9
    )
    scored = tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        "tf",
        F.round(F.col("tf").cast("double") * idf9, 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return scored.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= int(k)
    )


def dcg_discount_grid(k: int) -> list[int]:
    """DCG rank discounts 1/log2(rank+1) for ranks 1..k, as 9-dp
    integers scaled by 1e9.  Inlined as literals on BOTH engines so the
    discounted sums are INTEGER sums — order-independent and bit-exact
    (a float SUM's accumulation order is engine/partitioning-dependent
    in the last ulp, and Spark's log2 = ln/ln2 vs DuckDB's libm log2
    can differ by 1 ulp; literals remove both hazards)."""
    return [int(round((1.0 / math.log2(r + 1)) * 10**9)) for r in range(1, k + 1)]


def retrieval_eval(
    candidates: DataFrame,
    truth: DataFrame,
    *,
    k: int = 10,
    q_col: str = "q_id",
    id_col: str = "c_id",
) -> DataFrame:
    """Per-query ranking quality of ``candidates`` against ``truth``
    (both: (q_col, id_col, rank) with rank 1-based): recall@k, MRR@k,
    binary-relevance NDCG@k.  The eval harness for the ANN family —
    ``similarity.ann_recall`` grades set overlap only; this grades the
    ORDER.

    Scale shape: one equi-join of two (queries x k)-row candidate
    lists + two narrow aggregates — metadata-scale, like the lists
    themselves.  All discounted sums run on the integer grid from
    ``dcg_discount_grid`` (see there); the only divisions are one
    per-query IEEE op, rounded to 6.
    """
    grid = dcg_discount_grid(k)
    disc = F.element_at(F.lit(grid), F.col("rank").cast("int"))
    c = candidates.where(F.col("rank") <= k).select(
        q_col, id_col, F.col("rank"), disc.cast("long").alias("disc_int")
    )
    t = truth.where(F.col("rank") <= k).select(q_col, id_col, F.lit(1).alias("rel"))
    joined = c.join(t, on=[q_col, id_col], how="left")
    per_q = joined.groupBy(q_col).agg(
        F.sum(F.when(F.col("rel").isNotNull(), F.col("disc_int")).otherwise(0)).alias(
            "dcg_int"
        ),
        F.sum(F.when(F.col("rel").isNotNull(), 1).otherwise(0)).alias("n_hit"),
        F.min(F.when(F.col("rel").isNotNull(), F.col("rank"))).alias("first_hit"),
    )
    # ideal DCG = prefix sum of the grid up to the truth-list size
    prefix = [sum(grid[: i + 1]) for i in range(k)]
    t_sizes = truth.where(F.col("rank") <= k).groupBy(q_col).agg(
        F.count("*").alias("n_truth")
    )
    idcg = F.element_at(F.lit(prefix), F.col("n_truth").cast("int")).cast("double")
    return (
        per_q.join(t_sizes, q_col)
        .select(
            q_col,
            F.round(F.col("n_hit").cast("double") / F.col("n_truth"), 6).alias(
                "recall"
            ),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("first_hit").cast("double"), F.lit(0.0)),
                6,
            ).alias("mrr"),
            F.round(F.col("dcg_int").cast("double") / idcg, 6).alias("ndcg"),
        )
        .orderBy(q_col)
    )


def add_rank(ranking: DataFrame, *, score_col: str = "score", id_col: str = "doc_id") -> DataFrame:
    """1-based rank by (score DESC, id ASC) over a CANDIDATE-LIST frame.

    The window is intentionally unpartitioned: its input is a top-k
    candidate list already collapsed by a bounded heap (bm25_topk's
    ``limit`` / an ANN's per-query ``rank <= k`` cut), metadata-scale by
    construction — never a corpus.  Corpus-input global windows stay
    banned by tools/audit_plans.py; the contract query carries the
    GLOBAL_WINDOW_OK allowlist entry for exactly this node."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return ranking.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: dict[str, DataFrame],
    *,
    k: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of named ranked
    lists: score(d) = Σ_lists 1/(rrf_k + rank_list(d)), absent treated
    as zero contribution.  Output: (id_col, rank_<name>... with -1 for
    absent, rrf_score) top-``k`` by (rrf_score DESC, id ASC).

    Each input frame needs (id_col, rank).  Inputs are bounded
    candidate lists, so the full-outer join chain and the final
    TakeOrdered heap run on metadata-scale rows regardless of corpus
    size; the per-list retrieval (BM25 heap, ANN bucket join) is where
    the data-scale work already happened.

    Float parity: each 1/(rrf_k+rank) is one IEEE division on exact
    integers, accumulated in the FIXED order of ``rankings``; the sum
    rounds to 9 on both engines (the -1 sentinel keeps rank columns
    NULL-free — NULL ints become NaN floats in the comparator and never
    hash-match)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    named = [
        (name, df.select(F.col(id_col), F.col("rank").alias(f"rank_{name}")))
        for name, df in rankings.items()
    ]
    fused = functools.reduce(
        lambda a, b: a.join(b, on=id_col, how="full_outer"), [df for _, df in named]
    )
    score: Column = F.lit(0.0)
    for name, _ in named:
        r = F.col(f"rank_{name}")
        score = score + F.when(r.isNull(), F.lit(0.0)).otherwise(
            F.lit(1.0) / (F.lit(rrf_k) + r.cast("double"))
        )
    return (
        fused.select(
            id_col,
            *[
                F.coalesce(F.col(f"rank_{name}"), F.lit(-1)).alias(f"rank_{name}")
                for name, _ in named
            ],
            F.round(score, 9).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
