"""Distributed BPE tokenizer training — corpus-scale merge learning.

The standard LLM-pipeline stage the token operators feed: learn a
byte-pair-encoding merge table from the corpus itself (Sennrich et al.
2016 shape).  Each round counts every adjacent token pair corpus-wide,
promotes the most frequent pair to a new token, and rewrites the
corpus; the merge table IS the tokenizer.

Spark-first decomposition per round:

- **Pair counting is one map-side explode + partial-combined count**:
  ``zip_with(tokens[:-1], tokens[1:], struct)`` emits the adjacent
  pairs inside the executor, and the hash-aggregate partials collapse
  them to (pair, count) rows — the only thing that ever shuffles is
  the narrow pair-count table, never a token array (the repo's
  tokens-never-cross-a-shuffle invariant holds through every round).
- **Merge selection is a 1-row metadata collect** (count DESC, then
  ascending (left, right) so ties are deterministic) — same pattern as
  Lloyd's centroids / mix weights: the alternative, a scalar-subquery
  join, plans as the BNLJ the plan audit bans.
- **Merge application is a map-side anchored-regex rewrite**: the
  token array round-trips through a comma-delimited string and one
  ``regexp_replace(",L,R(?=,)" -> ",M")`` pass.  Java's replaceAll
  scans left-to-right and resumes AFTER each replacement, and the
  trailing delimiter survives via lookahead — which is EXACTLY the
  greedy non-overlapping BPE convention: in ``7 7 7`` the first two
  merge and the third survives; in ``7 7 7 7`` both pairs merge.  The
  sentinel commas anchor both numbers comma-to-comma, so ``,1,2`` can
  never match inside ``,11,22``.  Equivalence to the definitional
  left fold (``merge iff last(acc) == L and x == R``) holds because a
  just-merged cell holds the NEW id, which never equals ``L`` within
  its round (fresh ids) — neither path can rescan a replacement.  The
  string form exists because the fold is an interpreted HOF with
  O(n^2) array copies (measured 52.8 s -> the regex path is JVM
  codegen, O(n) per doc); the DuckDB oracle keeps the definitional
  fold, so the two engines agree via *different* formulations — a
  stronger check.  No shuffle; each round's rewrite composes onto the
  previous round's lineage, so at 100 TB the corpus is re-derived
  map-side from the source scan rather than re-shuffled K times
  (checkpoint between rounds if K grows past plan-depth comfort).

Pair counts include overlapping occurrences (``7 7 7`` counts
``(7,7)`` twice) — the classical counting convention; application is
what de-overlaps.  Everything is integer arithmetic, so the DuckDB
oracle replays training bit-exactly with the same unrolled rounds
(selection included — no Spark-derived literals are leaked into the
oracle).

Reference analog: the per-key running counter maps of
src/processors/dex_processor.rs are the same count-promote loop one
key at a time; here the promotion is corpus-global and iterative.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MERGE_SCHEMA = (
    "merge_round int, left_tok int, right_tok int, new_tok int, pair_count long"
)


def _pair_counts(df: DataFrame, tokens_col: str) -> DataFrame:
    """Adjacent-pair count table.  The counting itself runs in the Arrow
    kernel (seqkernel.adjacent_pair_counts_kernel): per task-batch the
    pairs are packed and np.unique-counted, so only the batch-local
    (l, r, cnt) partials reach the (tiny) final aggregate — replacing
    the interpreted slice+zip_with struct explode (guide §4.2)."""
    from ..functions.seqkernel import adjacent_pair_counts_kernel

    partials = df.select(F.col(tokens_col).alias("tokens")).mapInArrow(
        adjacent_pair_counts_kernel(), "l int, r int, cnt long"
    )
    return partials.groupBy("l", "r").agg(F.sum("cnt").alias("cnt"))


def _merge_rewrite(tokens: Column, left: int, right: int, new_id: int) -> Column:
    """Greedy left-to-right single-merge rewrite of one token array
    via the anchored-regex string pass (see module docstring for the
    equivalence argument).  Empty arrays survive: "" -> ",," -> split
    yields only empty strings, which the filter drops."""
    s = F.concat(
        F.lit(","),
        F.array_join(tokens.cast("array<string>"), ","),
        F.lit(","),
    )
    out = F.regexp_replace(s, f",{int(left)},{int(right)}(?=,)", f",{int(new_id)}")
    return F.transform(
        F.filter(F.split(out, ","), lambda x: x != ""),
        lambda x: x.cast("int"),
    )


def bpe_train(
    df: DataFrame,
    *,
    n_merges: int = 3,
    tokens_col: str = "tokens",
    new_id_base: int = 1_000_001,
    materialize_rounds: bool = True,
    reliable: bool = False,
) -> tuple[list[dict], DataFrame]:
    """Learn ``n_merges`` BPE merges.  Returns (merge list, rewritten
    corpus).  Each merge dict: merge_round / left_tok / right_tok /
    new_tok / pair_count.  Stops early if no pair remains (all docs
    shorter than 2 tokens).

    ``materialize_rounds`` (default on) checkpoints the corpus between
    rounds: without it, round r's pair count replays every earlier
    round's rewrite AND the source derivation (the count pass and the
    rewrite each re-evaluate the lineage, so work grew quadratically in
    K — measured 19 s -> ~5 s for K=3 at sf0.1).  This is the module
    docstring's "checkpoint between rounds" advice made the default;
    ``reliable=True`` swaps localCheckpoint for the lineage-keeping
    DISK_ONLY persist (preemptible-capacity contract of the dedup
    family)."""
    from .dedup import _materialize

    merges: list[dict] = []
    cur = _materialize(df, reliable) if materialize_rounds else df
    for r in range(1, int(n_merges) + 1):
        top = (
            _pair_counts(cur, tokens_col)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = int(top[0]["l"]), int(top[0]["r"]), int(top[0]["cnt"])
        new_id = new_id_base + r - 1
        merges.append(
            {
                "merge_round": r,
                "left_tok": left,
                "right_tok": right,
                "new_tok": new_id,
                "pair_count": cnt,
            }
        )
        cur = cur.withColumn(
            tokens_col, _merge_rewrite(cur[tokens_col], left, right, new_id)
        )
        if materialize_rounds:
            cur = _materialize(cur, reliable)
    return merges, cur


def bpe_merge_table(spark: SparkSession, merges: Sequence[dict]) -> DataFrame:
    """The learned tokenizer as a DataFrame (K rows of metadata)."""
    return spark.createDataFrame(
        [
            (
                m["merge_round"],
                m["left_tok"],
                m["right_tok"],
                m["new_tok"],
                m["pair_count"],
            )
            for m in merges
        ],
        MERGE_SCHEMA,
    )


def bpe_apply(
    df: DataFrame, merges: Sequence[dict], *, tokens_col: str = "tokens"
) -> DataFrame:
    """Apply a learned merge table to a (new) corpus: the K folds
    compose map-side in training order — tokenization at inference
    parity with training, zero shuffle."""
    out = df
    for m in merges:
        out = out.withColumn(
            tokens_col,
            _merge_rewrite(
                out[tokens_col], m["left_tok"], m["right_tok"], m["new_tok"]
            ),
        )
    return out
