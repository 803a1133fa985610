"""operators/bpe.py: distributed BPE training — greedy-merge
semantics (overlap handling, tie-breaks, cross-round composition),
anchored-regex anchoring, train/apply parity, and the
narrow-shuffle/no-token-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators.bpe import (
    _merge_rewrite,
    bpe_apply,
    bpe_merge_table,
    bpe_train,
)


def _toks(spark, rows):
    return spark.createDataFrame(
        [(i, list(map(int, t))) for i, t in enumerate(rows)],
        "id long, tokens array<int>",
    )


def _rewrite_one(spark, toks, left, right, new_id):
    df = _toks(spark, [toks]).select(
        _merge_rewrite(F.col("tokens"), left, right, new_id).alias("t")
    )
    return df.collect()[0]["t"]


def test_rewrite_greedy_nonoverlapping(spark):
    # the definitional greedy-left cases, including the a == b runs
    assert _rewrite_one(spark, [7, 7, 7], 7, 7, 99) == [99, 7]
    assert _rewrite_one(spark, [7, 7, 7, 7], 7, 7, 99) == [99, 99]
    assert _rewrite_one(spark, [1, 2, 1, 2], 1, 2, 99) == [99, 99]
    assert _rewrite_one(spark, [2, 1, 2], 1, 2, 99) == [2, 99]
    assert _rewrite_one(spark, [], 1, 2, 99) == []
    assert _rewrite_one(spark, [1], 1, 2, 99) == [1]


def test_rewrite_never_matches_inside_numbers(spark):
    # ",1,2" must not fire inside ",11,22" / ",21,2" / ",1,21"
    assert _rewrite_one(spark, [11, 22], 1, 2, 99) == [11, 22]
    assert _rewrite_one(spark, [21, 2], 1, 2, 99) == [21, 2]
    assert _rewrite_one(spark, [1, 21], 1, 2, 99) == [1, 21]
    assert _rewrite_one(spark, [1, 2], 1, 2, 99) == [99]


def test_train_hand_values_and_tiebreaks(spark):
    # (7,7) counts 5 overlapping (docs 7777 + 777) beating (1,2)=3;
    # round 3 ties at cnt 1 -> ascending (left, right) picks the
    # smallest pair (1000001, 7)
    df = _toks(spark, [[1, 2, 1, 2, 3], [1, 2], [7, 7, 7, 7], [7, 7, 7], []])
    merges, corpus = bpe_train(df, n_merges=3)
    assert [(m["left_tok"], m["right_tok"], m["pair_count"]) for m in merges] == [
        (7, 7, 5),
        (1, 2, 3),
        (1000001, 7, 1),
    ]
    got = {r["id"]: r["tokens"] for r in corpus.collect()}
    assert got == {
        0: [1000002, 1000002, 3],
        1: [1000002],
        2: [1000001, 1000001],
        3: [1000003],
        4: [],
    }


def test_apply_matches_training_rewrite(spark):
    df = _toks(spark, [[1, 2, 1, 2, 3], [7, 7, 7], [5]])
    merges, corpus = bpe_train(df, n_merges=2)
    applied = bpe_apply(df, merges)
    key = lambda rows: sorted((r["id"], tuple(r["tokens"])) for r in rows)  # noqa: E731
    assert key(applied.collect()) == key(corpus.collect())


def test_early_stop_when_no_pairs_remain(spark):
    merges, _ = bpe_train(_toks(spark, [[1], [2], []]), n_merges=3)
    assert merges == []


def test_merge_table_schema(spark):
    merges, _ = bpe_train(_toks(spark, [[1, 2, 1, 2]]), n_merges=1)
    tbl = bpe_merge_table(spark, merges)
    assert tbl.columns == [
        "merge_round",
        "left_tok",
        "right_tok",
        "new_tok",
        "pair_count",
    ]
    assert tbl.collect()[0]["new_tok"] == 1000001


def test_tokens_never_cross_a_shuffle(spark):
    # the only exchange in a round's count job carries (l, r, cnt):
    # the explode/rewrite happen below the partial aggregate
    from bitquery_kafka_streams_rust_spark.operators.bpe import _pair_counts

    df = _toks(spark, [[1, 2, 3], [2, 3, 4]])
    plan = (
        _pair_counts(df, "tokens")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" in plan
    ex = plan[plan.index("Exchange"):].splitlines()[0]
    assert "tokens" not in ex
