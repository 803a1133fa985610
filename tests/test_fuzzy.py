"""operators/fuzzy.py: blocking semantics, edit-distance verify,
block-size cap, and the scope limitation (edits inside the block key
are a different pass's job)."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators.fuzzy import fuzzy_pairs


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_fuzzy_catches_typos_within_block(spark):
    docs = _docs(
        spark,
        [
            "solar panel installation guide for homes",
            "solar panel instalation guide for homes",   # 1 deletion
            "completely different text about fish",
        ],
    )
    out = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(docs, max_dist=5).collect()}
    assert out == {(0, 1): 1}


def test_fuzzy_edit_inside_block_key_is_out_of_scope(spark):
    # the typo is inside the first 8 chars -> different block -> no pair
    # (documented: widen recall with another pass on a different key)
    docs = _docs(
        spark,
        [
            "solar panel installation guide",
            "sOlar panel installation guide".replace("O", "0"),  # s0lar...
        ],
    )
    assert fuzzy_pairs(docs, max_dist=5).count() == 0


def test_fuzzy_max_dist_boundary_and_case_folding(spark):
    docs = _docs(spark, ["abcdefgh XXXXX", "ABCDEFGH YYYYY"])
    # case folds away; the 5 trailing edits are exactly max_dist
    out = fuzzy_pairs(docs, max_dist=5).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in out] == [(0, 1, 5)]
    assert fuzzy_pairs(docs, max_dist=4).count() == 0


def test_fuzzy_block_cap_drops_hot_blocks(spark):
    docs = _docs(spark, ["same prefix %d" % i for i in range(12)])
    assert fuzzy_pairs(docs, max_dist=40, max_block_size=10).count() == 0
    assert fuzzy_pairs(docs, max_dist=40, max_block_size=None).count() == 66


def test_reciprocal_best_match_one_to_one(spark):
    from bitquery_kafka_streams_rust_spark.operators.fuzzy import (
        reciprocal_best_match,
    )

    # hub 1 is closest to 2 (dist 1) but also matches 3 and 4; 3's best
    # is 4 (dist 1, mutual) -> links (1,2) and (3,4); nothing else
    pairs = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 2), (1, 4, 3), (3, 4, 1), (2, 4, 5)],
        "id_a long, id_b long, dist int",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in reciprocal_best_match(pairs).collect()
    )
    assert got == [(1, 2, 1), (3, 4, 1)]


def test_reciprocal_best_match_tie_break_smaller_id(spark):
    from bitquery_kafka_streams_rust_spark.operators.fuzzy import (
        reciprocal_best_match,
    )

    # 5 ties between 6 and 7 at dist 2 -> best(5)=6; 6's best is 5;
    # 7 left unmatched (its best 5 doesn't reciprocate)
    pairs = spark.createDataFrame(
        [(5, 6, 2), (5, 7, 2), (6, 7, 9)], "id_a long, id_b long, dist int"
    )
    got = sorted(
        (r["id_a"], r["id_b"]) for r in reciprocal_best_match(pairs).collect()
    )
    assert got == [(5, 6)]


def test_reciprocal_best_match_each_id_at_most_once(spark, sf_dir):
    from bitquery_kafka_streams_rust_spark.operators.fuzzy import (
        fuzzy_pairs,
        reciprocal_best_match,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = reciprocal_best_match(fuzzy_pairs(docs, max_dist=5)).collect()
    seen = [r["id_a"] for r in m] + [r["id_b"] for r in m]
    assert len(seen) == len(set(seen))
