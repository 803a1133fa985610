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
