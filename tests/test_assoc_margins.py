"""Association rules (operators/assoc.py) and embedding label-margin
eval (operators/similarity.py label_margin_eval)."""

from __future__ import annotations

from bitquery_kafka_streams_rust_spark.operators.assoc import pair_rules
from bitquery_kafka_streams_rust_spark.operators.similarity import label_margin_eval


def test_pair_rules_hand_values(spark):
    # baskets: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {b,c}  -> N=4
    rows = [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (4, "b"), (4, "c")]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {
        (r["antecedent"], r["consequent"]): r
        for r in pair_rules(df, "user_id", "item").collect()
    }
    ab = got[("a", "b")]
    # c(a,b)=2, c(a)=3, c(b)=3: support 0.5, conf 2/3, lift 2*4/9
    assert ab["n_pair"] == 2 and ab["support"] == 0.5
    assert ab["confidence"] == round(2 / 3, 6)
    assert ab["lift"] == round(8 / 9, 6)
    ba = got[("b", "a")]
    assert ba["confidence"] == round(2 / 3, 6) and ba["lift"] == ab["lift"]
    bc = got[("b", "c")]
    assert bc["n_pair"] == 1 and bc["lift"] == round(4 / 3, 6)
    assert ("c", "a") not in got  # never co-occur


def test_pair_rules_repetition_does_not_inflate(spark):
    rows = [(1, "x")] * 50 + [(1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = {(r["antecedent"], r["consequent"]): r["n_pair"]
           for r in pair_rules(df, "user_id", "item").collect()}
    assert got[("x", "y")] == 2  # distinct baskets, not event counts


def test_pair_rules_basket_cap(spark):
    rows = [(1, str(i)) for i in range(20)] + [(2, "0"), (2, "1")]
    df = spark.createDataFrame(rows, "user_id long, item string")
    capped = pair_rules(df, "user_id", "item", max_basket_size=10).collect()
    # the 20-item basket is dropped; only user 2's pair remains
    assert {(r["antecedent"], r["consequent"]) for r in capped} == {
        ("0", "1"), ("1", "0"),
    }


def test_label_margins_separable_clusters(spark):
    # two orthogonal-ish clusters -> zero misassignment, positive margin
    import random

    rng = random.Random(5)
    rows = []
    for i in range(30):
        base = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        vec = [b + rng.uniform(-0.05, 0.05) for b in base]
        rows.append((i, vec, i % 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in label_margin_eval(df).collect()}
    for lab in (0, 1):
        assert got[lab]["n"] == 15
        assert got[lab]["n_misassigned"] == 0
        assert got[lab]["mean_margin"] > 0.5
        assert got[lab]["mean_sim_own"] > 0.95


def test_label_margins_flags_mislabeled_points(spark):
    rows = [(i, [1.0, 0.0], 0) for i in range(10)]
    rows += [(100 + i, [0.0, 1.0], 1) for i in range(10)]
    rows += [(200, [0.0, 1.0], 0)]  # cluster-1 point labeled 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {r["label"]: r for r in label_margin_eval(df).collect()}
    assert got[0]["n_misassigned"] == 1
    assert got[1]["n_misassigned"] == 0


def test_contrastive_triplets_deterministic_and_valid(spark):
    from bitquery_kafka_streams_rust_spark.operators.similarity import (
        contrastive_triplets,
    )

    ids = spark.createDataFrame([(i,) for i in range(40)], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (10, 20)], "id_a long, id_b long"
    )
    t1 = sorted(map(tuple, contrastive_triplets(ids, pairs, n_buckets=4).collect()))
    t2 = sorted(map(tuple, contrastive_triplets(ids, pairs, n_buckets=4).collect()))
    assert t1 == t2  # no RNG state: bit-reproducible
    assert len(t1) == 3  # dense buckets (40 ids / 4 buckets): none drop
    for a, p, n in t1:
        assert n not in (a, p) and 0 <= n < 40


def test_contrastive_triplets_skips_when_no_eligible_negative(spark):
    from bitquery_kafka_streams_rust_spark.operators.similarity import (
        contrastive_triplets,
    )

    # corpus of exactly the pair's two docs: every bucket member is the
    # anchor or the positive -> triplet drops
    ids = spark.createDataFrame([(1,), (2,)], "id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    assert contrastive_triplets(ids, pairs).count() == 0
