"""Sequence chunking & packing."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.datagen import sequences_view
from bitquery_kafka_streams_rust_spark.operators.packing import (
    chunk_sequences,
    pack_greedy,
    pack_sequences,
)

T0 = datetime(2024, 1, 1)


def test_chunking_covers_all_tokens(spark, sf_dir):
    seq = sequences_view(spark, sf_dir)
    chunks = chunk_sequences(seq, max_len=512, overlap=0)
    per_doc = chunks.groupBy("doc_id").agg(F.sum("chunk_len").alias("s"))
    joined = seq.join(per_doc, "doc_id")
    # no-overlap chunks partition the tokens exactly (per physical row:
    # duplicates fan out, so compare per doc via any_value)
    bad = joined.where(F.col("s") != F.col("n_tok") * 2).where(
        F.col("s") != F.col("n_tok")
    )
    assert bad.count() == 0
    assert chunks.where(F.col("chunk_len") > 512).count() == 0
    # chunk content equals the corresponding token slice
    row = (
        chunks.where((F.col("chunk_idx") == 1) & (F.col("chunk_len") == 512))
        .join(seq.select("doc_id", "tokens").dropDuplicates(["doc_id"]), "doc_id")
        .limit(1)
        .collect()
    )
    if row:
        r = row[0]
        assert r["chunk_tokens"] == r["tokens"][512:1024]


def test_chunking_overlap(spark):
    df = spark.createDataFrame(
        [("d1", list(range(10)), 10, "s", T0)],
        "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp",
    )
    out = chunk_sequences(df, max_len=4, overlap=2).orderBy("chunk_idx").collect()
    assert [r["chunk_tokens"] for r in out] == [
        [0, 1, 2, 3],
        [2, 3, 4, 5],
        [4, 5, 6, 7],
        [6, 7, 8, 9],
    ]


def test_pack_greedy_reference():
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            "n_tok": [60, 50, 40, 30, 200],
            "source": ["s"] * 5,
            "ts": [T0] * 5,
        }
    )
    out = pack_greedy(pdf, context_len=100)
    # a(60)→bin0; b(50)→bin1; c(40)→bin0 (100); d(30)→bin1 (80); e>100 skipped
    assert out["total_tok"].tolist() == [100, 80]
    assert out["doc_ids"].tolist() == [["a", "c"], ["b", "d"]]


def test_pack_sequences_distributed(spark, sf_dir):
    seq = sequences_view(spark, sf_dir)
    bins = pack_sequences(seq, context_len=2048)
    rows = bins.collect()
    assert all(r["total_tok"] <= 2048 for r in rows)
    # conservation: every packable doc appears exactly once per source
    packed = bins.select("source", F.explode("doc_ids").alias("doc_id"))
    eligible = seq.where((F.col("n_tok") > 0) & (F.col("n_tok") <= 2048))
    assert packed.count() == eligible.count()
    # fill quality: greedy on zipf-ish lengths should average >80% full
    # for all but the last bin of each source
    from pyspark.sql import Window

    w = Window.partitionBy("source")
    non_last = bins.withColumn("max_idx", F.max("bin_idx").over(w)).where(
        F.col("bin_idx") < F.col("max_idx")
    )
    avg_fill = non_last.agg(F.avg("fill_ratio")).collect()[0][0]
    assert avg_fill is None or avg_fill > 0.8


def test_pack_salted_matches_unsalted_conservation(spark, sf_dir):
    seq = sequences_view(spark, sf_dir)
    salted = pack_sequences(seq, context_len=2048, salt_buckets=4)
    plain = pack_sequences(seq, context_len=2048)
    a = salted.select(F.explode("doc_ids")).count()
    b = plain.select(F.explode("doc_ids")).count()
    assert a == b  # same docs packed, just into group-local bins

def test_pack_boundaries_cu_seqlens(spark):
    """cu_seqlens must be the exact prefix-sum of doc_lens in bin
    order, robust to duplicate doc rows on the length side."""
    from datetime import datetime as _dt

    from bitquery_kafka_streams_rust_spark.operators.packing import pack_boundaries

    t0 = _dt(2024, 1, 1)
    rows = [
        ("a", [1] * 100, 100, "web", t0),
        ("b", [1] * 200, 200, "web", t0),
        ("b", [1] * 200, 200, "web", t0),   # bit-identical duplicate row
        ("c", [1] * 300, 300, "web", t0),
    ]
    seq = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string, ts timestamp"
    )
    bins = pack_sequences(seq, context_len=1024, salt_buckets=None)
    out = pack_boundaries(bins, seq).collect()
    # duplicates pack as separate items -> one bin: a,b,b,c (100+200+200+300)
    assert len(out) == 1
    r = out[0]
    assert list(r["doc_lens"]) == [100, 200, 200, 300]
    assert list(r["cu_seqlens"]) == [0, 100, 300, 500, 800]
    assert r["n_docs"] == 4 and r["total_tok"] == 800


def test_length_bucket_batches_semantics(spark):
    from bitquery_kafka_streams_rust_spark.operators.packing import (
        length_bucket_batches,
    )

    rows = [(f"d{i}", 100 + i, "web", T0) for i in range(5)]  # bucket 0
    rows += [(f"e{i}", 300, "web", T0) for i in range(3)]     # bucket 1
    rows += [("z0", 90, "api", T0)]                           # other stratum
    seq = spark.createDataFrame(
        rows, "doc_id string, n_tok int, source string, ts timestamp"
    )
    out = {
        (r["strata"], r["len_bucket"], r["batch_idx"]): r
        for r in length_bucket_batches(seq, batch_size=2, bucket_width=256).collect()
    }
    # web bucket 0: lens 100..104 -> batches [100,101],[102,103],[104]
    b0 = out[("web", 0, 0)]
    assert (b0["n_seqs"], b0["max_len"], b0["sum_len"]) == (2, 101, 201)
    assert abs(b0["pad_frac"] - (1 - 201 / 202)) < 1e-6
    assert out[("web", 0, 2)]["n_seqs"] == 1
    assert out[("web", 0, 2)]["pad_frac"] == 0.0  # single seq pads nothing
    assert out[("web", 1, 0)]["n_seqs"] == 2 and out[("web", 1, 1)]["n_seqs"] == 1
    assert out[("api", 0, 0)]["n_seqs"] == 1


def test_fim_split_matches_python_reference(spark):
    """fim_split vs a from-scratch Python replica of the stage-salted
    Knuth hash + slice geometry + positional checksums."""
    from bitquery_kafka_streams_rust_spark.operators.packing import fim_split

    def ref(c, toks):
        def frac(stage):
            base = c ^ ((stage * 0x9E3779B9) % 2**63)
            return ((base % 2**31) * 2654435761 % 2**31) / 2**31

        n = len(toks)
        mid_len = 1 + int(frac(5) * (n - 2))
        mid_start = 2 + int(frac(6) * (n - mid_len - 1))
        parts = (
            toks[: mid_start - 1],
            toks[mid_start - 1 : mid_start - 1 + mid_len],
            toks[mid_start - 1 + mid_len :],
        )
        ck = lambda p: sum((i + 1) * t for i, t in enumerate(p)) % 2**31
        assert all(parts) and sum(map(len, parts)) == n
        return (n, mid_start, mid_len) + tuple(ck(p) for p in parts)

    docs = {7: list(range(100, 140)), 23: [3, 1, 4, 1, 5], 900: list(range(7)),
            12345: [(i * 17) % 50257 for i in range(513)]}
    df = spark.createDataFrame(
        [(f"doc{c}", t) for c, t in docs.items()], "doc_id string, tokens array<int>"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["mid_start"], r["mid_len"],
                      r["prefix_cksum"], r["middle_cksum"], r["suffix_cksum"])
        for r in fim_split(df).collect()
    }
    assert got == {f"doc{c}": ref(c, t) for c, t in docs.items()}
    # short docs excluded; duplicate-aliased rows collapse
    tiny = spark.createDataFrame([("doc1", [1, 2, 3])], "doc_id string, tokens array<int>")
    assert fim_split(tiny).count() == 0
    assert fim_split(df.union(df)).count() == 4
