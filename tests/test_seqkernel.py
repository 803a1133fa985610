"""Kernel-vs-Catalyst parity pins for functions/seqkernel.py (round 6).

Every Arrow/NumPy kernel must be BIT-IDENTICAL to the interpreted
Catalyst form it replaced — these tests compare both paths on real
Spark frames (sf0.001), including the edge rows (empty arrays, short
docs, invalid tokens, duplicate aliases)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark import datagen
from bitquery_kafka_streams_rust_spark.functions import seqkernel as SKN
from bitquery_kafka_streams_rust_spark.functions import tokens as TK
from bitquery_kafka_streams_rust_spark.operators import dedup as DD
from bitquery_kafka_streams_rust_spark.operators import ngrams as NG


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sequence_features_match_hof_forms(spark, sf_dir):
    """cksum / tok_sum / tok_min / tok_max / first_tok from the fused
    generator kernel == the interpreted HOF expressions over
    sequences_view, row for row (incl. empty rows -> 0/NULL)."""
    fast = SKN.sequence_features_view(spark, sf_dir, SKN.FEATURES)
    seq = datagen.sequences_view(spark, sf_dir)
    slow = seq.select(
        "doc_id",
        "n_tok",
        "source",
        "ts",
        TK.token_checksum("tokens").alias("cksum"),
        TK.token_sum("tokens").alias("tok_sum"),
        F.array_min("tokens").alias("tok_min"),
        F.array_max("tokens").alias("tok_max"),
        F.try_element_at("tokens", F.lit(1)).alias("first_tok"),
    )
    cols = ["doc_id", "n_tok", "source", "ts", *SKN.FEATURES]
    assert _rows(fast, cols) == _rows(slow, cols)


def test_valid_events_kernel_matches_filter_select(spark):
    """The streaming decode kernel == where(is_valid).select(cksum) on a
    frame with every invalid shape: len mismatch, out-of-range token,
    empty-but-declared-nonzero, valid empty."""
    rows = [
        ("a", [1, 2, 3], 3, "s", "2024-01-01 00:00:00"),
        ("b", [1, 2], 3, "s", "2024-01-01 00:00:01"),        # len mismatch
        ("c", [1, -1, 3], 3, "s", "2024-01-01 00:00:02"),     # negative token
        ("d", [1, 99999, 3], 3, "s", "2024-01-01 00:00:03"),  # >= vocab
        ("e", [], 0, "s", "2024-01-01 00:00:04"),             # valid empty
        ("f", [], 2, "s", "2024-01-01 00:00:05"),             # empty mismatch
        ("g", [50256, 0, 50255, 7], 4, "s", "2024-01-01 00:00:06"),
    ]
    df = (
        spark.createDataFrame(
            rows, "doc_id string, tokens array<int>, n_tok int, source string, ts string"
        )
        .withColumn("ts", F.to_timestamp("ts"))
    )
    fast = df.select("doc_id", "n_tok", "source", "ts", "tokens").mapInArrow(
        SKN.valid_events_kernel, SKN.VALID_EVENTS_SCHEMA
    )
    slow = df.where(TK.is_valid_sequence("tokens", "n_tok")).select(
        "doc_id", "n_tok", "source", "ts", TK.token_checksum("tokens").alias("cksum")
    )
    cols = ["doc_id", "n_tok", "source", "ts", "cksum"]
    assert _rows(fast, cols) == _rows(slow, cols)
    assert {r[0] for r in _rows(fast, ["doc_id"])} == {"a", "e", "g"}


def test_packed_grams_match_csv_ngram_stats(spark, sf_dir):
    """Packed-key ngram_stats == CSV-key ngram_stats (full output, no
    top-k cut, so every gram is compared)."""
    seq = datagen.sequences_view(spark, sf_dir)
    slow = NG.ngram_stats(seq, 3, min_count=2, top_k=None)
    grams = SKN.spine_scalars(spark, sf_dir).select("_c", "n_tok").mapInArrow(
        SKN.packed_gram_kernel(3), "c long, g long"
    )
    fast = NG.ngram_stats_packed(grams, 3, min_count=2, top_k=None)
    cols = ["gram", "n_occur", "n_doc"]
    assert _rows(fast, cols) == _rows(slow, cols)


def test_gram_hash_kernels_match_token_gram_hashes(spark, sf_dir):
    """Distinct gram-hash sets from the generator-fused kernel == the
    Catalyst token_gram_hashes over sequences_view (short docs hash the
    whole array; empty docs emit nothing)."""
    seq = datagen.sequences_view(spark, sf_dir)
    slow = (
        seq.select(F.explode(DD.token_gram_hashes("tokens", 8)).alias("g"))
        .distinct()
    )
    fast = (
        SKN.spine_scalars(spark, sf_dir).select("doc_id", "_c", "n_tok")
        .mapInArrow(SKN.distinct_grams_kernel(n=8, from_gen=True), "g long")
        .distinct()
    )
    assert _rows(fast, ["g"]) == _rows(slow, ["g"])


def test_bloom_hits_kernel_matches_expression(spark, sf_dir):
    """Bloom probe counts from the kernel == dedup.bloom_hit_count over
    the same words literal (false positives and all)."""
    seq = datagen.sequences_view(spark, sf_dir)
    num = F.substring("doc_id", 4, 18).cast("long")
    ev = seq.where(num % 97 == 0)
    ev_grams = ev.select(F.explode(DD.token_gram_hashes("tokens", 8)).alias("g"))
    words = DD.bloom_words(ev_grams, m_bits=1 << 16, k=4)
    slow = seq.select(
        "doc_id",
        DD.bloom_hit_count(DD.token_gram_hashes("tokens", 8), words, 1 << 16, 4).alias("n_hits"),
    )
    fast = SKN.spine_scalars(spark, sf_dir).select("doc_id", "_c", "n_tok").mapInArrow(
        SKN.bloom_hits_kernel(words, 1 << 16, 4, n=8, from_gen=True),
        "doc_id string, n_hits int",
    )
    assert _rows(fast, ["doc_id", "n_hits"]) == _rows(slow, ["doc_id", "n_hits"])


def test_token_counts_kernel_matches_explode(spark, sf_dir):
    seq = datagen.sequences_view(spark, sf_dir)
    slow = seq.select(F.explode("tokens").alias("t")).groupBy("t").count()
    fast = (
        SKN.spine_scalars(spark, sf_dir).select("_c", "n_tok")
        .mapInArrow(SKN.token_counts_kernel(), "t int, cnt long")
        .groupBy("t")
        .agg(F.sum("cnt").alias("count"))
    )
    assert _rows(fast, ["t", "count"]) == _rows(slow, ["t", "count"])


def test_shard_part_len_equals_size(spark, sf_dir):
    sh = datagen.shards_view(spark, sf_dir)
    bad = sh.where(F.col("part_len") != F.size("tokens_part")).count()
    assert bad == 0


def test_cdc_chunk_kernel_matches_chunk_table(spark, sf_dir):
    """Kernel CDC chunk table == Catalyst cdchunk.chunk_table, row for
    row (boundaries, forced end cuts, fingerprints, avalanche)."""
    from bitquery_kafka_streams_rust_spark.operators import cdchunk as CC

    slow = CC.chunk_table(datagen.sequences_view(spark, sf_dir), w=8, boundary_bits=5)
    fast = SKN.spine_scalars(spark, sf_dir).select("doc_id", "_c", "n_tok").mapInArrow(
        SKN.cdc_chunk_kernel(w=8, boundary_bits=5),
        "doc_id string, chunk_idx int, start int, chunk_len int, chunk_hash long",
    )
    cols = ["doc_id", "chunk_idx", "start", "chunk_len", "chunk_hash"]
    assert _rows(fast, cols) == _rows(slow, cols)


def test_exploded_builders_match_kernels(spark, sf_dir):
    """Codegen exploded builders == the kernel emissions (and hence the
    interpreted forms pinned elsewhere): packed grams, packed prefixes,
    gram positions, token positions."""
    spine = SKN.spine_scalars(spark, sf_dir)
    fast_g = datagen.exploded_packed_grams(spine, 3)
    slow_g = spine.select("_c", "n_tok").mapInArrow(
        SKN.packed_gram_kernel(3), "c long, g long"
    )
    assert _rows(fast_g, ["c", "g"]) == _rows(slow_g, ["c", "g"])
    fast_p = datagen.exploded_packed_prefix(spine, 3)
    slow_p = spine.select("_c", "n_tok").mapInArrow(
        SKN.packed_prefix_kernel(3), "c long, p long, next_tok int"
    )
    assert _rows(fast_p, ["c", "p", "next_tok"]) == _rows(slow_p, ["c", "p", "next_tok"])
    fast_pos = datagen.exploded_gram_positions(spine, 8)
    slow_pos = spine.select("_c", "n_tok").mapInArrow(
        SKN.gram_positions_kernel(n=8), "c long, pos long, g long"
    )
    assert _rows(fast_pos, ["c", "pos", "g"]) == _rows(slow_pos, ["c", "pos", "g"])
    fast_t = datagen.exploded_token_positions(spine)
    slow_t = spine.select("_c", "n_tok").mapInArrow(
        SKN.token_positions_kernel(), "c long, pos long, token long"
    )
    assert _rows(fast_t, ["c", "pos", "token"]) == _rows(slow_t, ["c", "pos", "token"])


def test_adjacent_pair_counts_kernel(spark, sf_dir):
    seq = datagen.sequences_view(spark, sf_dir)
    t = seq["tokens"]
    slow = (
        seq.where(F.size(t) >= 2)
        .select(
            F.explode(
                F.zip_with(
                    F.slice(t, F.lit(1), F.size(t) - 1),
                    F.slice(t, F.lit(2), F.size(t) - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.count("*").alias("cnt"))
    )
    fast = (
        seq.select("tokens")
        .mapInArrow(SKN.adjacent_pair_counts_kernel(), "l int, r int, cnt long")
        .groupBy("l", "r")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _rows(fast, ["l", "r", "cnt"]) == _rows(slow, ["l", "r", "cnt"])


def test_ensure_parallel_adaptive():
    from bitquery_kafka_streams_rust_spark.datagen import table_meta

    rows, parts = table_meta("/root/testdata/sf0.001", "documents")
    assert rows > 0 and parts >= 1


def test_minhash_sig_kernel_matches_interpreted(spark, sf_dir):
    """Portable MinHash signatures from the Arrow kernel == the
    interpreted aggregate form, per slot (incl. short/empty texts)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slow = docs.select(
        F.col("doc_id").alias("id"),
        DD.minhash_signature(F.col("text"), 64, portable=True).alias("sig"),
    )
    sig, _banded = DD._banded_sigs(docs, "doc_id", "text", 64, 16, True, False)
    a = sorted((r["id"], tuple(r["sig"])) for r in slow.collect())
    b = sorted((r["id"], tuple(r["sig"])) for r in sig.collect())
    assert a == b


def test_cksum_from_tokens_kernel(spark, sf_dir):
    seq = datagen.sequences_view(spark, sf_dir)
    slow = seq.select("doc_id", "n_tok", TK.token_checksum("tokens").alias("cksum"))
    fast = seq.select("doc_id", "n_tok", "tokens").mapInArrow(
        SKN.cksum_from_tokens_kernel, "doc_id string, n_tok int, cksum bigint"
    )
    cols = ["doc_id", "n_tok", "cksum"]
    assert _rows(fast, cols) == _rows(slow, cols)
