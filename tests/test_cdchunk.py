"""Content-defined chunking (operators/cdchunk.py): tiling invariants,
edit re-alignment (the property that distinguishes CDC from fixed-size
chunking), edge cases, duplicate-group counting."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bitquery_kafka_streams_rust_spark.operators import cdchunk as CD

SCHEMA = "doc_id string, tokens array<int>"


def _chunks(spark, docs, **kw):
    df = spark.createDataFrame(docs, SCHEMA)
    return CD.chunk_table(df, **kw).collect()


def test_chunks_tile_the_document(spark):
    rng = random.Random(7)
    toks = [rng.randrange(50257) for _ in range(500)]
    rows = sorted(_chunks(spark, [("d", toks)]), key=lambda r: r["chunk_idx"])
    assert rows[0]["start"] == 1
    for a, b in zip(rows, rows[1:]):
        assert b["start"] == a["start"] + a["chunk_len"]
    assert rows[-1]["start"] + rows[-1]["chunk_len"] - 1 == len(toks)
    assert sum(r["chunk_len"] for r in rows) == len(toks)


def test_empty_and_short_docs(spark):
    rows = _chunks(spark, [("empty", []), ("short", [5, 6, 7])])
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert "empty" not in by_doc
    (s,) = by_doc["short"]
    assert (s["start"], s["chunk_len"]) == (1, 3)


def test_identical_content_identical_fingerprints(spark):
    rng = random.Random(11)
    toks = [rng.randrange(50257) for _ in range(300)]
    rows = _chunks(spark, [("a", toks), ("b", toks)])
    a = sorted((r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_hash"])
               for r in rows if r["doc_id"] == "a")
    b = sorted((r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_hash"])
               for r in rows if r["doc_id"] == "b")
    assert a == b


def test_prefix_edit_realigns(spark):
    # THE content-defined property: prepending tokens only disturbs
    # chunks up to the first shared boundary — every later chunk's
    # fingerprint sequence is identical (fixed-size chunking would
    # shift every chunk).
    rng = random.Random(23)
    toks = [rng.randrange(50257) for _ in range(800)]
    edited = [rng.randrange(50257) for _ in range(3)] + toks
    rows = _chunks(spark, [("orig", toks), ("edit", edited)])
    orig = [r["chunk_hash"] for r in sorted(
        (r for r in rows if r["doc_id"] == "orig"), key=lambda r: r["chunk_idx"])]
    edit = [r["chunk_hash"] for r in sorted(
        (r for r in rows if r["doc_id"] == "edit"), key=lambda r: r["chunk_idx"])]
    # common suffix of fingerprints covers almost the whole doc
    k = 0
    while k < min(len(orig), len(edit)) and orig[-1 - k] == edit[-1 - k]:
        k += 1
    assert k >= len(orig) - 2, (len(orig), len(edit), k)


def test_expected_chunk_length_tracks_boundary_bits(spark):
    rng = random.Random(42)
    toks = [rng.randrange(50257) for _ in range(4000)]
    n5 = len(_chunks(spark, [("d", toks)], boundary_bits=5))
    n3 = len(_chunks(spark, [("d", toks)], boundary_bits=3))
    # 2^3 residue class is 4x denser than 2^5 -> ~4x the chunks
    assert 2.0 < n3 / n5 < 8.0


def test_duplicate_chunks_counts_occurrences_and_docs(spark):
    toks = list(range(100, 140))
    df = spark.createDataFrame(
        [("a", toks), ("a2", toks), ("u", [7] * 5)], SCHEMA
    )
    ch = CD.chunk_table(df)
    dup = CD.duplicate_chunks(ch).collect()
    assert len(dup) > 0
    for r in dup:
        assert r["n_occ"] == 2 and r["n_docs"] == 2
    # unique doc contributes no duplicate groups
    assert ch.where(F.col("doc_id") == "u").count() == 1
