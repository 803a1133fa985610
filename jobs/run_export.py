"""Tokenized training-example export job — spark-submit --py-files.

    spark-submit --py-files engine.zip jobs/run_export.py \
        --input /data/sequences --output s3a://exports/run1 \
        --mode pack --context-len 2048 --shuffle

Local smoke (this sandbox, deriving the sequences view from documents):

    python jobs/run_export.py --sf-dir /root/testdata/sf0.001 \
        --output /tmp/export --mode chunk --context-len 512

The LAST stage of the training-data pipeline: where ``run_curation.py``
curates documents, this job turns the tokenized sequences table into
fixed-context training examples.  Stages (deterministic end to end —
reruns produce byte-identical example sets):

    read sequences → validate (length/vocab gate, poison-pills counted)
      → dedup first-wins by (ts, doc_id)
      → mode=chunk: sliding ≤context windows (pure Catalyst, 1→N)
        mode=pack : greedy first-fit bins per (source, salt bucket),
                    bins materialized by re-joining doc tokens and
                    flattening in bin order (the only stage that ships
                    token arrays — unavoidable: the export IS the
                    tokens)
      → optional deterministic shuffle order (mixing-hash range sort)
      → parquet, ONE JSON manifest line from observe() (no re-read)

Every example carries ``cu_seqlens`` (cumulative member-doc offsets,
[0, l0, l0+l1, ...]) — the varlen attention boundaries block-diagonal
kernels need for packed batches; trivial [0, n_tok] in chunk mode.

Scale notes: the dedup stage is ONE partially-aggregated exchange
(min_by): mapper-local duplicates collapse before the shuffle, so the
exchange carries ~one token buffer per (mapper, doc) — the floor, since
an export's output IS the tokens and they must cross at least one
boundary wherever duplicates exist (unlike the streaming spine, whose
output is counts and ships 40 B checksums).  At 100 TB prefer running
exports downstream of an already-deduped table and
dropping the dedup stage.  Packing groups are salt-bounded; the bin
materialization joins tokens ONCE and aggregates per bin key.  Pack
mode cannot place docs longer than the context (greedy first-fit never
splits docs) — they are COUNTED in the manifest (``n_oversize_dropped``)
and a warning is printed; route oversize docs through ``--mode chunk``.
Empty docs (n_tok == 0) are likewise skipped and counted
(``n_empty_dropped``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bitquery_kafka_streams_rust_spark import datagen  # noqa: E402
from bitquery_kafka_streams_rust_spark.functions import tokens as TK  # noqa: E402
from bitquery_kafka_streams_rust_spark.operators import packing as PK  # noqa: E402
from bitquery_kafka_streams_rust_spark.operators import sampling as SAMP  # noqa: E402
from bitquery_kafka_streams_rust_spark.session import get_spark  # noqa: E402


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="tokenized training-example export job")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="sequences parquet (doc_id, tokens, n_tok, source, ts)")
    src.add_argument("--sf-dir", help="derive the sequences view from this testdata dir")
    p.add_argument("--output", required=True)
    p.add_argument("--mode", choices=["chunk", "pack", "fim", "span"], default="chunk")
    p.add_argument("--fim-rate", type=float, default=1.0,
                   help="fim mode: fraction of eligible docs transformed to "
                        "PSM (stage-8 hash draw); the rest export verbatim")
    p.add_argument("--context-len", type=int, default=2048)
    p.add_argument("--overlap", type=int, default=0, help="chunk mode: window overlap")
    p.add_argument("--shuffle", action="store_true", help="deterministic export order")
    p.add_argument(
        "--bpe-merges",
        default=None,
        help="JSON merge table from operators/bpe.bpe_train (list of "
        "{left_tok, right_tok, new_tok} dicts): re-tokenize the deduped "
        "corpus with the learned merges before example construction",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_examples(spark, seq, a: argparse.Namespace):
    """sequences → (examples, deduped-input) where examples is
    (example_id, tokens, n_tok, source, cu_seqlens); the deduped frame
    is returned
    so manifest accounting runs over the population the mode saw."""
    valid = seq.where(TK.is_valid_sequence("tokens", "n_tok"))
    # First-wins dedup WITHOUT the fat-row window: min_by aggregates
    # with map-side partial aggregation, so duplicate rows colocated in
    # a scan task collapse BEFORE the exchange and the shuffle carries
    # ~one tokens buffer per (mapper, doc) — vs row_number's full-row
    # exchange + sort, which ships EVERY duplicate's token array.  One
    # exchange total (the unavoidable one: the export ships tokens);
    # the narrow-dedup-then-rejoin alternative costs a second exchange
    # for the same shuffled token volume.  Winner = min ts per doc_id,
    # the row_number form's exact order (doc_id was both the partition
    # key and the tiebreak, so ts alone decides; equal-ts rows are
    # bit-identical duplicates by the fixture invariant).
    deduped = valid.groupBy("doc_id").agg(
        F.min("ts").alias("ts"),
        F.min_by("source", "ts").alias("source"),
        F.min_by("n_tok", "ts").alias("n_tok"),
        F.min_by("tokens", "ts").alias("tokens"),
    )
    if getattr(a, "bpe_merges", None):
        # re-tokenize AFTER the vocab-validation gate (merged ids live
        # above the vocab) and dedup (fewer rewrites), BEFORE example
        # construction so chunk/pack/fim geometry sees the real
        # post-merge lengths.  Map-side only — composes with every mode.
        from bitquery_kafka_streams_rust_spark.operators.bpe import bpe_apply

        with open(a.bpe_merges) as fh:
            merges = json.load(fh)
        deduped = bpe_apply(deduped, merges).withColumn(
            "n_tok", F.size("tokens")
        )
    if a.mode == "chunk":
        chunks = PK.chunk_sequences(deduped, max_len=a.context_len, overlap=a.overlap)
        return chunks.select(
            F.concat("doc_id", F.lit("#"), F.col("chunk_idx").cast("string")).alias(
                "example_id"
            ),
            F.col("chunk_tokens").alias("tokens"),
            F.col("chunk_len").alias("n_tok"),
            "source",
            # schema parity with pack mode: a chunk is one doc, so its
            # attention-boundary vector is the trivial [0, n_tok]
            F.array(
                F.lit(0).cast("long"), F.col("chunk_len").cast("long")
            ).alias("cu_seqlens"),
        ), deduped
    if a.mode == "fim":
        # PSM infill examples (Bavarian et al. FIM): an eligible doc
        # (>= 4 tokens, stage-8 hash draw < --fim-rate) is rearranged
        # [PRE] prefix [SUF] suffix [MID] middle with sentinel ids just
        # past the vocab (GPT-style 50257..50259); everything else
        # exports verbatim.  Both the eligibility draw and the span
        # geometry (packing.fim_bounds, stage-5/6 hashes) are pure
        # map-side functions of the doc id — zero shuffle, resumable.
        PRE, SUF, MID = 50257, 50258, 50259
        from bitquery_kafka_streams_rust_spark.operators.sampling import hash_frac

        cid = F.substring(F.col("doc_id"), 4, 18).cast("long")
        is_fim = (F.size("tokens") >= 4) & (
            hash_frac(cid, stage=8) < F.lit(float(a.fim_rate))
        )
        plain = deduped.where(~is_fim).select(
            F.concat("doc_id", F.lit("#raw")).alias("example_id"),
            "tokens",
            F.col("n_tok").cast("int").alias("n_tok"),
            "source",
        )
        b = PK.fim_bounds(deduped.where(is_fim), keep_cols=("source",))
        sent = lambda t: F.array(F.lit(t).cast("integer"))
        pre = F.slice(F.col("tokens"), F.lit(1), F.col("mid_start") - 1)
        mid = F.slice(F.col("tokens"), F.col("mid_start"), F.col("mid_len"))
        suf = F.slice(
            F.col("tokens"),
            F.col("mid_start") + F.col("mid_len"),
            F.col("n_tok") - F.col("mid_start") - F.col("mid_len") + 1,
        )
        fimmed = b.select(
            F.concat("doc_id", F.lit("#fim")).alias("example_id"),
            F.concat(sent(PRE), pre, sent(SUF), suf, sent(MID), mid).alias(
                "tokens"
            ),
            (F.col("n_tok") + 3).cast("int").alias("n_tok"),
            "source",
        )
        return (
            plain.unionByName(fimmed)
            .withColumn(
                "cu_seqlens",
                F.array(F.lit(0).cast("long"), F.col("n_tok").cast("long")),
            )
            .select("example_id", "tokens", "n_tok", "source", "cu_seqlens")
        ), deduped
    if a.mode == "span":
        # T5/UL2 multi-span denoising examples (packing.span_corrupt):
        # an eligible doc (>= 8 tokens, stage-8 hash draw < --fim-rate,
        # the same eligibility knob as fim mode) exports as
        # inputs ++ targets with cu_seqlens marking the boundary — what
        # an encoder-decoder / prefix-LM trainer consumes; everything
        # else exports verbatim.  Geometry is the stage-12 avalanched
        # hash — pure map-side, zero shuffle, resumable.
        from bitquery_kafka_streams_rust_spark.operators.sampling import hash_frac

        cid = F.substring(F.col("doc_id"), 4, 18).cast("long")
        is_span = (F.size("tokens") >= 8) & (
            hash_frac(cid, stage=8) < F.lit(float(a.fim_rate))
        )
        plain = deduped.where(~is_span).select(
            F.concat("doc_id", F.lit("#raw")).alias("example_id"),
            "tokens",
            F.col("n_tok").cast("int").alias("n_tok"),
            "source",
            F.array(F.lit(0).cast("long"), F.col("n_tok").cast("long")).alias(
                "cu_seqlens"
            ),
        )
        sc = PK.span_corrupt(
            deduped.where(is_span), keep_cols=("source",), emit="arrays"
        )
        ilen = F.size("inputs").cast("long")
        spanned = sc.select(
            F.concat("doc_id", F.lit("#span")).alias("example_id"),
            F.transform(
                F.concat("inputs", "targets"), lambda t: t.cast("int")
            ).alias("tokens"),
            (F.size("inputs") + F.size("targets")).cast("int").alias("n_tok"),
            "source",
            F.array(
                F.lit(0).cast("long"),
                ilen,
                ilen + F.size("targets").cast("long"),
            ).alias("cu_seqlens"),
        )
        return plain.unionByName(spanned), deduped
    # pack: bin metadata first (bounded pandas groups), then materialize
    # each bin by joining the member docs' tokens back and flattening in
    # the bin's doc order
    bins = PK.pack_sequences(deduped, context_len=a.context_len)
    members = bins.select(
        "source",
        "bucket",
        "bin_idx",
        F.posexplode("doc_ids").alias("pos", "doc_id"),
    )
    joined = members.join(deduped.select("doc_id", "tokens"), "doc_id")
    # ONE sorted collect per bin; tokens AND the varlen attention
    # boundaries (cu_seqlens = prefix sums of member lengths — what
    # block-diagonal attention kernels consume for packed batches)
    # derive from it in a second select so the collected structs are a
    # real column, not an aggregate expression evaluated twice
    binned = joined.groupBy("source", "bucket", "bin_idx").agg(
        F.array_sort(F.collect_list(F.struct("pos", "tokens"))).alias("_ord")
    )
    return (
        binned.select(
            F.concat_ws("#", "source", "bucket", "bin_idx").alias("example_id"),
            F.flatten(F.transform("_ord", lambda s: s["tokens"])).alias("tokens"),
            F.aggregate(
                F.transform("_ord", lambda s: F.size(s["tokens"]).cast("long")),
                F.array(F.lit(0).cast("long")),
                lambda acc, x: F.concat(
                    acc, F.array(F.try_element_at(acc, F.lit(-1)) + x)
                ),
            ).alias("cu_seqlens"),
            "source",
        )
        .withColumn("n_tok", F.size("tokens"))
        .select("example_id", "tokens", "n_tok", "source", "cu_seqlens")
    ), deduped


def main(argv: list[str] | None = None) -> int:
    a = parse_args(argv)
    spark = get_spark(app_name="training-export", master=a.master)
    seq = (
        spark.read.parquet(a.input)
        if a.input
        else datagen.sequences_view(spark, a.sf_dir)
    )
    out, deduped = build_examples(spark, seq, a)
    if a.shuffle:
        # shuffle_order's mixing hash needs an integer id: derive one
        # from the string example_id (xxhash64 may go negative; the
        # hash's pre-multiply pmod maps it into range)
        out = SAMP.shuffle_order(
            out.withColumn("_sid", F.xxhash64("example_id")),
            id_col="_sid",
            seed=a.seed,
            stage=4,
        ).drop("_sid")
    from pyspark.sql import Observation

    obs = Observation("export_manifest")
    observed = out.observe(
        obs,
        F.count("*").alias("n_examples"),
        F.sum("n_tok").alias("total_tokens"),
        F.round(F.avg(F.col("n_tok") / a.context_len), 6).alias("mean_fill"),
    )
    observed.write.mode("overwrite").parquet(a.output)
    got = obs.get
    n_oversize = n_empty = 0
    if a.mode == "pack":
        # pack_greedy silently skips two doc classes: oversize (can't
        # place without splitting — greedy first-fit never splits) and
        # EMPTY (n_tok == 0, nothing to pack).  Count both in ONE
        # narrow (n_tok-only) aggregate so the manifest is honest about
        # coverage; separate from the export action (observe() on a
        # multi-branch input would double-count).
        drops = deduped.agg(
            F.sum((F.col("n_tok") > a.context_len).cast("long")).alias("n_over"),
            F.sum((F.col("n_tok") == 0).cast("long")).alias("n_empty"),
        ).collect()[0]
        n_oversize, n_empty = int(drops["n_over"] or 0), int(drops["n_empty"] or 0)
        if n_oversize:
            sys.stderr.write(
                f"[run_export] WARNING: {n_oversize} docs exceed context_len="
                f"{a.context_len} and were NOT packed; use --mode chunk for them\n"
            )
    print(
        json.dumps(
            {
                "output": a.output,
                "mode": a.mode,
                "context_len": a.context_len,
                "n_examples": int(got["n_examples"] or 0),
                "total_tokens": int(got["total_tokens"] or 0),
                "mean_fill": float(got["mean_fill"] or 0.0),
                "n_oversize_dropped": int(n_oversize),
                "n_empty_dropped": int(n_empty),
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
