"""Watermarked stream-stream join — shard correlation (J2).

The reference "correlates" the same transaction appearing on 3 topics
only implicitly, by dedup-first-wins (``src/config.rs:161-165`` +
``src/consumer.rs:235-241``).  The honest generalization (north rule) is
a stateful stream-stream inner join: sequences ⋈ shards on doc_id with
both sides watermarked and the shard's event time range-bounded against
the sequence's, so the join state is evictable and the result is
deterministic for a given input + watermark."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_correlation_join(
    sequences: DataFrame,
    shards: DataFrame,
    watermark_s: int = 300,
    range_s: int = 300,
) -> DataFrame:
    """Inner join: each sequence row picks up its shard rows arriving
    within ±``range_s`` of the sequence event time.

    Both inputs must carry (doc_id, ts).  The time-range predicate is
    what lets Spark bound the join state: side A keeps rows until
    watermark(B) passes ts_A + range, and vice versa.

    Contract: deliveries must be watermark-compliant (a micro-batch may
    not consist of rows older than the current watermark).  Rows later
    than the declared bound are dropped deterministically; restart from
    checkpoint is output-identical for compliant streams
    (tests/test_state_join.py::test_stream_stream_join_restart_identical).
    Non-compliant late files can differ between a restarted and an
    uninterrupted run ONLY because the uninterrupted one may tolerate
    them via watermark lag — the reference has no analogous guarantee at
    all (processing-time only, SURVEY T4)."""
    s = sequences.withWatermark("ts", f"{watermark_s} seconds").alias("s")
    # Project the shard side to scalars BEFORE the watermark/join: only
    # part_len (8 B) is needed downstream, and the stream-stream join
    # keeps both sides in state for up to watermark+range — shipping the
    # fat tokens_part array through the shuffle and state store would be
    # a ~500x state blowup (the tokens-never-cross-a-shuffle invariant).
    h = (
        shards.select(
            "doc_id", "shard_id", "ts", F.size("tokens_part").alias("part_len")
        )
        .withWatermark("ts", f"{watermark_s} seconds")
        .alias("h")
    )
    cond = (
        (F.col("s.doc_id") == F.col("h.doc_id"))
        & (F.col("h.ts") >= F.col("s.ts") - F.expr(f"interval {range_s} seconds"))
        & (F.col("h.ts") <= F.col("s.ts") + F.expr(f"interval {range_s} seconds"))
    )
    return _correlate(sequences, shards, watermark_s, range_s, "inner")


def shard_correlation_join_outer(
    sequences: DataFrame,
    shards: DataFrame,
    watermark_s: int = 300,
    range_s: int = 300,
) -> DataFrame:
    """LEFT OUTER variant — the orphan detector: every sequence row
    emits; one null-padded row marks a sequence whose shards never
    arrived within ±``range_s`` (an incomplete correlation the inner
    join silently drops, exactly what an ingest-completeness monitor
    needs to alert on).

    Streaming semantics: matched rows emit as they join; a null-padded
    row emits only once the joint watermark passes ``seq.ts + range_s``
    (Spark holds the sequence in state until absence is CERTAIN under
    the declared lateness — the same watermark-resolved-absence
    doctrine as ``cep.not_followed_by``).  Batch evaluation of the same
    plan is a plain left join, so stream-vs-batch parity holds for
    compliant deliveries once the final watermark clears the data
    (tests/test_state_join.py::test_stream_outer_join_matches_batch).
    """
    return _correlate(sequences, shards, watermark_s, range_s, "leftOuter")


def _correlate(
    sequences: DataFrame,
    shards: DataFrame,
    watermark_s: int,
    range_s: int,
    how: str,
) -> DataFrame:
    s = sequences.withWatermark("ts", f"{watermark_s} seconds").alias("s")
    # see shard_correlation_join: scalar projection BEFORE the
    # watermark/join keeps token arrays out of join state
    h = (
        shards.select(
            "doc_id", "shard_id", "ts", F.size("tokens_part").alias("part_len")
        )
        .withWatermark("ts", f"{watermark_s} seconds")
        .alias("h")
    )
    cond = (
        (F.col("s.doc_id") == F.col("h.doc_id"))
        & (F.col("h.ts") >= F.col("s.ts") - F.expr(f"interval {range_s} seconds"))
        & (F.col("h.ts") <= F.col("s.ts") + F.expr(f"interval {range_s} seconds"))
    )
    return s.join(h, cond, how).select(
        F.col("s.doc_id").alias("doc_id"),
        F.col("s.source").alias("source"),
        F.col("s.ts").alias("seq_ts"),
        F.col("h.shard_id").alias("shard_id"),
        F.col("h.part_len").alias("part_len"),
        F.col("h.ts").alias("shard_ts"),
    )
