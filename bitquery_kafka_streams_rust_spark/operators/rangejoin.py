"""Bucketed interval (range) join — the scale path for point-in-interval
correlation without an equi key.

The reference correlates events purely by key + time proximity inside
one consumer process (src/processors/dex_processor.rs keeps a per-key
recent-event map); a distributed engine additionally needs the
*keyless* form — "which points fall inside which time intervals" — for
attribution windows, maintenance blackouts, and campaign joins.  Naive
``points JOIN intervals ON ts BETWEEN start AND end`` has no equi
conjunct, so Spark plans a BroadcastNestedLoopJoin (O(P·I) compares,
driver-OOM once the intervals side outgrows the broadcast threshold).

The scale form here turns the range predicate into an equi join:

- points map to ONE integer time bucket  ``floor(epoch(ts)/W)``;
- each interval explodes to the (few) buckets it overlaps
  ``sequence(floor(start/W), floor(end/W))`` — fan-out is bounded by
  ``len(interval)/W + 2``, so choosing W ≈ the typical interval length
  keeps it ≤ 2-3 rows per interval;
- an ordinary shuffled equi join on ``bucket`` (SMJ/SHJ — Catalyst
  picks; AQE handles hot-bucket skew) followed by the exact range
  refine ``start <= ts < end``.

Each (interval, point) pair meets in EXACTLY one bucket — the point's —
so no post-join dedup is needed.  Bucket coverage is safe under the
seconds truncation of ``unix_timestamp``: floor is monotone, so a
point's bucket always lies within [floor(start/W), floor(end/W)].

At 100 TB both sides stay fully distributed: the only shuffle is the
bucket equi join, partitioned by integer bucket (time-uniform unless
the event stream itself is bursty; AQE skew-join splits hot buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 1800,
    how: str = "inner",
    max_interval_s: int | None = None,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_ts < end_col`` (end-exclusive), as a bucketed
    equi join.  Returns the full cross of both frames' columns.

    ``bucket_s`` trades join fan-out (intervals explode to
    ``len/bucket_s + 2`` buckets) against candidate density (points
    per bucket); set it near the typical interval length.
    """
    if how != "inner":
        raise ValueError("bucketed_interval_join supports inner joins only")
    p_epoch = F.unix_timestamp(F.col(point_ts))
    s_epoch = F.unix_timestamp(F.col(start_col))
    e_epoch = F.unix_timestamp(F.col(end_col))

    pts = points.withColumn("_rj_bucket_p", F.floor(p_epoch / bucket_s))
    # drop empty/inverted intervals BEFORE the explode: they can match
    # nothing (the refine predicate is unsatisfiable), but a corrupt
    # end << start would make sequence() DESCEND and fan out |span|
    # spurious candidate rows
    ivs = intervals.where(F.col(end_col) > F.col(start_col)).withColumn(
        "_rj_bucket_i",
        F.explode(F.sequence(F.floor(s_epoch / bucket_s), F.floor(e_epoch / bucket_s))),
    )
    # the range refine lives INSIDE the join condition (not a post-join
    # filter): batch plans are identical either way (Catalyst pushes
    # the conjuncts into the join), but Structured Streaming needs the
    # event-time range in the condition to derive state watermarks for
    # stream-stream cleanup
    cond = (
        (F.col("_rj_bucket_p") == F.col("_rj_bucket_i"))
        & (F.col(start_col) <= F.col(point_ts))
        & (F.col(point_ts) < F.col(end_col))
    )
    if max_interval_s is not None:
        # redundant for results (implied by ts < end <= start + max)
        # but stated directly BETWEEN the two watermarked event-time
        # columns, which is what streaming state cleanup can reason
        # about; max_interval_s must bound every interval's length
        cond = cond & (
            F.col(point_ts)
            < F.col(start_col) + F.expr(f"INTERVAL {int(max_interval_s)} SECONDS")
        )
    joined = pts.join(ivs, on=cond, how="inner")
    return joined.drop("_rj_bucket_p", "_rj_bucket_i")


def interval_join_stream(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 1800,
    watermark_s: int = 300,
    max_interval_s: int = 1800,
) -> DataFrame:
    """Stream-stream form of :func:`bucketed_interval_join`.

    Both inputs are streaming DataFrames; watermarks on the point's
    event time and the interval's START bound the join state — Spark
    derives the per-side state retention from the event-time range
    conjuncts in the join condition, so a point's state expires once
    the interval watermark passes ``point_ts`` (it can no longer match
    any future interval) and vice versa.  The reference holds its
    correlation window in consumer memory (dex_processor.rs recent-
    event map); here the state store holds it, bounded by watermark +
    interval length instead of a hand-tuned capacity.
    """
    p = points.withWatermark(point_ts, f"{watermark_s} seconds")
    i = intervals.withWatermark(start_col, f"{watermark_s} seconds")
    return bucketed_interval_join(
        p,
        i,
        point_ts=point_ts,
        start_col=start_col,
        end_col=end_col,
        bucket_s=bucket_s,
        max_interval_s=max_interval_s,
    )
