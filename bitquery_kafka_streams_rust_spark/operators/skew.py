"""Skew handling — salted repartition + two-level aggregation.

The north rule requires explicit source-key skew handling: one hot
``source`` carries ~60% of rows (FIXTURES.md §1), which would
concentrate a stateful agg/shuffle partition on one task.  The
reference's analog is its fixed worker pool (``src/batch_processor.rs:
145-156``) which has the same problem and no fix.

Two tools:
- ``salted_repartition``: spread a hot key over ``salt_buckets``
  partitions keyed by (key, pmod(xxhash64(id), B)) — use *before*
  stateful per-key ops.
- ``two_level_agg``: partial agg on the salted key, then final agg on
  the real key — the classic skew-proof combine.  AQE's skew-join
  handling covers joins, but NOT stateful aggregation skew; this does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(id_col: str, buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)).cast("int")


def salted_repartition(
    df: DataFrame, key: str, id_col: str, buckets: int = 8, num_partitions: int | None = None
) -> DataFrame:
    df = df.withColumn("_salt", salt_col(id_col, buckets))
    if num_partitions:
        return df.repartition(num_partitions, F.col(key), F.col("_salt"))
    return df.repartition(F.col(key), F.col("_salt"))


def two_level_agg(
    df: DataFrame,
    key: str,
    id_col: str,
    aggs: dict[str, tuple[str, str]],
    buckets: int = 8,
) -> DataFrame:
    """Skew-proof groupBy(key): stage 1 groups by (key, salt) — hot key
    spreads over ``buckets`` tasks; stage 2 merges the ≤ buckets partials
    per key.  ``aggs`` maps output name → (function, input col), with
    function ∈ {count, sum, min, max}; avg is derived as sum/count so it
    re-merges correctly."""
    partial_aggs, final_aggs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_aggs.append(F.count("*").alias(f"_{name}"))
            final_aggs.append(F.sum(f"_{name}").alias(name))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"_{name}"))
            final_aggs.append(F.sum(f"_{name}").alias(name))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"_{name}"))
            final_aggs.append(F.min(f"_{name}").alias(name))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"_{name}"))
            final_aggs.append(F.max(f"_{name}").alias(name))
        else:
            raise ValueError(f"unsupported agg {fn}")
    stage1 = df.withColumn("_salt", salt_col(id_col, buckets)).groupBy(key, "_salt").agg(
        *partial_aggs
    )
    return stage1.groupBy(key).agg(*final_aggs)


def targeted_two_level_agg(
    df: DataFrame,
    key: str,
    id_col: str,
    aggs: dict[str, tuple[str, str]],
    hot_keys: Sequence | None = None,
    buckets: int = 8,
    mean_ratio: float = 4.0,
) -> DataFrame:
    """``two_level_agg`` that salts ONLY the hot keys.

    Uniform salting makes EVERY key emit up to ``buckets`` stage-1
    partials, multiplying the stage-2 exchange by ``buckets`` — wasted
    on the 10^9 cold keys that were never skewed.  Here cold keys get
    salt 0 (exactly one partial each, stage 2 is a pass-through merge)
    and only the detected hot keys fan out.

    ``hot_keys`` defaults to a count-min heavy-hitter detection pass
    (operators/sketches.py — fixed-size sketch scan + a metadata-sized
    collect; heavy hitters are few by definition).  Pass a precomputed
    list to skip the detection scan, e.g. from a previous batch of the
    same stream."""
    if hot_keys is None:
        from bitquery_kafka_streams_rust_spark.operators.sketches import heavy_hitters

        hot_keys = [r[key] for r in heavy_hitters(df, key, mean_ratio=mean_ratio).collect()]
    hot_keys = list(hot_keys)
    salt = (
        F.when(F.col(key).isin(hot_keys), salt_col(id_col, buckets))
        .otherwise(F.lit(0))
        if hot_keys
        else F.lit(0)
    )
    partial_aggs, final_aggs = [], []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            partial_aggs.append(F.count("*").alias(f"_{name}"))
            final_aggs.append(F.sum(f"_{name}").alias(name))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(f"_{name}"))
            final_aggs.append(F.sum(f"_{name}").alias(name))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(f"_{name}"))
            final_aggs.append(F.min(f"_{name}").alias(name))
        elif fn == "max":
            partial_aggs.append(F.max(col).alias(f"_{name}"))
            final_aggs.append(F.max(f"_{name}").alias(name))
        else:
            raise ValueError(f"unsupported agg {fn}")
    stage1 = df.withColumn("_salt", salt).groupBy(key, "_salt").agg(*partial_aggs)
    return stage1.groupBy(key).agg(*final_aggs)
