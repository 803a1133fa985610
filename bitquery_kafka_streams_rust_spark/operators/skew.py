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
