"""Physical table layout — bucketed/sorted writes for shuffle-free joins.

At 100 TB the dominant cost of the join/agg family is the exchange.
Spark's native bucketing removes it for *repeated* keys: write both
tables bucketed (and sorted) by the join key and every subsequent join
or aggregation on that key is planned WITHOUT an Exchange — the scan
itself delivers hash-co-located partitions (`spark.sql.sources.
bucketing.enabled`, on by default).  This is the batch analog of the
reference's partition-by-key consumer assignment (``src/client.rs``
partition routing): the co-location is decided once at write time and
amortized over every downstream query.

Rules of thumb encoded here:
- bucket count is chosen once per table and must MATCH across tables
  that join (Spark only elides both exchanges when bucket counts are
  equal; a mismatch still elides the larger side on 4.x only when one
  is a multiple of the other and
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set).
- ``sortBy`` the same key: sort-merge join then skips its Sort too —
  the join degenerates to a zipper merge over pre-sorted bucket files.
- buckets should hold ~128 MB-1 GB each at production scale; at
  10^9 keys/TB that's thousands of buckets, far below the 100k cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    sort: bool = True,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and by default bucket-sorted)
    parquet table in the session catalog.  ``path`` makes it external.

    Bucketing metadata lives in the catalog, so the table must be
    written with ``saveAsTable`` — a bare ``.parquet(path)`` write
    silently drops the bucket spec (reading such files back gets no
    co-location guarantee)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.  With
    matching layouts Catalyst plans this with ZERO Exchange (and zero
    Sort when both were written ``sortBy`` the key) — verify with
    ``assert "Exchange" not in df._jdf.queryExecution().executedPlan()
    .toString()`` (pinned in tests/test_layout.py)."""
    return spark.table(left_table).join(spark.table(right_table), on)


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave ``k`` non-negative integer
    columns, ``bits`` low bits each — bit ``i`` of column ``j`` lands
    at position ``i*k + j``.

    Sorting/range-partitioning by this key clusters rows into
    multi-dimensional tiles, so per-file min/max stats stay tight on
    EVERY interleaved dimension at once — a predicate on any of them
    prunes files (the Delta/Iceberg OPTIMIZE ZORDER trick; a linear
    sort keeps only its leading column prunable).  Pure Catalyst
    integer expression, portable (the DuckDB oracle inlines it)."""
    k = len(cols)

    def make_spread(v: Column, j: int):
        # closure-bound v/j, NOT default args: a HOF lambda's arity is
        # its DECLARED parameter count
        def spread(acc: Column, i: Column) -> Column:
            # bit i of v -> position i*k + j
            bit = F.call_function("shiftright", v, i.cast("int")).bitwiseAND(F.lit(1))
            return acc.bitwiseOR(
                F.call_function("shiftleft", bit, (i.cast("int") * k + j).cast("int"))
            )

        return spread

    parts = [
        F.aggregate(
            F.sequence(F.lit(0), F.lit(bits - 1)),
            F.lit(0).cast("long"),
            make_spread(c.cast("long"), j),
        )
        for j, c in enumerate(cols)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    *,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the Z-order key of ``cols`` — each file covers one tile
    of the key space, so parquet footer min/max stats prune on every
    ``cols`` dimension.  The one shuffle is the range partitioning
    (sampled bounds, balanced files); the sort is within-partition."""
    z = zorder_key([F.col(c) for c in cols], bits).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_stats(spark: SparkSession, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max for ``cols`` — the data-skipping manifest a
    table format keeps in metadata (here recomputed by scan; one
    partial-aggregated pass grouped by ``input_file_name``).  Feed a
    predicate against this to decide which files a query must read."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return df.groupBy("_f").agg(*aggs)


def pruned_read(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple],
    *,
    manifest: DataFrame | None = None,
) -> DataFrame:
    """Read only the files whose min/max stats can contain rows in
    ``ranges`` ({col: (lo, hi)} inclusive), then apply the residual
    filter — the query side of the data-skipping manifest (a table
    format does this in its planner from metadata; here the manifest is
    ``file_stats`` output, precomputed and passed in, or recomputed).

    The manifest is file-count-sized metadata: collecting it driver-side
    is the same class as Iceberg's manifest scan.  On a ``write_zordered``
    table EVERY interleaved dimension prunes; on a linearly-sorted table
    only the leading one does."""
    mf = manifest if manifest is not None else file_stats(spark, path, list(ranges))
    cond = F.lit(True)
    for c, (lo, hi) in ranges.items():
        cond = cond & (F.col(f"{c}_max") >= F.lit(lo)) & (F.col(f"{c}_min") <= F.lit(hi))
    files = [r["_f"] for r in mf.where(cond).select("_f").collect()]
    residual = None
    for c, (lo, hi) in ranges.items():
        p = F.col(c).between(F.lit(lo), F.lit(hi))
        residual = p if residual is None else residual & p
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*files).where(residual)
