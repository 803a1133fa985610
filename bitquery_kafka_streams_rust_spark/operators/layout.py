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

from pyspark.sql import DataFrame, SparkSession


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
