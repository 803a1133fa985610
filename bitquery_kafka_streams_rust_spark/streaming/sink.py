"""Exactly-once idempotent sink with per-partition lineage manifests.

The reference is at-least-once *and lossy*: async offset commit after
processing (``CommitMode::Async``, ``src/consumer.rs:139-170``) plus a
dedup cache that clears at capacity (``src/consumer.rs:243-248``).
Here delivery is exactly-once (T7): the streaming checkpoint WAL
records source offsets per epoch, and the sink write is **idempotent in
``batchId``** — output lands under ``batch_id=<id>/`` with
dynamic-partition overwrite, so a replayed epoch overwrites itself
instead of duplicating.  This is the same idempotence contract an
Iceberg streaming append gives per commit snapshot; parquet +
partition-overwrite reproduces it without the connector jar.

Lineage (north rule): each epoch also writes
``_lineage/batch_<id>.json`` — row count, per-spark-partition row
counts, min/max event time — committed atomically-enough by
write-then-rename within the same ``foreachBatch``, keyed by batchId so
replays overwrite rather than append.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str, lineage: bool = True):
        self.out_dir = out_dir
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        self.lineage = lineage
        os.makedirs(self.lineage_dir, exist_ok=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            out = batch_df.withColumn("batch_id", F.lit(batch_id))
            if self.lineage:
                # one pass computes the manifest, a second writes — both
                # tiny compared to the shuffle-free append itself
                stats = (
                    out.groupBy(F.spark_partition_id().alias("pid"))
                    .agg(
                        F.count("*").alias("rows"),
                        F.min("ts").alias("min_ts"),
                        F.max("ts").alias("max_ts"),
                    )
                    .collect()
                )
            (
                out.write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(self.out_dir)
            )
            if self.lineage:
                manifest = {
                    "batch_id": batch_id,
                    "rows": int(sum(r["rows"] for r in stats)),
                    "partitions": [
                        {
                            "partition": int(r["pid"]),
                            "rows": int(r["rows"]),
                            "min_ts": str(r["min_ts"]),
                            "max_ts": str(r["max_ts"]),
                        }
                        for r in sorted(stats, key=lambda r: r["pid"])
                    ],
                }
                tmp = os.path.join(self.lineage_dir, f".batch_{batch_id}.json.tmp")
                dst = os.path.join(self.lineage_dir, f"batch_{batch_id}.json")
                with open(tmp, "w") as f:
                    json.dump(manifest, f, indent=1)
                os.replace(tmp, dst)  # atomic within the filesystem
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_output(spark, out_dir: str) -> DataFrame:
    """Read everything the sink has committed (all epochs)."""
    return spark.read.option("basePath", out_dir).parquet(out_dir + "/batch_id=*")


def read_lineage(out_dir: str) -> list[dict]:
    d = os.path.join(out_dir, "_lineage")
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("batch_") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out
