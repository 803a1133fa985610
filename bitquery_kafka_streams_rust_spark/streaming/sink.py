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

Lineage (north rule): each epoch writes ``_lineage/batch_<id>.json`` —
row count and event-time bounds captured via ``observe()`` **inside the
write job** (zero extra pass), plus per-output-file row counts read
from the parquet footers (the per-partition manifest, same shape as an
Iceberg manifest's data-file entries).  Written tmp→rename within the
same ``foreachBatch``, keyed by batchId, so replays overwrite rather
than append.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class ExactlyOnceParquetSink:
    def __init__(self, out_dir: str, lineage: bool = True):
        self.out_dir = out_dir
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        # The manifest writer uses driver-local filesystem IO; on an
        # object-store URI (s3://, gs://, hdfs://...) os/glob would
        # silently write manifests to a bogus LOCAL path — disable with
        # a warning instead.  Production object-store deployments get
        # lineage from the table format itself (Iceberg snapshot
        # manifests carry the same per-file rows/bounds); the data
        # write below handles URIs fine either way.
        if "://" in out_dir and lineage:
            import warnings

            warnings.warn(
                f"lineage manifests need a local filesystem path; disabled for {out_dir!r} "
                "(use an Iceberg/table-format sink for object-store lineage)",
                stacklevel=2,
            )
            lineage = False
        self.lineage = lineage
        if lineage:
            os.makedirs(self.lineage_dir, exist_ok=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # the writer-level partitionOverwriteMode option governs this
        # write; do NOT touch the session conf (two concurrent
        # foreachBatch sinks racing a set/restore would leave the
        # session permanently altered for unrelated writes)
        out = batch_df.withColumn("batch_id", F.lit(batch_id))
        obs = None
        if self.lineage and "ts" in batch_df.columns:
            obs = Observation(f"lineage_{batch_id}")
            out = out.observe(
                obs,
                F.count(F.lit(1)).alias("rows"),
                F.min("ts").alias("min_ts"),
                F.max("ts").alias("max_ts"),
            )
        (
            out.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.out_dir)
        )
        if self.lineage:
            self._write_manifest(batch_id, obs.get if obs else {})

    def _write_manifest(self, batch_id: int, totals: dict) -> None:
        files = []
        epoch_dir = os.path.join(self.out_dir, f"batch_id={batch_id}")
        try:
            import pyarrow.parquet as pq

            for p in sorted(glob.glob(os.path.join(epoch_dir, "*.parquet"))):
                md = pq.read_metadata(p)
                files.append(
                    {
                        "file": os.path.basename(p),
                        "rows": md.num_rows,
                        "bytes": os.path.getsize(p),
                    }
                )
        except Exception:  # footer read is best-effort; totals are authoritative
            pass
        mn, mx = totals.get("min_ts"), totals.get("max_ts")
        manifest = {
            "batch_id": batch_id,
            "rows": int(totals.get("rows", sum(f["rows"] for f in files))),
            # empty-batch epochs observe NULL bounds — keep the empty-
            # string sentinel rather than serializing the string "None"
            "min_ts": "" if mn is None else str(mn),
            "max_ts": "" if mx is None else str(mx),
            "files": files,
        }
        tmp = os.path.join(self.lineage_dir, f".batch_{batch_id}.json.tmp")
        dst = os.path.join(self.lineage_dir, f"batch_{batch_id}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, dst)  # atomic within the filesystem


def read_output(spark, out_dir: str, schema: str | None = None) -> DataFrame:
    """Read everything the sink has committed (all epochs).  When no
    epoch has produced rows yet, returns an empty frame of ``schema``
    (required then — there are no files to infer from)."""
    if not glob.glob(os.path.join(out_dir, "batch_id=*")):
        if schema is None:
            raise FileNotFoundError(
                f"no committed epochs under {out_dir}; pass schema= for an empty frame"
            )
        return spark.createDataFrame([], schema)
    return spark.read.option("basePath", out_dir).parquet(out_dir + "/batch_id=*")


def read_lineage(out_dir: str) -> list[dict]:
    d = os.path.join(out_dir, "_lineage")
    out = []
    for name in sorted(os.listdir(d)):
        if name.startswith("batch_") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out
