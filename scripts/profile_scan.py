"""Diagnose the flat N->4N streaming scaling (VERDICT round 1, item 3).

Isolates the map-side decode stage (validate + checksum over token
arrays) as a plain batch job over the same bench input files, at two
parallelism levels, and reports scan partition counts + wall times.
Also times the full streaming pipeline with a per-epoch durationMs
breakdown from recentProgress.

Usage: python scripts/profile_scan.py [replicas] [mode]
  mode: batch (default) | stream | both
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitquery_kafka_streams_rust_spark import datagen
from bitquery_kafka_streams_rust_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 40
MODE = sys.argv[2] if len(sys.argv) > 2 else "batch"


def gen_input() -> str:
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    in_dir = tempfile.mkdtemp(prefix="profile_scan_", dir=scratch)
    spark = get_spark(app_name="profile-gen", master="local[32]", shuffle_partitions=32)
    n = datagen.write_spine_batches(spark, SF_DIR, in_dir, REPLICAS, 8, parts_per_batch=16)
    spark.stop()
    print(f"input: {n} rows in {in_dir}", flush=True)
    return in_dir


def batch_decode(in_dir: str, cores: int, extra: dict | None = None) -> None:
    from pyspark.sql import functions as F

    from bitquery_kafka_streams_rust_spark.functions import tokens as TK

    spark = get_spark(
        app_name=f"profile-batch-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf=extra or {},
    )
    df = spark.read.parquet(in_dir)
    decoded = df.where(TK.is_valid_sequence("tokens", "n_tok")).select(
        "doc_id", "n_tok", "source", "ts", TK.token_checksum("tokens").alias("cksum")
    )
    nparts = decoded.rdd.getNumPartitions()
    for rnd in range(2):
        t0 = time.time()
        decoded.agg(F.sum("cksum"), F.count("*")).collect()
        print(
            f"[batch] cores={cores} extra={bool(extra)} scan_partitions={nparts} "
            f"round={rnd} wall={time.time()-t0:.2f}s",
            flush=True,
        )
    spark.stop()


def stream_run(in_dir: str, cores: int) -> None:
    import shutil

    from bitquery_kafka_streams_rust_spark.config import (
        EngineConfig,
        FilterConfig,
        ProcessingConfig,
    )
    from bitquery_kafka_streams_rust_spark.streaming import pipeline as P

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix=f"profile_stream_{cores}_", dir=scratch)
    spark = get_spark(
        app_name=f"profile-stream-{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    cfg = EngineConfig(
        processing=ProcessingConfig(max_files_per_trigger=64, shuffle_partitions=cores),
        filters=FilterConfig(source_allowlist=("pumpfun", "raydium", "orca"), min_n_tok=16),
        checkpoint_dir=f"{tmp}/ckpt",
        output_dir=f"{tmp}/out",
    ).validate()
    rp = P.start_pipeline(spark, in_dir, cfg, with_rollup=False)
    t0 = time.time()
    rp.process_all()
    wall = time.time() - t0
    for p in rp.events_query.recentProgress:
        d = p.get("durationMs", {})
        so = p.get("stateOperators") or []
        state = {
            k: so[0].get(k)
            for k in ("numRowsTotal", "commitTimeMs", "allUpdatesTimeMs", "timeTakenToRemoveMs")
            if so and k in so[0]
        } if so else {}
        print(
            f"[stream] cores={cores} batch={p.get('batchId')} rows={p.get('numInputRows')} "
            f"durations={json.dumps(d)} state={json.dumps(state)}",
            flush=True,
        )
    print(f"[stream] cores={cores} TOTAL wall={wall:.2f}s", flush=True)
    rp.stop()
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    in_dir = gen_input()
    try:
        if MODE in ("batch", "both"):
            for cores in (8, 32):
                batch_decode(in_dir, cores)
            # repeat with aggressive split settings
            split = {
                "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
                "spark.sql.files.openCostInBytes": str(1024 * 1024),
            }
            for cores in (8, 32):
                batch_decode(in_dir, cores, split)
        if MODE in ("stream", "both"):
            for cores in (8, 32):
                stream_run(in_dir, cores)
    finally:
        import shutil

        shutil.rmtree(in_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
