"""Per-epoch duration breakdown of the exactly-once streaming pipeline
at two parallelism levels — the scaling-diagnosis harness for the
north rule's N→4N criterion.

For each level it runs the bench pipeline (same config as bench.py's
stream worker) and prints, per micro-batch, the StreamingQueryProgress
`durationMs` components (addBatch = distributed work; the rest are
driver-side fixed costs: offset log, WAL commit, planning, source
listing) plus state-store commit time from stateOperators.  The sum of
driver-side components that DON'T shrink with cores bounds achievable
scaling: efficiency ≤ (serial + parallel) / (serial + parallel/4) / 4.

Usage: python scripts/profile_stream.py [replicas] [levels]
       (defaults: 120 replicas, levels 8,32)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitquery_kafka_streams_rust_spark import datagen
from bitquery_kafka_streams_rust_spark.config import (
    EngineConfig,
    FilterConfig,
    ProcessingConfig,
)
from bitquery_kafka_streams_rust_spark.session import get_spark
from bitquery_kafka_streams_rust_spark.streaming import pipeline as P

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 120
LEVELS = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "8,32").split(",")]
N_BATCHES = 8
PARTS_PER_BATCH = 16

DUR_KEYS = [
    "addBatch",        # distributed: scan+decode+dedup+sink write
    "getBatch",        # driver: source listing/plan
    "latestOffset",    # driver: admission
    "queryPlanning",   # driver
    "walCommit",       # driver: offset WAL fsync
    "commitOffsets",   # driver: commit log fsync
    "triggerExecution" # total
]


def run_level(in_dir: str, cores: int, tmp: str, tag: str) -> dict:
    # SPARK_GRAFT_PROFILE_PARTS pins shuffle/state partitions across
    # levels (strong scaling: same plan, more cores); default keeps the
    # historical partitions=cores behavior
    parts = int(os.environ.get("SPARK_GRAFT_PROFILE_PARTS", cores))
    mfpt = int(os.environ.get("SPARK_GRAFT_PROFILE_MFPT", PARTS_PER_BATCH * 4))
    extra = {}
    if os.environ.get("SPARK_GRAFT_PROFILE_CODEC"):
        extra["spark.sql.parquet.compression.codec"] = os.environ[
            "SPARK_GRAFT_PROFILE_CODEC"
        ]
    spark = get_spark(
        app_name=f"profile-{tag}", master=f"local[{cores}]",
        shuffle_partitions=parts, extra_conf=extra,
    )
    cfg = EngineConfig(
        processing=ProcessingConfig(
            max_files_per_trigger=mfpt, shuffle_partitions=parts
        ),
        filters=FilterConfig(source_allowlist=("pumpfun", "raydium", "orca"), min_n_tok=16),
        checkpoint_dir=f"{tmp}/ckpt_{tag}",
        output_dir=f"{tmp}/out_{tag}",
    ).validate()
    rp = P.start_pipeline(spark, in_dir, cfg, with_rollup=False)
    t0 = time.time()
    rp.process_all()
    wall = time.time() - t0
    # recentProgress yields StreamingQueryProgress objects; go through
    # their canonical JSON so this works on classic and connect sessions
    progress = [json.loads(p.json) for p in rp.events_query.recentProgress]
    rp.stop()
    spark.stop()

    epochs = []
    for p in progress:
        if p.get("numInputRows", 0) == 0 and not p.get("stateOperators"):
            continue
        d = p.get("durationMs", {})
        row = {k: d.get(k, 0) for k in DUR_KEYS}
        row["rows"] = p.get("numInputRows", 0)
        so = p.get("stateOperators") or []
        if so:
            row["stateCommit"] = so[0].get("commitTimeMs", 0)
            row["stateRows"] = so[0].get("numRowsTotal", 0)
            if os.environ.get("SPARK_GRAFT_PROFILE_STATE"):
                cm = so[0].get("customMetrics", {})
                row["custom"] = {k: v for k, v in sorted(cm.items()) if v}
        epochs.append(row)
    return {"cores": cores, "wall_s": round(wall, 2), "epochs": epochs}


def main() -> None:
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    in_dir = tempfile.mkdtemp(prefix="prof_in_", dir=scratch)
    tmp = tempfile.mkdtemp(prefix="prof_rt_", dir=scratch)
    spark = get_spark(app_name="profile-gen", master="local[32]", shuffle_partitions=32)
    n = datagen.write_spine_batches(
        spark, SF_DIR, in_dir, REPLICAS, N_BATCHES, parts_per_batch=PARTS_PER_BATCH
    )
    spark.stop()
    print(f"input rows: {n}", flush=True)

    # warmup at the highest level (JIT), then one measured run per level
    run_level(in_dir, LEVELS[-1], tmp, "warm")
    results = [run_level(in_dir, c, tmp, f"c{c}_{i}") for i, c in enumerate(LEVELS)]

    for r in results:
        print(f"\n=== local[{r['cores']}]  wall={r['wall_s']}s ===")
        hdr = ["rows"] + DUR_KEYS + ["stateCommit"]
        print(" | ".join(f"{h:>15}" for h in hdr))
        for e in r["epochs"]:
            print(" | ".join(f"{e.get(h, 0):>15}" for h in hdr))
        tot = {k: sum(e.get(k, 0) for e in r["epochs"]) for k in DUR_KEYS + ["stateCommit"]}
        print("TOTALS:", json.dumps(tot))
        for i, e in enumerate(r["epochs"]):
            if e.get("custom"):
                print(f"epoch{i} custom:", json.dumps(e["custom"]))
        serial = sum(tot[k] for k in ("getBatch", "latestOffset", "queryPlanning",
                                      "walCommit", "commitOffsets"))
        print(f"driver-serial total: {serial} ms; addBatch: {tot['addBatch']} ms; "
              f"trigger: {tot['triggerExecution']} ms")

    import shutil

    shutil.rmtree(in_dir, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
