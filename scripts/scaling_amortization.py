"""Streaming N→4N scaling efficiency vs INPUT SIZE — amortization evidence.

The north rule's two-cluster-size criterion is measured by bench.py at
~600k input rows, where fixed per-epoch costs (micro-batch planning,
state-store open/commit, progress bookkeeping — all flat in core
count, ~26-64 ms/partition/run per the state-partition sweep) are a
large fraction of total wall.  Fixed cost doesn't shrink when cores
quadruple, so it mechanically depresses the N→4N ratio at small
inputs.  A real 100 TB deployment runs epochs thousands of times
fatter, where the row-proportional work dominates.

This script reruns the IDENTICAL protocol (same pipeline, same fixed
state partitions at both levels, interleaved rounds, best-of-N,
heap provider) at 1x and 4x the bench's input and reports the
efficiency at each size.  Rising efficiency with input size is direct
evidence the shortfall is fixed-cost amortization + the VM's shared
memory bus — not plan structure.

Writes BENCH/amortization.json (rendered into BENCH/BASELINE.md by
bench.py's next run).  Run:  python scripts/scaling_amortization.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (constants + protocol parity)
from bitquery_kafka_streams_rust_spark import datagen  # noqa: E402
from bitquery_kafka_streams_rust_spark.config import (  # noqa: E402
    EngineConfig,
    FilterConfig,
    ProcessingConfig,
    auto_state_partitions,
)
from bitquery_kafka_streams_rust_spark.session import get_spark  # noqa: E402
from bitquery_kafka_streams_rust_spark.streaming import pipeline as P  # noqa: E402

LEVELS = [max(bench.CPUS // 4, 1), bench.CPUS]
ROUNDS = int(os.environ.get("SPARK_GRAFT_AMORT_RUNS", "3"))
SCALES = [1, 4]


def _measure(input_dir: str, n_input: int, tmp: str) -> dict:
    """bench._stream_scaling's cell loop, heap-only, both levels
    interleaved per round, best-of-ROUNDS."""
    parts = auto_state_partitions(n_input, LEVELS[-1])
    walls: dict[int, list[float]] = {}
    run_id = 0
    schedule = [LEVELS[-1]] + [c for _ in range(ROUNDS) for c in LEVELS]
    for i, cores in enumerate(schedule):
        spark = get_spark(
            app_name=f"amort-{cores}-{run_id}",
            master=f"local[{cores}]",
            shuffle_partitions=parts,
            extra_conf={
                "spark.sql.streaming.stateStore.providerClass": bench.HEAP_PROVIDER
            },
        )
        cfg = EngineConfig(
            processing=ProcessingConfig(
                max_files_per_trigger=bench.PARTS_PER_BATCH * 4,
                shuffle_partitions=parts,
                state_partitions=parts,
            ),
            filters=FilterConfig(
                source_allowlist=("pumpfun", "raydium", "orca"), min_n_tok=16
            ),
            checkpoint_dir=f"{tmp}/ckpt_{run_id}",
            output_dir=f"{tmp}/out_{run_id}",
        ).validate()
        rp = P.start_pipeline(spark, input_dir, cfg, with_rollup=False)
        t0 = time.time()
        rp.process_all()
        wall = time.time() - t0
        rp.stop()
        spark.stop()
        if i > 0:  # first run is JIT warm-up
            walls.setdefault(cores, []).append(wall)
        shutil.rmtree(f"{tmp}/ckpt_{run_id}", ignore_errors=True)
        shutil.rmtree(f"{tmp}/out_{run_id}", ignore_errors=True)
        run_id += 1
    n, n4 = (min(walls[c]) for c in LEVELS)
    eff = round((n_input / n4) / (n_input / n) / (LEVELS[1] / LEVELS[0]), 3)
    return {
        "input_rows": n_input,
        "state_parts": parts,
        "n_wall_s": round(n, 3),
        "4n_wall_s": round(n4, 3),
        "all_walls_s": {str(c): [round(w, 3) for w in ws] for c, ws in walls.items()},
        "4n_seq_per_s": round(n_input / n4, 1),
        "scaling_efficiency": eff,
    }


def main() -> None:
    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    results = []
    for scale in SCALES:
        in_dir = tempfile.mkdtemp(prefix=f"amort_in_{scale}x_", dir=scratch_root)
        tmp = tempfile.mkdtemp(prefix=f"amort_run_{scale}x_", dir=scratch_root)
        spark = get_spark(
            app_name="amort-datagen", master=f"local[{bench.CPUS}]",
            shuffle_partitions=bench.CPUS,
        )
        n_rows = datagen.write_spine_batches(
            spark, bench.SF_DIR, in_dir, bench.REPLICAS * scale, bench.N_BATCHES,
            parts_per_batch=bench.PARTS_PER_BATCH,
        )
        spark.stop()
        sys.stderr.write(f"[amort] {scale}x input: {n_rows} rows\n")
        r = {"scale": scale, **_measure(in_dir, n_rows, tmp)}
        sys.stderr.write(f"[amort] {scale}x result: {json.dumps(r)}\n")
        results.append(r)
        shutil.rmtree(in_dir, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "levels": LEVELS,
        "rounds_best_of": ROUNDS,
        "provider": "heap",
        "protocol": "identical plan both levels; state partitions fixed at the "
                    "auto-sized value for each input; interleaved rounds",
        "results": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/amortization.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
