"""Production job entry point — ship with spark-submit --py-files.

    zip -r engine.zip bitquery_kafka_streams_rust_spark
    spark-submit --py-files engine.zip jobs/run_pipeline.py \
        --input /data/sequences --checkpoint s3://ckpt --output s3://out \
        --sources pumpfun raydium orca --min-n-tok 16 --continuous

Local smoke (this sandbox):

    python jobs/run_pipeline.py --input <batch-dir> \
        --checkpoint /tmp/ck --output /tmp/out

Mirrors the reference's CLI service EP1 (``src/main.rs:59-104``):
config parse + validate fail-fast, then the streaming plan runs until
terminated; shutdown drains via query.stop() (T9) and resume from the
checkpoint is restart-identical.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bitquery_kafka_streams_rust_spark.config import (  # noqa: E402
    EngineConfig,
    FilterConfig,
    ProcessingConfig,
)
from bitquery_kafka_streams_rust_spark.session import get_spark  # noqa: E402
from bitquery_kafka_streams_rust_spark.streaming import pipeline as P  # noqa: E402
from bitquery_kafka_streams_rust_spark.streaming.listener import (  # noqa: E402
    JsonMetricsListener,
)


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="tokenized-sequence streaming pipeline")
    p.add_argument("--input", required=True, help="sequence batch dir (or Iceberg table)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--sources", nargs="*", default=[], help="source allowlist (empty=all)")
    p.add_argument("--min-n-tok", type=int, default=0)
    p.add_argument("--max-n-tok", type=int, default=None)
    p.add_argument("--watermark-s", type=int, default=300)
    p.add_argument("--window-s", type=int, default=600)
    p.add_argument("--max-files-per-trigger", type=int, default=1)
    p.add_argument("--trigger-ms", type=int, default=500)
    p.add_argument("--state-partitions", type=int, default=None,
                   help="streaming state/shuffle partitions (latched into the "
                        "checkpoint at first start); default: session setting")
    p.add_argument("--auto-state-keys", type=int, default=None, metavar="EST_KEYS",
                   help="size state partitions from an estimated live-key count "
                        "(config.auto_state_partitions: ceil(keys/100k) clamped "
                        "to [cores/4, cores]); overridden by --state-partitions")
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--continuous", action="store_true",
                   help="run until terminated (default: availableNow then exit)")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_config(a: argparse.Namespace) -> EngineConfig:
    state_parts = a.state_partitions
    if state_parts is None and a.auto_state_keys is not None:
        from bitquery_kafka_streams_rust_spark.config import auto_state_partitions

        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        state_parts = auto_state_partitions(a.auto_state_keys, cores)
    return EngineConfig(
        processing=ProcessingConfig(
            batch_timeout_ms=a.trigger_ms,
            max_files_per_trigger=a.max_files_per_trigger,
            watermark_delay_s=a.watermark_s,
            window_s=a.window_s,
            state_partitions=state_parts,
        ),
        filters=FilterConfig(
            source_allowlist=tuple(a.sources),
            min_n_tok=a.min_n_tok,
            max_n_tok=a.max_n_tok,
        ),
        checkpoint_dir=a.checkpoint,
        output_dir=a.output,
    ).validate()  # fail-fast, mirrors Config::validate (src/config.rs:43-49)


def main(argv: list[str] | None = None) -> int:
    a = parse_args(argv)
    cfg = build_config(a)
    spark = get_spark(app_name="sequence-pipeline", master=a.master)
    if a.metrics:
        spark.streams.addListener(JsonMetricsListener(a.metrics))
    rp = P.start_pipeline(
        spark, a.input, cfg, with_rollup=True, available_now=not a.continuous
    )
    if a.continuous:
        rp.events_query.awaitTermination()
    else:
        rp.process_all()
        rp.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
