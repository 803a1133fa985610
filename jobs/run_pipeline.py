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
    p.add_argument("--bloom-decontaminate", default=None, metavar="EVAL_PARQUET",
                   help="drop rows overlapping this eval sequences table by token "
                        "8-grams, via a map-side Bloom gate built at startup "
                        "(no join/shuffle/state; see dedup.bloom_words)")
    p.add_argument("--bloom-bits", type=int, default=1 << 20,
                   help="Bloom filter size in bits (~16x expected eval grams)")
    p.add_argument("--bloom-max-hits", type=int, default=16,
                   help="drop rows with >= this many probable-overlap grams "
                        "(size above grams_per_doc * fill_ratio^k)")
    p.add_argument("--metrics", default=None, help="JSONL metrics path")
    p.add_argument("--health-port", type=int, default=None, metavar="PORT",
                   help="serve /health /ready /live /metrics /version on "
                        "this driver-local port (0 = ephemeral)")
    p.add_argument("--quarantine", action="store_true",
                   help="route poison-pill rows (failed validation) to "
                        "<output>/quarantine with a reason column instead "
                        "of silently dropping them")
    p.add_argument("--continuous", action="store_true",
                   help="run until terminated (default: availableNow then exit)")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_config(a: argparse.Namespace, spark=None) -> EngineConfig:
    bloom_words_t = None
    if a.bloom_decontaminate:
        # one startup pass over the (small) eval corpus -> filter words;
        # the gate itself is then pure per-row expression work
        assert spark is not None, "--bloom-decontaminate needs the session"
        from pyspark.sql import functions as F

        from bitquery_kafka_streams_rust_spark.operators.dedup import (
            bloom_words,
            token_gram_hashes,
        )

        ev = spark.read.parquet(a.bloom_decontaminate)
        grams = ev.select(F.explode(token_gram_hashes("tokens", 8)).alias("g"))
        bloom_words_t = tuple(bloom_words(grams, m_bits=a.bloom_bits, k=4))
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
            bloom_gate=bloom_words_t,
            bloom_max_hits=a.bloom_max_hits,
        ),
        checkpoint_dir=a.checkpoint,
        output_dir=a.output,
    ).validate()  # fail-fast, mirrors Config::validate (src/config.rs:43-49)


def main(argv: list[str] | None = None) -> int:
    a = parse_args(argv)
    spark = get_spark(app_name="sequence-pipeline", master=a.master)
    cfg = build_config(a, spark)
    if a.metrics:
        spark.streams.addListener(JsonMetricsListener(a.metrics))
    health = None
    if a.health_port is not None:
        from bitquery_kafka_streams_rust_spark.streaming.health import HealthServer

        health = HealthServer(spark, port=a.health_port)
        print(f"[pipeline] health endpoints on port {health.start()}", flush=True)
    rp = P.start_pipeline(
        spark, a.input, cfg, with_rollup=True, available_now=not a.continuous,
        with_quarantine=a.quarantine,
    )
    try:
        if a.continuous:
            rp.events_query.awaitTermination()
        else:
            rp.process_all()
            rp.stop()
    finally:
        if health is not None:
            health.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
