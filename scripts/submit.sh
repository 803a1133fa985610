#!/usr/bin/env bash
# Package the engine and submit to a cluster (north rule: spark-submit
# --py-files on a multi-executor cluster). Locally the same entry point
# runs with python directly — see jobs/run_pipeline.py.
set -euo pipefail
cd "$(dirname "$0")/.."

zip -qr /tmp/engine.zip bitquery_kafka_streams_rust_spark

exec spark-submit \
  --py-files /tmp/engine.zip \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-200}" \
  --conf spark.sql.streaming.stateStore.providerClass=org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider \
  jobs/run_pipeline.py "$@"
