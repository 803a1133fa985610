"""Streaming source over the tokenized-sequences table.

Production target is an Iceberg table read as a stream (or Kafka with
``from_protobuf`` decode — S1, ``src/client.rs:223-273``); this sandbox
has neither connector jar, so the source is the file-stream reader over
parquet micro-batch files, which exercises the identical engine
machinery: offset tracking in the checkpoint WAL, admission control via
``maxFilesPerTrigger`` (the backpressure analog of the reference's
ResourceManager gate, ``src/resource_manager.rs:74-126`` — T3), and
deterministic replay.

Iceberg is gated behind an import-try: if ``spark.sql.catalog`` has an
iceberg catalog configured, ``read_stream`` can target it instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import SEQUENCES


def read_sequence_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming DataFrame of sequences from a directory of parquet
    batch files.  ``maxFilesPerTrigger=1`` makes one file = one
    micro-batch (the reference's batch_size/batch_timeout collector,
    ``src/batch_processor.rs:89-141`` — T1), and bounds per-trigger
    memory (T3 backpressure)."""
    return (
        spark.readStream.schema(SEQUENCES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")  # deterministic oldest-first order
        .parquet(path)
    )


def try_read_iceberg_stream(
    spark: SparkSession, table: str, **options
) -> DataFrame | None:
    """Production source: Iceberg streaming scan. Returns None when the
    Iceberg runtime jar isn't on the classpath (this sandbox)."""
    try:
        reader = spark.readStream.format("iceberg")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(table)
    except Exception:
        return None
