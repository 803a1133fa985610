"""Sources — Kafka (production), Iceberg (production), files (sandbox).

The reference consumes SASL/SSL Kafka topics of protobuf block messages
(S1, ``src/client.rs:223-273``) with a topic router (S3,
``src/consumer.rs:213-230``).  Here each source yields the same
streaming DataFrame shape, so the pipeline is source-agnostic:

- ``kafka_stream``: readStream.format("kafka") with the reference's
  fetch tuning mapped to Spark options; decode via ``from_protobuf``
  (D4) when a descriptor file is provided, else the engine's binary
  token codec.  Gated: the kafka connector jar is not in this sandbox,
  so construction errors surface as a clear RuntimeError.
- ``read_sequence_stream`` (streaming/source.py): parquet file stream —
  the sandbox stand-in exercising identical engine machinery.
- ``protowire`` (sibling module): jar-free proto3 wire-format codec for
  the three reference block-message shapes — the D4 decode path that
  runs with zero external dependencies (``decode_protobuf`` below stays
  the connector-jar production path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(
    brokers: str,
    topics: list[str],
    *,
    username: str | None = None,
    password: str | None = None,
    max_offsets_per_trigger: int | None = 100_000,
) -> dict[str, str]:
    """Option map mirroring the reference's consumer tuning
    (``src/client.rs:243-245``: 1 MB/partition fetch, 500 ms max wait)
    and SASL_SSL SCRAM-SHA-512 auth (``src/client.rs:234-241``).
    Offset admission (maxOffsetsPerTrigger) is the backpressure analog
    of ResourceManager's in-flight cap (T3)."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": ",".join(topics),
        "startingOffsets": "latest",
        "kafka.max.partition.fetch.bytes": str(1_048_576),
        "kafka.fetch.max.wait.ms": "500",
        "failOnDataLoss": "false",  # poison-pill resilience (D5)
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if username and password:
        opts["kafka.security.protocol"] = "SASL_SSL"
        opts["kafka.sasl.mechanism"] = "SCRAM-SHA-512"
        opts["kafka.sasl.jaas.config"] = (
            "org.apache.kafka.common.security.scram.ScramLoginModule required "
            f'username="{username}" password="{password}";'
        )
    return opts


def kafka_stream(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Raw Kafka stream: (topic, partition, offset, key, value, timestamp).

    Raises RuntimeError when the kafka connector jar is absent (this
    sandbox) — callers fall back to the file source."""
    try:
        reader = spark.readStream.format("kafka")
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load()
    except Exception as e:  # jar missing → AnalysisException at load()
        raise RuntimeError(
            "kafka source unavailable (spark-sql-kafka jar not on classpath); "
            "use streaming.source.read_sequence_stream instead"
        ) from e


def route_topics(raw: DataFrame, topic_map: dict[str, str]) -> DataFrame:
    """S3 topic router as a column: unknown topics → NULL → filtered,
    matching the reference's skip-and-continue (``consumer.rs:226-229``)."""
    col = None
    for topic, tag in topic_map.items():
        branch = F.when(F.col("topic") == topic, tag)
        col = branch if col is None else col.when(F.col("topic") == topic, tag)
    return raw.withColumn("source", col).where(F.col("source").isNotNull())


def decode_protobuf(raw: DataFrame, message_name: str, descriptor_file: str) -> DataFrame:
    """D4: value bytes → typed struct via from_protobuf (Spark ≥3.4).

    Permissive: undecodable payloads become NULL structs and are
    filtered — the reference's log-count-commit-continue (D5,
    ``consumer.rs:152-158``)."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("spark protobuf module unavailable") from e
    try:
        decoded = raw.withColumn(
            "msg",
            from_protobuf(F.col("value"), message_name, descFilePath=descriptor_file,
                          options={"mode": "PERMISSIVE"}),
        )
        return decoded.where(F.col("msg").isNotNull())
    except Exception as e:
        if "PROTOBUF_NOT_LOADED" in str(e):
            # the spark-protobuf connector jar is a separate module not on
            # this classpath; production runs add
            # --packages org.apache.spark:spark-protobuf_2.13:<ver>
            raise RuntimeError(
                "spark-protobuf jar not on classpath; launch with "
                "--packages org.apache.spark:spark-protobuf_2.13 or use "
                "decoded_token_stream for binary token payloads"
            ) from e
        raise


def decoded_token_stream(raw: DataFrame) -> DataFrame:
    """Kafka value bytes → sequences rows via the engine's vectorized
    binary token codec (functions/tokens.py) — the D1-D3 analog when
    payloads are LE-int32 token arrays (optionally zlib)."""
    from ..functions.tokens import decode_tokens

    out = raw.select(
        F.col("key").cast("string").alias("doc_id"),
        decode_tokens(F.col("value")).alias("tokens"),
        F.col("topic").alias("source"),
        F.col("timestamp").alias("ts"),
    )
    return (
        out.where(F.col("tokens").isNotNull())  # poison pills out (D5)
        .withColumn("n_tok", F.size("tokens"))
        .select("doc_id", "tokens", "n_tok", "source", "ts")
    )
