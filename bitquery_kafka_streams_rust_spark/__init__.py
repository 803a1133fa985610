"""bitquery_kafka_streams_rust_spark — a PySpark-native streaming/CEP engine.

A brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference Rust crate ``zola-streams``
(zisdeadbaby/bitquery-kafka-streams-rust): message filtering, payload
decoding, event extraction, dedup, windowing, backpressure and
exactly-once delivery — re-expressed as idiomatic DataFrame / Catalyst /
Structured Streaming over a table of pre-tokenized training sequences
``(doc_id string, tokens array<int>, n_tok int, source string, ts timestamp)``.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
- ``config``     validated engine config (mirrors reference src/config.rs)
- ``schemas``    canonical StructTypes (sequences, shards, events, blocks)
- ``datagen``    deterministic synthetic sequences/shards (seed-free arithmetic)
- ``functions``  token-array / text / encoding column builders + pandas UDFs
- ``operators``  filters, extraction, dedup, aggregates, similarity, skew
- ``streaming``  source, pipeline, exactly-once sink, keyed state, joins
- ``multimodal`` binary-column plumbing with stubbed decoders
- ``plans``      explain/plan-assertion helpers
"""

__version__ = "0.1.0"
