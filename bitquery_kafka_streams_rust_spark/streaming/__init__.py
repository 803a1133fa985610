"""Structured Streaming spine: source, pipeline, exactly-once sink,
keyed CEP state, stream-stream joins, metrics listener."""
