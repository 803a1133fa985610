"""Multimodal columns — binary payloads with typed metadata.

Image/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators.  The actual codec libraries
(PIL/ffmpeg/librosa) are NOT in this container, so the decode kernels
are STUBBED behind an import-try with a deterministic fake — the
Spark-side plumbing (schema, batch iteration, partitioning, UDF
signatures) is real and tested, and swapping the stub for a real codec
changes one inner function.

Reference analog: the payload-decode stage D1-D4
(``src/core/utils/compression.rs``, ``src/consumer.rs:213-230``) — the
same "bytes in, typed rows out" shape, generalized beyond protobuf.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("byte_len", T.LongType(), False),
                    T.StructField("codec", T.StringType(), False),
                ]
            ),
            False,
        ),
    ]
)

FEATURES_SCHEMA = (
    "doc_id long, media_type string, byte_len long, width int, height int, "
    "n_frames int, ok boolean"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap the documents table as a media table
    (text bytes standing in for image payloads)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("byte_len"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes | None) -> tuple[int, int, int, bool]:
    """STUB decode: deterministic pseudo-dimensions from the byte length.

    Replace with e.g. ``PIL.Image.open(io.BytesIO(payload)).size`` when a
    codec library is available; the surrounding batch plumbing does not
    change."""
    try:
        import PIL.Image  # noqa: F401  (not present in this container)

        raise NotImplementedError("real decode path not wired in this sandbox")
    except ImportError:
        pass
    if payload is None:
        return 0, 0, 0, False
    n = len(payload)
    return (n % 640) + 1, ((n * 7) % 480) + 1, (n % 30) + 1, True


def extract_features(media: DataFrame) -> DataFrame:
    """Batch/stream feature extraction over the payload column.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    decode loop is per-row only INSIDE the batch (unavoidable for codec
    calls) while transport stays columnar.  Partitioning is preserved —
    no shuffle is introduced."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_frames": decoded.map(lambda t: t[2]),
                    "ok": decoded.map(lambda t: t[3]),
                }
            )

    return media.mapInPandas(op, schema=FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """1→N frame sampling: each payload yields n_frames//every_n rows —
    the multimodal twin of `explode_trades` (UDTF shape) as mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_key": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = _decode_image_stub(payload)[2]
                for i in range(0, n_frames, every_n):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    # stub "frame" = deterministic tag; real impl yields bytes
                    rows["frame_key"].append(int(doc_id) * 1000 + i)
            yield pd.DataFrame(rows)

    return media.mapInPandas(op, schema="doc_id long, frame_idx int, frame_key long")
