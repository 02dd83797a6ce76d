"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
``media_type`` and a metadata struct; per-batch Python work (decode,
feature extraction, resize, frame sampling) runs via ``mapInPandas``
so payloads move as Arrow record batches, never row-at-a-time.

The actual codec step is STUBBED: no image/audio libraries exist in
this environment, so ``decode_features`` computes a deterministic fake
feature vector from the raw bytes (and ``decode_real`` raises
``NotImplementedError`` where PIL/librosa would plug in).  Everything
around the stub — schema, Arrow batch shape, partition sizing,
metadata handling — is the real production plumbing and is tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image/audio/video
        StructField("payload", BinaryType(), False),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


def decode_real(payload: bytes, media_type: str):  # pragma: no cover
    """Where the real codec goes (PIL / torchaudio / pyav)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_features (deterministic stub) instead"
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector: bucketed
    byte histogram, normalized.  Replace with a real embedding model's
    output; shape and dtype are what downstream operators consume.

    numpy bincount, not a per-byte Python loop — the counts are the
    same exact integers (and the division the same IEEE op), but the
    inner loop runs in C, which is the difference between the Pandas
    UDF path being Arrow-fast and quietly CPU-bound in the worker."""
    if not payload:
        return [0.0] * dim
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    counts = np.bincount(arr % dim, minlength=dim)
    total = float(len(payload))
    return [c / total for c in counts.tolist()]


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` receives whole record batches; per-batch Python
    cost is amortized over thousands of rows, and the output schema is
    fixed so Catalyst can plan downstream operators normally.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyarrow as pa
        import pyarrow.compute as pc

        for pdf in batches:
            # Byte lengths via Arrow kernels (C loop), not a per-row
            # Python map; the only per-item Python left in the batch
            # body is the codec call itself — the one thing a real
            # decoder would also pay.
            n_bytes = pc.binary_length(
                pa.Array.from_pandas(pdf["payload"], type=pa.binary())
            ).to_numpy(zero_copy_only=False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(n_bytes, index=pdf.index, dtype="int64"),
                    "features": pdf["payload"].map(
                        lambda p: _fake_features(bytes(p), dim)
                    ),
                }
            )

    return media.mapInPandas(extract, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Arrow-batched image resize plumbing: images are re-encoded to
    (width, height), non-image rows pass through untouched.

    The pixel work is STUBBED (no PIL here): the fake "resize" scales
    the payload length proportionally to the pixel-count change, which
    preserves the property real code has — output size tracks target
    dimensions — so partition-sizing logic downstream is testable.
    Swap ``_fake_resize`` for ``PIL.Image.resize`` + re-encode in
    production; schema and batch shape stay identical.
    """

    def _fake_resize(payload: bytes, w0, h0) -> bytes:
        if not payload or not w0 or not h0:
            return payload or b""
        ratio = (width * height) / float(int(w0) * int(h0))
        n = max(1, int(len(payload) * ratio))
        reps = (n + len(payload) - 1) // len(payload)
        return (payload * reps)[:n]

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            out = pdf.copy()
            out.loc[is_img, "payload"] = pdf.loc[is_img].apply(
                lambda r: _fake_resize(
                    bytes(r["payload"]), r["meta_width"], r["meta_height"]
                ),
                axis=1,
            )
            out.loc[is_img, "meta_width"] = width
            out.loc[is_img, "meta_height"] = height
            yield out[[f.name for f in RESIZED_SCHEMA.fields]]

    return media.mapInPandas(work, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled timestamp (the decode of the actual frame is stubbed to a
    byte-slice).  Demonstrates the explode-shaped UDTF pattern."""
    videos = media.filter(F.col("media_type") == "video")
    frames = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest((F.col("meta_duration_ms") - 1) / every_ms, F.lit(0)).cast("int"),
        ),
        lambda i: i * every_ms,
    )
    return videos.select(
        "media_id",
        F.explode(frames).alias("frame_ts_ms"),
        F.length("payload").alias("n_bytes"),
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the driver's documents (text bytes as
    payload) — the test/demo source for the binary plumbing."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "video")
        .when(F.col("doc_id") % 3 == 1, "image")
        .otherwise("audio")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(640).alias("meta_width"),
        F.lit(480).alias("meta_height"),
        (F.col("n_chars") * 10).cast("int").alias("meta_duration_ms"),
    )
