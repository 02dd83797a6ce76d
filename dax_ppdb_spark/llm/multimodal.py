"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
``media_type`` and a metadata struct; per-batch Python work (decode,
feature extraction, resize, frame sampling) runs via ``mapInPandas``
so payloads move as Arrow record batches, never row-at-a-time.

Codec tiers, innermost first:

1. **PIL** when importable (``decode_image`` tries it first) — the
   full-format production path, import-guarded because it is not in
   this environment;
2. **stdlib codecs** (:mod:`.codecs`): real PNG (zlib) and 16-bit-PCM
   WAV decode/encode implemented from the public specs — genuinely
   working decode/resize for the two workhorse staging formats;
3. **deterministic stub** for payloads that are not decodable media
   (``_fake_features`` byte histogram, ``_fake_resize`` size model) —
   the driver's oracle tables carry text-byte payloads by
   construction, so the registered queries replay tier 3 and stay
   engine-portable, while real media rides tiers 1-2.

Video container parsing (frame extraction) remains stubbed — there is
genuinely no demuxer here; ``sample_frames``'s timestamp arithmetic
and explode shape are the real plumbing.
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


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to HxWxC uint8: PIL when installed
    (every format), else the stdlib PNG decoder.  Raises
    ``NotImplementedError`` for formats neither tier handles (e.g.
    JPEG without PIL).

    The PIL tier falls THROUGH to the stdlib tier on any decode
    failure, not just ImportError: a corrupt or non-image payload
    raises ``PIL.UnidentifiedImageError`` (an OSError), and one bad
    row must degrade to the per-row fallback, never kill a whole
    Arrow batch."""
    try:
        from PIL import Image  # optional dependency

        import io as _io

        return np.asarray(Image.open(_io.BytesIO(bytes(payload))))
    except (ImportError, OSError, ValueError):
        pass
    from .codecs import decode_png, sniff_media

    if sniff_media(bytes(payload)) == "png":
        return decode_png(bytes(payload))
    raise NotImplementedError(
        "image format not decodable without PIL (stdlib tier handles PNG)"
    )


def decode_real(payload: bytes, media_type: str):
    """Dispatch a payload to its real decoder: images via
    :func:`decode_image` (PIL tier, then stdlib PNG), audio via the
    stdlib WAV decoder.  Video demux stays unimplemented (no container
    parser in this environment)."""
    from .codecs import decode_wav, sniff_media

    if media_type == "image":
        return decode_image(payload)
    if media_type == "audio" and sniff_media(bytes(payload)) == "wav":
        return decode_wav(bytes(payload))
    raise NotImplementedError(
        f"no decoder for media_type={media_type!r} payload in this environment"
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


def _media_features(payload: bytes, dim: int = 8) -> list[float]:
    """Feature vector for one payload: REAL stats when the payload is
    decodable media (PNG pixel stats, WAV sample stats — deterministic
    integer-derived arithmetic), the byte-histogram stub otherwise.
    Fixed length ``dim`` either way so the output schema is stable."""
    from .codecs import decode_png, decode_wav, sniff_media

    kind = sniff_media(payload)
    if kind == "png":
        px = decode_png(payload).astype(np.float64)
        h, w = px.shape[:2]
        c = px.shape[2]
        feats = [
            float(w),
            float(h),
            float(c),
            float(px.mean() / 255.0),
            float(px.std() / 255.0),
            float(px.min() / 255.0),
            float(px.max() / 255.0),
        ]
    elif kind == "wav":
        samples, rate = decode_wav(payload)
        s = samples.astype(np.float64) / 32768.0
        feats = [
            float(rate),
            float(samples.shape[0]),
            float(samples.shape[1]),
            float(s.mean()),
            float(np.sqrt((s * s).mean())),  # rms
            float(s.min()),
            float(s.max()),
        ]
    else:
        return _fake_features(payload, dim)
    return (feats + [0.0] * dim)[:dim]


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` receives whole record batches; per-batch Python
    cost is amortized over thousands of rows, and the output schema is
    fixed so Catalyst can plan downstream operators normally.  Real
    media (PNG/WAV — see :func:`_media_features`) gets decoded pixel/
    sample statistics; other payloads get the deterministic byte
    histogram the oracle replays.
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
                        lambda p: _media_features(bytes(p), dim)
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
    """Arrow-batched image resize: images are re-encoded to (width,
    height), non-image rows pass through untouched.

    Decodable images (PIL tier when installed, stdlib PNG otherwise)
    get a REAL nearest-neighbor resize and a PNG re-encode; payloads
    that are not decodable media fall back to the deterministic size
    model (output length tracks the pixel-count change) — which keeps
    the engine-portable oracle contract for the text-byte driver
    tables while real media takes the real path.
    """

    def _fake_resize(payload: bytes, w0, h0) -> bytes:
        if not payload or not w0 or not h0:
            return payload or b""
        ratio = (width * height) / float(int(w0) * int(h0))
        n = max(1, int(len(payload) * ratio))
        reps = (n + len(payload) - 1) // len(payload)
        return (payload * reps)[:n]

    def _resize_one(payload: bytes, w0, h0) -> bytes:
        from .codecs import encode_png, resize_nearest

        try:
            px = decode_image(payload)
        except (NotImplementedError, ValueError, OSError):
            # undecodable row (unknown format, corrupt bytes) degrades
            # to the deterministic stub — never kills the batch
            return _fake_resize(payload, w0, h0)
        return encode_png(resize_nearest(px, width, height))

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["media_type"] == "image"
            out = pdf.copy()
            out.loc[is_img, "payload"] = pdf.loc[is_img].apply(
                lambda r: _resize_one(
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
