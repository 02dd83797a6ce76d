"""Stdlib media codecs + the real decode/resize tiers of the
multimodal operators.

The PNG decoder is validated against hand-filtered streams for every
PNG filter type (the encoder only emits filter 0, so round-tripping
alone would not exercise Sub/Up/Average/Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from dax_ppdb_spark.llm.codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    resize_nearest,
    sniff_media,
)


def _rng(shape):
    # deterministic pseudo-random uint8 grid without RandomState
    idx = np.indices(shape).sum(axis=0)
    return ((idx * 89 + 17) % 251).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip(channels):
    shape = (13, 9) if channels == 1 else (13, 9, channels)
    px = _rng(shape)
    data = encode_png(px)
    assert sniff_media(data) == "png"
    out = decode_png(data)
    assert out.shape == (13, 9, channels)
    assert np.array_equal(out.reshape(px.shape), px)


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG whose scanlines use the GIVEN filter types by
    applying the spec's forward filters (RFC 2083 section 6)."""
    h, w, c = px.shape
    stride = w * c
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, f in enumerate(filters):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        line = np.zeros(stride, np.int32)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            ul = prev[x - c] if x >= c else 0
            up = prev[x]
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc_) else (up if pb <= pc_ else ul)
            line[x] = (cur[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(line.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_handles_all_filter_types():
    px = _rng((5, 7, 3))
    data = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), px)


def test_wav_roundtrip_and_sniff():
    t = np.arange(800)
    mono = (np.sin(t / 10.0) * 20000).astype(np.int16)
    data = encode_wav(mono, rate=8000)
    assert sniff_media(data) == "wav"
    samples, rate = decode_wav(data)
    assert rate == 8000
    assert samples.shape == (800, 1)
    assert np.array_equal(samples[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    s2, r2 = decode_wav(encode_wav(stereo, rate=44100))
    assert r2 == 44100 and np.array_equal(s2, stereo)


def test_resize_nearest_dims_and_identity():
    px = _rng((10, 20, 3))
    small = resize_nearest(px, 5, 4)
    assert small.shape == (4, 5, 3)
    assert np.array_equal(resize_nearest(px, 20, 10), px)


def test_sniff_rejects_text():
    assert sniff_media(b"hello world this is not media") is None


def test_resize_images_real_png_path(spark):
    """A REAL PNG payload through the Spark operator comes back as a
    genuine re-encoded PNG with the target dimensions."""
    from dax_ppdb_spark.llm.multimodal import resize_images

    px = _rng((12, 16, 3))
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(px)), 16, 12, None),
            (2, "image", bytearray(b"not media bytes"), 16, 12, None),
            (3, "audio", bytearray(b"untouched"), None, None, 100),
        ],
        "media_id LONG, media_type STRING, payload BINARY, "
        "meta_width INT, meta_height INT, meta_duration_ms INT",
    )
    rows = {r.media_id: r for r in resize_images(media, 8, 6).collect()}
    out_px = decode_png(bytes(rows[1].payload))
    assert out_px.shape == (6, 8, 3)
    assert np.array_equal(out_px, resize_nearest(px, 8, 6))
    assert rows[1].meta_width == 8 and rows[1].meta_height == 6
    # non-media image payload falls back to the size model
    assert rows[2].meta_width == 8
    # non-image rows pass through untouched
    assert bytes(rows[3].payload) == b"untouched"


def test_decode_features_real_media_stats(spark):
    from dax_ppdb_spark.llm.multimodal import decode_features

    px = _rng((4, 5, 3))
    wav = encode_wav((np.arange(200) % 1000).astype(np.int16), rate=16000)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(px)), 5, 4, None),
            (2, "audio", bytearray(wav), None, None, 100),
            (3, "image", bytearray(b"plain text payload"), 5, 4, None),
        ],
        "media_id LONG, media_type STRING, payload BINARY, "
        "meta_width INT, meta_height INT, meta_duration_ms INT",
    )
    rows = {r.media_id: r for r in decode_features(media, dim=8).collect()}
    # image features: [w, h, c, mean, std, min, max, 0]
    f1 = rows[1].features
    assert f1[:3] == [5.0, 4.0, 3.0]
    assert abs(f1[3] - px.mean() / 255.0) < 1e-9
    # audio features: [rate, n, channels, mean, rms, min, max, 0]
    f2 = rows[2].features
    assert f2[0] == 16000.0 and f2[1] == 200.0 and f2[2] == 1.0
    # undecodable payload keeps the byte-histogram stub
    f3 = rows[3].features
    assert abs(sum(f3) - 1.0) < 1e-9


def test_decode_real_dispatch():
    from dax_ppdb_spark.llm.multimodal import decode_real

    px = _rng((3, 3, 3))
    assert np.array_equal(decode_real(encode_png(px), "image"), px)
    samples, rate = decode_real(encode_wav(np.zeros(10, np.int16)), "audio")
    assert rate == 16000 and samples.shape == (10, 1)
    with pytest.raises(NotImplementedError):
        decode_real(b"some video bytes", "video")


def test_decode_image_pil_failure_falls_through(monkeypatch):
    """A corrupt/non-image payload under an installed PIL raises
    UnidentifiedImageError (an OSError) from Image.open; decode_image
    must fall through to the stdlib tier (and ultimately
    NotImplementedError), so _resize_one degrades one row to the stub
    instead of the OSError killing the whole Arrow batch."""
    import sys
    import types

    from dax_ppdb_spark.llm.multimodal import decode_image

    pil = types.ModuleType("PIL")
    img_mod = types.ModuleType("PIL.Image")

    class _Boom(OSError):  # PIL.UnidentifiedImageError subclasses OSError
        pass

    def _open(_fp):
        raise _Boom("cannot identify image file")

    img_mod.open = _open
    pil.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)

    with pytest.raises(NotImplementedError):
        decode_image(b"definitely not an image")
