"""Pure-stdlib media codecs: PNG (zlib) and WAV (wave).

No third-party image/audio library ships in this environment, but the
two workhorse interchange formats are simple enough to implement
directly from their PUBLIC specifications — PNG (RFC 2083 / ISO
15948: zlib-compressed filtered scanlines in an IDAT chunk) with
stdlib ``zlib`` + ``struct``, and WAV via the stdlib ``wave`` module.
That makes the multimodal operators' decode step REAL for the formats
a pipeline actually stages (screenshots, plots, speech clips), while
PIL — when installed — is preferred for everything else
(``multimodal.decode_image`` tries it first).

Decoder scope: 8-bit greyscale/RGB/RGBA, non-interlaced, all five
PNG filter types (None/Sub/Up/Average/Paeth).  Encoder emits filter-0
scanlines — maximally compatible, still genuine zlib-compressed PNG
that any external viewer opens.  Unfiltering runs vectorized per
scanline in numpy except the inherently sequential Sub/Paeth carry,
which runs per pixel-column (bounded by width, not pixels).
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_media(data: bytes) -> str | None:
    """Best-effort container sniff: 'png', 'wav', or None."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode HxW (grey), HxWx3 (RGB) or HxWx4 (RGBA) uint8 pixels."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), px.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode to HxWxC uint8 (C = 1, 3 or 4)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0:
        raise ValueError("decoder supports 8-bit non-interlaced PNG only")
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    stride = w * channels
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, lines = rows[:, 0], rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(h):
        f, cur = int(filters[y]), lines[y].astype(np.uint8).copy()
        prev = out[y - 1] if y else np.zeros(stride, np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: sequential carry along the row
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prev
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (
                    int(cur[x])
                    + int(_paeth(np.uint8(left), prev[x], np.uint8(ul)))
                ) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.reshape(h, w, channels)


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic choice: no
    interpolation arithmetic to disagree about across platforms)."""
    h, w = px.shape[:2]
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return px[yi][:, xi]


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode int16 PCM; shape (n,) mono or (n, channels)."""
    import wave

    s = np.asarray(samples, dtype=np.int16)
    ch = 1 if s.ndim == 1 else s.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode 16-bit PCM WAV to ((n, channels) int16, sample_rate)."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("decoder supports 16-bit PCM WAV only")
        ch, rate = wf.getnchannels(), wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return np.frombuffer(frames, np.int16).reshape(-1, ch), rate
