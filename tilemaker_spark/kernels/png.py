"""Minimal pure-Python PNG codec (RGB8) + deterministic synthetic pixels.

The BASELINE input is an image+caption table whose decoded pixels must be
allclose to the reference codec (PSNR >= 40 dB for lossy formats).  No
image libraries exist in this environment, so:

* PNG (lossless) is implemented for real — encode/decode round-trips
  bit-exact (PSNR = inf), via the public PNG spec (zlib + filter 0).
* JPEG decode is a clearly-marked STUB (`decode_jpeg_stub`): it
  deterministically regenerates the pixels from the id baked into the
  payload header, modelling a lossy codec by quantizing to 6 bits
  (PSNR ~= 44 dB vs the original), so the Spark-side plumbing — binary
  columns, Arrow batch shapes, PSNR checks — is fully exercised.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (filter 0, color type 2, 8-bit)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports filters 0-4, color type 2."""
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    i = 8
    w = h = 0
    idat = b""
    while i < len(data):
        (ln,) = struct.unpack(">I", data[i:i + 4])
        tag = data[i + 4:i + 8]
        payload = data[i + 8:i + 8 + ln]
        i += 12 + ln
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert bits == 8 and ctype == 2, "only RGB8 supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = zlib.decompress(idat)
    stride = w * 3
    # fast path: all rows filter 0 (what encode_png emits) -> one
    # vectorized reshape instead of a per-row unfilter loop; the decode
    # stage is the pipeline's hot loop
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    if not arr[:, 0].any():
        return arr[:, 1:].reshape(h, w, 3).copy()
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    prev = np.zeros(stride, np.int32)
    for row in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos:pos + stride], np.uint8).astype(np.int32)
        pos += stride
        if f == 0:
            rec = line
        elif f == 1:  # Sub
            rec = line.copy()
            for x in range(3, stride):
                rec[x] = (rec[x] + rec[x - 3]) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"filter {f}")
        out[row] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# Deterministic synthetic pixels + the stub lossy codec
# ---------------------------------------------------------------------------

def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image from an integer seed (PCG64)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return base


JPEG_STUB_MAGIC = b"FAKEJPG1"


def encode_jpeg_stub(seed: int, w: int, h: int) -> bytes:
    """STUB lossy format: header carries (seed, w, h); decode regenerates
    pixels quantized to 6 bits — a deterministic fake standing in for a real
    JPEG codec (none available in this container).  NOT a real JPEG."""
    return JPEG_STUB_MAGIC + struct.pack(">qII", seed, w, h)


def decode_jpeg_stub(data: bytes) -> np.ndarray:
    if data[:8] != JPEG_STUB_MAGIC:
        raise NotImplementedError(
            "real JPEG decoding is stubbed in this environment; only "
            "FAKEJPG1 payloads (deterministic synthetic) are supported"
        )
    seed, w, h = struct.unpack(">qII", data[8:24])
    px = synth_pixels(seed, w, h).astype(np.int32)
    return ((px >> 2) << 2).astype(np.uint8) + 2  # 6-bit quantization ~44dB


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        return decode_jpeg_stub(data)
    raise ValueError(f"unknown format {fmt}")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8 images; inf if equal."""
    # int16 diff / int32 square: exact integer math (255^2 fits int32)
    # at a quarter of the float64 path's memory traffic — the decode+
    # verify stage is bandwidth-bound at wide core counts
    d = a.astype(np.int16) - b.astype(np.int16)
    d32 = d.astype(np.int32)
    mse = float(np.mean(d32 * d32))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
