"""RIFF container codecs: WAV (16-bit PCM) and AVI (Motion-JPEG).

Pure numpy/stdlib implementations of the public Microsoft RIFF
specifications (WAVE PCM and the AVI 1.0 `hdrl`/`movi`/`idx1` layout).
No media libraries exist in this container, but unlike the usual
stubbed multimodal path both codecs here are REAL: WAV round-trips are
bit-exact, and AVI video frames are genuine baseline-JFIF images
produced/consumed by :mod:`kernels.jpeg` — so the video operators
(operators/media.py) exercise a true container-parse -> frame-decode ->
pixel-verify pipeline.

Reference scope: systemed/tilemaker has no media pipeline; these
kernels back the training-data-pipeline operator family the graft adds
on the image axis (BASELINE.json input_hint: opaque binary + typed
metadata columns).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE, canonical 16-bit mono PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Canonical RIFF/WAVE container around 16-bit mono PCM samples."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        1,                  # wFormatTag = WAVE_FORMAT_PCM
        1,                  # nChannels (mono)
        sample_rate,        # nSamplesPerSec
        sample_rate * 2,    # nAvgBytesPerSec
        2,                  # nBlockAlign
        16,                 # wBitsPerSample
    )
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE file -> (int16 sample array, sample_rate).

    Walks the chunk list (tolerates extra chunks such as LIST/INFO);
    requires 16-bit mono PCM, the only profile :func:`encode_wav`
    emits."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    sample_rate = None
    samples = None
    while pos + 8 <= min(end, len(data)):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        payload = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            wf, ch, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if (wf, ch, bits) != (1, 1, 16):
                raise ValueError(
                    f"unsupported WAV profile fmt={wf} ch={ch} bits={bits}")
        elif tag == b"data":
            samples = np.frombuffer(payload, dtype="<i2")
        pos += 8 + size + (size & 1)   # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt /data chunk")
    return samples, sample_rate


# ---------------------------------------------------------------------------
# AVI (RIFF/'AVI ', single MJPG video stream)
# ---------------------------------------------------------------------------

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(tag: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return tag + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(frames: list[bytes], fps: int, w: int, h: int) -> bytes:
    """RIFF/'AVI ' container with one 'vids'/'MJPG' stream.

    Every element of ``frames`` is a complete baseline-JFIF image
    (kernels/jpeg.py); each becomes a '00dc' movi chunk, indexed in a
    standard idx1 (every MJPEG frame is a keyframe)."""
    max_size = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // max(fps, 1),   # dwMicroSecPerFrame
        max_size * fps,             # dwMaxBytesPerSec (upper bound)
        0,                          # dwPaddingGranularity
        _AVIF_HASINDEX,             # dwFlags
        len(frames),                # dwTotalFrames
        0,                          # dwInitialFrames
        1,                          # dwStreams
        max_size,                   # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H",
        0, 0, 0,                    # dwFlags, wPriority, wLanguage
        0,                          # dwInitialFrames
        1, fps,                     # dwScale, dwRate -> fps = rate/scale
        0, len(frames),             # dwStart, dwLength (frames)
        max_size,                   # dwSuggestedBufferSize
        0xFFFFFFFF, 0,              # dwQuality, dwSampleSize
        0, 0, w, h))                # rcFrame
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_chunks, idx, off = [], [], 4   # offsets relative to 'movi' fourcc
    for f in frames:
        ck = _chunk(b"00dc", f)
        movi_chunks.append(ck)
        idx.append(struct.pack("<4sIII", b"00dc", _AVIIF_KEYFRAME,
                               off, len(f)))
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_chunks))
    idx1 = _chunk(b"idx1", b"".join(idx))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi_header(data: bytes) -> dict:
    """Parse only the hdrl metadata (no frame bytes touched):
    {n_frames, fps, w, h, codec}.  This is the cheap metadata-scan path
    — a 100 TB corpus can be profiled without decoding a single frame."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    meta: dict = {}

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi and len(meta) < 5:
            tag = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            if tag == b"LIST":
                kind = data[pos + 8:pos + 12]
                if kind in (b"hdrl", b"strl"):
                    walk(pos + 12, pos + 8 + size)
            elif tag == b"avih":
                a = struct.unpack("<10I", data[pos + 8:pos + 48])
                meta["n_frames"], meta["w"], meta["h"] = a[4], a[8], a[9]
            elif tag == b"strh":
                if data[pos + 8:pos + 12] == b"vids":
                    meta["codec"] = data[pos + 12:pos + 16].decode("ascii")
                    scale, rate = struct.unpack(
                        "<II", data[pos + 28:pos + 36])
                    meta["fps"] = rate // max(scale, 1)
            pos += 8 + size + (size & 1)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    if "n_frames" not in meta or "fps" not in meta:
        raise ValueError("missing avih/strh")
    return meta


def avi_frames(data: bytes, wanted: set[int] | None = None) -> dict[int, bytes]:
    """Extract '00dc' frame payloads by index -> {idx: jpeg_bytes}.

    With ``wanted`` only those frames' bytes are sliced out — the movi
    walk reads 8-byte chunk headers and skips everything else, so
    sampling k of n frames costs O(n) header reads + O(k) payload
    copies, not a full demux."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    out: dict[int, bytes] = {}
    end = min(8 + struct.unpack("<I", data[4:8])[0], len(data))
    pos = 12
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag == b"LIST" and data[pos + 8:pos + 12] == b"movi":
            mpos, mend = pos + 12, pos + 8 + size
            i = 0
            while mpos + 8 <= mend:
                ctag = data[mpos:mpos + 4]
                csize = struct.unpack("<I", data[mpos + 4:mpos + 8])[0]
                if ctag == b"00dc":
                    if wanted is None or i in wanted:
                        out[i] = data[mpos + 8:mpos + 8 + csize]
                    i += 1
                mpos += 8 + csize + (csize & 1)
            break
        pos += 8 + size + (size & 1)
    return out


# ---------------------------------------------------------------------------
# Deterministic synthetic PCM (SQL-twin-expressible)
# ---------------------------------------------------------------------------

def synth_audio_samples(seed: int, n: int) -> np.ndarray:
    """Deterministic int16 PCM from pure int64 arithmetic, chosen so a
    DuckDB oracle can regenerate the exact samples with the same
    closed-form expression (no float trig, no RNG state):

        v(j) = ((seed*1103515245 + j*12345 + 6789) mod 2^31) mod 4096 - 2048
    """
    j = np.arange(n, dtype=np.int64)
    v = (np.int64(seed) * 1103515245 + j * 12345 + 6789) % 2147483648
    return (v % 4096 - 2048).astype(np.int16)
