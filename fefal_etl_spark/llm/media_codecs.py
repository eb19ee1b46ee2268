"""Dependency-free image codecs for the E4 multimodal path (SURVEY.md §2.12).

The container has no PIL/torchaudio, so the "real decode" boundary of
``llm.multimodal`` is implemented here for two public, spec-simple formats:

- **BMP** (Windows device-independent bitmap, 24-bit uncompressed BI_RGB,
  BITMAPINFOHEADER): 14-byte file header + 40-byte info header + bottom-up
  BGR rows padded to 4 bytes. Format reference: the public BITMAPFILEHEADER/
  BITMAPINFOHEADER layout (MSDN / Wikipedia "BMP file format").
- **PPM** (Netpbm P6): ASCII ``P6 <w> <h> <maxval>`` header then raw RGB.

Both are lossless for 8-bit RGB, so encode→decode roundtrips bit-exactly —
which is what lets a DuckDB oracle verify the decoded pixel statistics
analytically when payloads are generated deterministically (see
``llm/queries.py::multimodal_decode``).

Everything is numpy-vectorized: decode is a ``frombuffer`` + reshape +
slice (no per-pixel Python), so it behaves inside Arrow-batched
``mapInPandas`` the way a C codec would — per-batch calls, zero Python
loops over pixels.
"""

from __future__ import annotations

import numpy as np

_BMP_FILE_HEADER = 14
_BMP_INFO_HEADER = 40


def _u16(v: int) -> bytes:
    return int(v).to_bytes(2, "little")


def _u32(v: int) -> bytes:
    return int(v).to_bytes(4, "little")


def _i32(v: int) -> bytes:
    return int(v).to_bytes(4, "little", signed=True)


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP bytes (bottom-up rows,
    BGR channel order, rows padded to 4-byte boundaries)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got shape {arr.shape}")
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    # RGB → BGR, top row last (bottom-up storage)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pixel_bytes = rows.tobytes()
    offset = _BMP_FILE_HEADER + _BMP_INFO_HEADER
    header = (
        b"BM"
        + _u32(offset + len(pixel_bytes))
        + _u16(0)
        + _u16(0)
        + _u32(offset)
        + _u32(_BMP_INFO_HEADER)
        + _i32(w)
        + _i32(h)  # positive → bottom-up
        + _u16(1)  # planes
        + _u16(24)  # bits per pixel
        + _u32(0)  # BI_RGB (uncompressed)
        + _u32(len(pixel_bytes))
        + _i32(2835)  # 72 DPI in pixels/metre
        + _i32(2835)
        + _u32(0)
        + _u32(0)
    )
    return header + pixel_bytes


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (H, W, 3) uint8 RGB array. Handles
    bottom-up (positive height) and top-down (negative height) storage."""
    buf = memoryview(data)
    if len(buf) < _BMP_FILE_HEADER + _BMP_INFO_HEADER or bytes(buf[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(buf[10:14], "little")
    header_size = int.from_bytes(buf[14:18], "little")
    if header_size < _BMP_INFO_HEADER:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    compression = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → binary PPM (P6, maxval 255)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got shape {arr.shape}")
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (H, W, 3) uint8 RGB. Tolerates comments and
    arbitrary whitespace in the header, per the Netpbm spec."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic + 3 ASCII ints separated by whitespace/comments, then
    # exactly ONE whitespace byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return arr.reshape(h, w, 3).copy()


def decode_image(data: bytes) -> np.ndarray:
    """Magic-byte dispatch to the right decoder → (H, W, 3) uint8 RGB."""
    if data is None or len(data) < 2:
        raise ValueError("empty payload")
    head = bytes(data[:2])
    if head == b"BM":
        return decode_bmp(data)
    if head == b"P6":
        return decode_ppm(data)
    raise ValueError(f"unrecognized image magic {head!r} (BMP and P6 PPM supported)")


def encode_like(arr: np.ndarray, template: bytes) -> bytes:
    """Re-encode in the same container the template payload used."""
    if bytes(template[:2]) == b"P6":
        return encode_ppm(arr)
    return encode_bmp(arr)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize with the floor mapping
    ``src_idx = dst_idx * src_dim // dst_dim`` — deterministic integer
    arithmetic, so an oracle can replicate it exactly in SQL."""
    h, w = arr.shape[:2]
    ys = np.arange(height) * h // height
    xs = np.arange(width) * w // width
    return arr[ys][:, xs]


def synth_image_array(seed: int, width: int, height: int) -> np.ndarray:
    """Deterministic test-pattern image: flat pixel k (row-major RGB) has
    value ``(seed*31 + k) % 256``. The closed form lets a SQL oracle verify
    decoded pixel statistics without running a decoder."""
    flat = (int(seed) * 31 + np.arange(width * height * 3)) % 256
    return flat.astype(np.uint8).reshape(height, width, 3)


# --------------------------------------------------------------------------
# WAV (RIFF / PCM) — the audio leg of the E4 decode boundary
# --------------------------------------------------------------------------
#
# Canonical 44-byte RIFF/WAVE layout (public spec: the Microsoft/IBM WAVE
# format, mirrored by every audio tool): "RIFF" <size> "WAVE" "fmt " chunk
# (PCM audio_format=1, channels, sample rate, byte rate, block align, bits)
# then a "data" chunk of little-endian samples. Only mono 16-bit PCM is
# implemented — the simplest honest decode path, same philosophy as the
# 24-bit BMP codec above.


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 sample array → mono 16-bit PCM WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim != 1:
        raise ValueError(f"expected 1-D int16 samples, got shape {samples.shape}")
    data = samples.tobytes()
    byte_rate = sample_rate * 2  # mono, 2 bytes/sample
    fmt = (
        b"fmt "
        + _u32(16)  # PCM fmt chunk is 16 bytes
        + _u16(1)  # audio_format = 1 (PCM, no compression)
        + _u16(1)  # channels (mono)
        + _u32(sample_rate)
        + _u32(byte_rate)
        + _u16(2)  # block align = channels * bytes/sample
        + _u16(16)  # bits per sample
    )
    body = b"WAVE" + fmt + b"data" + _u32(len(data)) + data
    return b"RIFF" + _u32(len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Mono 16-bit PCM WAV bytes → (int16 sample array, sample_rate).

    Walks the RIFF chunk list (tolerates extra chunks like LIST/INFO
    between fmt and data, per the spec) rather than assuming the canonical
    44-byte offset."""
    buf = memoryview(data)
    if len(buf) < 12 or bytes(buf[:4]) != b"RIFF" or bytes(buf[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_format != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    "only mono 16-bit PCM supported "
                    f"(fmt={audio_format}, ch={channels}, bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2").copy()
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, sample_rate


def synth_audio_array(seed: int, n_samples: int) -> np.ndarray:
    """Deterministic test waveform: sample k = ((seed*37 + k*k) % 4096)
    - 2048 — all-integer (no trig/float), so a SQL oracle reproduces frame
    energies exactly with ``unnest(range(...))`` arithmetic."""
    k = np.arange(int(n_samples), dtype=np.int64)
    return (((int(seed) * 37 + k * k) % 4096) - 2048).astype(np.int16)
