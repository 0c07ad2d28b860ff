"""Image payload codecs for the synthetic web (BASELINE.json input_hint).

The sandbox has no PIL/imageio, so:

* ``png``  — a REAL, spec-conformant PNG codec (8-bit RGB, filter 0) built on
  zlib. Lossless: decode(encode(px)) == px exactly.
* ``jpeg`` / ``webp`` — deterministic STAND-IN lossy codecs (clearly marked,
  per task instructions: "STUB the decode step behind ... a deterministic
  fake, and make the Spark-side plumbing real"). They quantize pixels to a
  fixed step and zlib-compress, so decode(encode(px)) differs from px by a
  bounded, deterministic error: step=4 → max abs err 2 → PSNR ≈ 45 dB;
  step=2 → max abs err 1 → PSNR ≈ 51 dB. Both clear the ≥40 dB gate, and the
  error is non-zero so the lossy PSNR path is genuinely exercised.

``phash64`` is a 64-bit average-hash (aHash): 8×8 block-mean downsample of
the grayscale image, thresholded at its mean, packed MSB-first into a signed
int64 — deterministic, numpy-only, recomputable inside the validation UDF
(SURVEY.md §2.8 X5).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FAKE_MAGIC = {"jpeg": b"FJPG", "webp": b"FWEB"}
_FAKE_STEP = {"jpeg": 4, "webp": 2}


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as a real RGB8 PNG (filter type 0)."""
    h, w, c = px.shape
    assert c == 3 and px.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raw = b"".join(b"\x00" + px[row].tobytes() for row in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG produced by :func:`encode_png` (filter-0 RGB8 only)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only RGB8 supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + 3 * w)
    if (arr[:, 0] != 0).any():
        raise ValueError("only filter 0 supported")
    return np.ascontiguousarray(arr[:, 1:]).reshape(h, w, 3)


def _encode_fake_lossy(px: np.ndarray, fmt: str) -> bytes:
    """DETERMINISTIC FAKE lossy codec (see module docstring — not real JPEG/WebP)."""
    h, w, _ = px.shape
    step = _FAKE_STEP[fmt]
    q = ((px.astype(np.uint16) + step // 2) // step).astype(np.uint8)  # quantize
    header = _FAKE_MAGIC[fmt] + struct.pack(">HHB", w, h, step)
    return header + zlib.compress(q.tobytes(), 6)


def _decode_fake_lossy(data: bytes, fmt: str) -> np.ndarray:
    if data[:4] != _FAKE_MAGIC[fmt]:
        raise ValueError(f"not a fake-{fmt} payload")
    w, h, step = struct.unpack(">HHB", data[4:9])
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8).reshape(h, w, 3)
    return np.minimum(q.astype(np.uint16) * step, 255).astype(np.uint8)


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(px)
    if fmt in _FAKE_MAGIC:
        return _encode_fake_lossy(px, fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt in _FAKE_MAGIC:
        return _decode_fake_lossy(data, fmt)
    raise ValueError(f"unknown fmt {fmt!r}")


def phash64(px: np.ndarray) -> int:
    """64-bit average-hash of an (h, w, 3) uint8 image, as signed int64.

    Grayscale (mean over channels) → 8×8 block means → threshold at the
    global mean of the 8×8 grid → 64 bits packed row-major MSB-first.
    """
    h, w, _ = px.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    # integer block sums: grid > grid.mean() ⇔ 64·block_sum > total_sum
    # (exact — no float rounding; each block sum ≤ 3·255·bh·bw « 2^63)
    s = px[: bh * 8, : bw * 8].sum(axis=2, dtype=np.int64)
    block = s.reshape(8, bh, 8, bw).sum(axis=(1, 3))
    bits = (block * 64 > block.sum()).ravel()
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")  # MSB-first, row-major
    return val - (1 << 64) if val >= (1 << 63) else val  # signed for Spark LongType


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images.

    Integer arithmetic for the MSE sum — exact (≤ 2^53) and ~3× faster than
    the float64 path; equal to the old float64 expression to within 1 ulp
    (the division is reordered: 255²·n/Σ vs 255²/(Σ/n))."""
    diff = a.astype(np.int32) - b.astype(np.int32)
    sq_sum = int((diff * diff).sum())
    if sq_sum == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 * diff.size / sq_sum))
