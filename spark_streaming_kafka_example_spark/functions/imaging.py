"""Pure-python/numpy image codec for the multimodal operators' REAL decode
path (no PIL/ffmpeg in this environment; everything here is stdlib zlib +
numpy, so the non-fake path works on any executor).

Supported formats:
- PNG, 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
  6 (RGBA); all five scanline filters; no interlace. Decode and encode.
- PPM/PGM binary (P6 RGB / P5 gray, maxval 255). Decode and encode.

These cover what a training-data pipeline's image columns actually need in
tests and give the mapInPandas/mapInArrow operators a genuine decode ->
ndarray -> feature/resize/re-encode path. Executors only ever see bytes in,
bytes/arrays out — all numpy, no per-pixel Python except the PNG unfilter's
per-scanline pass (filters 1/3/4 are sequential by definition).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "decode_image",
    "encode_png",
    "encode_ppm",
    "resize_nearest",
    "intensity_histogram",
    "average_hash",
    "difference_hash",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG or PPM/PGM bytes to a uint8 ndarray of shape (H, W, C).

    Raises ValueError on unrecognized or unsupported payloads — callers in
    the multimodal operators surface that as a decode failure for the row.
    """
    if data[:8] == _PNG_SIG:
        return _decode_png(data)
    if data[:2] in (b"P6", b"P5"):
        return _decode_ppm(data)
    raise ValueError("unrecognized image payload (expected PNG or PPM/PGM)")


# --- PNG -------------------------------------------------------------------


def _decode_png(data: bytes) -> np.ndarray:
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); supported: 8-bit gray/RGB/GA/RGBA"
        )
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        out[y] = _unfilter_line(line, prev, ftype, channels)
        prev = out[y]
    return out.reshape(height, width, channels)


def _unfilter_line(
    line: np.ndarray, prev: np.ndarray, ftype: int, bpp: int
) -> np.ndarray:
    if ftype == 0:  # None
        return line
    if ftype == 2:  # Up
        return (line.astype(np.int16) + prev).astype(np.uint8)
    # Sub/Average/Paeth need the already-reconstructed left neighbor, so the
    # scan is sequential in x (vectorized across channels via bpp slices).
    cur = line.astype(np.int16)
    prv = prev.astype(np.int16)
    n = len(line)
    for x in range(n):
        left = cur[x - bpp] if x >= bpp else 0
        up = prv[x]
        ul = prv[x - bpp] if x >= bpp else 0
        if ftype == 1:  # Sub
            cur[x] = (cur[x] + left) & 0xFF
        elif ftype == 3:  # Average
            cur[x] = (cur[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return cur.astype(np.uint8)


def _png_chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 (H, W) or (H, W, C) array (C in 1/2/3/4) as PNG
    (filter 0 scanlines — simple, valid, deterministic)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


# --- PPM / PGM -------------------------------------------------------------


def _decode_ppm(data: bytes) -> np.ndarray:
    channels = 3 if data[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pixels = np.frombuffer(data, dtype=np.uint8, count=w * h * channels, offset=pos)
    return pixels.reshape(h, w, channels).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode uint8 (H, W) as P5 or (H, W, 3) as P6."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    magic = {1: b"P5", 3: b"P6"}[c]
    header = magic + f"\n{w} {h}\n255\n".encode()
    return header + np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


# --- transforms ------------------------------------------------------------


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index math, so
    the result is bit-deterministic across platforms."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // max(height, 1), h - 1)
    xs = np.minimum((np.arange(width) * w) // max(width, 1), w - 1)
    return arr[ys][:, xs]


def _luminance(arr: np.ndarray) -> np.ndarray:
    """Mean-channel luminance as float64 (H, W) — shared by the histogram
    feature and the perceptual hashes so 'same content' means the same
    thing across all image operators."""
    return arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr.astype(np.float64)


def _pack_bits_hex(bits: np.ndarray) -> str:
    """Pack a flat 0/1 array (length divisible by 4) into a hex string in
    reading order: nibble j = bits[4j]*8 + bits[4j+1]*4 + bits[4j+2]*2 +
    bits[4j+3]. This layout makes hamming(hash_a, hash_b) equal the sum of
    bit_count over per-nibble XORs — the form both Spark (instr nibble
    arithmetic + bit_count) and DuckDB (strpos + xor + bit_count) replay
    exactly, so perceptual-hash dedup stays oracle-checkable."""
    nib = bits.reshape(-1, 4) @ np.array([8, 4, 2, 1])
    return "".join("0123456789abcdef"[int(v)] for v in nib)


def average_hash(arr: np.ndarray, hash_size: int = 8) -> str:
    """aHash perceptual fingerprint as a hex string of hash_size^2 bits:
    luminance -> nearest-resample to (hash_size, hash_size) -> bit i set
    iff pixel i (row-major) is STRICTLY above the mean of the resampled
    grid. Strict '>' is the cross-engine contract (a pixel equal to the
    mean is 0 in numpy, Spark, and DuckDB alike)."""
    small = resize_nearest(_luminance(arr), hash_size, hash_size)
    bits = (small > small.mean()).astype(np.int64).ravel()
    return _pack_bits_hex(bits)


def difference_hash(arr: np.ndarray, hash_size: int = 8) -> str:
    """dHash perceptual fingerprint as a hex string of hash_size^2 bits:
    luminance -> nearest-resample to (hash_size+1, hash_size) -> bit
    (r, c) set iff pixel[r, c+1] > pixel[r, c] (horizontal gradient sign).
    More robust than aHash to global brightness shifts."""
    small = resize_nearest(_luminance(arr), hash_size + 1, hash_size)
    bits = (small[:, 1:] > small[:, :-1]).astype(np.int64).ravel()
    return _pack_bits_hex(bits)


def intensity_histogram(arr: np.ndarray, bins: int) -> list[float]:
    """Real feature vector: normalized intensity histogram over ``bins``
    equal-width buckets of the mean-channel luminance. Deterministic, and a
    genuine (if simple) content descriptor — identical images get identical
    features, near-identical images get close ones."""
    lum = arr.astype(np.float64).mean(axis=2) if arr.ndim == 3 else arr
    hist, _ = np.histogram(lum, bins=bins, range=(0.0, 256.0))
    return (hist / max(lum.size, 1)).tolist()
