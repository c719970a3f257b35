"""Minimal PNG encoder + raster primitives (stdlib zlib only).

The sandbox has no matplotlib/PIL, and PNG is a small public spec
(RFC 2083): signature, IHDR, zlib-compressed IDAT scanlines (filter 0),
IEND. This gives visplot/implot real figure files with zero
dependencies; on a matplotlib-equipped cluster the plotting layer
(operators/plotting.py) prefers matplotlib automatically.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# 8-bit channel count -> IHDR color type (gray, RGB, gray+alpha, RGBA)
_CT_BY_CHANNELS = {1: 0, 3: 2, 2: 4, 4: 6}
_CHANNELS_BY_CT = {v: k for k, v in _CT_BY_CHANNELS.items()}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload)))


def png_bytes(arr: np.ndarray) -> bytes:
    """Encode an 8-bit array as PNG bytes: (H, W) gray, (H, W, 2)
    gray+alpha, (H, W, 3) RGB, or (H, W, 4) RGBA; filter 0 scanlines."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    if arr.ndim not in (2, 3) or ch not in _CT_BY_CHANNELS:
        raise ValueError(f"expected 8-bit gray/GA/RGB/RGBA, got {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CT_BY_CHANNELS[ch], 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)],
        axis=1).tobytes()  # filter byte 0 per scanline
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6)) + _chunk(b"IEND", b""))


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as a PNG file."""
    if np.asarray(rgb).ndim != 3 or np.asarray(rgb).shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {np.asarray(rgb).shape}")
    with open(path, "wb") as f:
        f.write(png_bytes(rgb))


def decode_png(blob: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder (critical chunks, 8-bit gray / gray+alpha
    / RGB / RGBA, non-interlaced): chunk walk to IHDR/IDAT, one zlib
    inflate, then the five spec scanline filters (None/Sub/Up/Average/
    Paeth) undone row by row. Ancillary chunks are skipped; palette,
    16-bit, and Adam7 raise NotImplementedError. Returns (h, w) for
    gray, (h, w, ch) otherwise."""
    if blob[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    w = h = None
    ct = 0
    idat: list[bytes] = []
    i = 8
    while i + 8 <= len(blob):
        ln = int.from_bytes(blob[i:i + 4], "big")
        tag = blob[i + 4:i + 8]
        body = blob[i + 8:i + 8 + ln]
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ct, interlace = body[8], body[9], body[12]
            if depth != 8:
                raise NotImplementedError("only 8-bit PNG supported")
            if interlace != 0:
                raise NotImplementedError("Adam7 interlace not supported")
            if ct not in _CHANNELS_BY_CT:  # ct 3 = palette
                raise NotImplementedError(f"PNG color type {ct} not supported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        i += 12 + ln  # len + tag + payload + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _CHANNELS_BY_CT[ct]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.int32)
    for r in range(h):
        f, cur = int(rows[r, 0]), rows[r, 1:].astype(np.int32)
        up = out[r - 1] if r else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = (cur + up) & 0xFF
        elif f == 1:  # Sub: sequential in x — recur per byte
            rec = cur.copy()
            for x in range(ch, stride):
                rec[x] = (rec[x] + rec[x - ch]) & 0xFF
        elif f == 3:  # Average
            rec = cur.copy()
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + (left + up[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            rec = cur.copy()
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = up[x]
                c = up[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[r] = rec
    px = out.astype(np.uint8)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, ch)


# 5x7 bitmap glyphs for axis tick labels (digits + sign/point/exponent)
_GLYPHS = {
    "0": "01110 10001 10011 10101 11001 10001 01110",
    "1": "00100 01100 00100 00100 00100 00100 01110",
    "2": "01110 10001 00001 00010 00100 01000 11111",
    "3": "11110 00001 00001 01110 00001 00001 11110",
    "4": "00010 00110 01010 10010 11111 00010 00010",
    "5": "11111 10000 11110 00001 00001 10001 01110",
    "6": "00110 01000 10000 11110 10001 10001 01110",
    "7": "11111 00001 00010 00100 01000 01000 01000",
    "8": "01110 10001 10001 01110 10001 10001 01110",
    "9": "01110 10001 10001 01111 00001 00010 01100",
    "-": "00000 00000 00000 11111 00000 00000 00000",
    "+": "00000 00100 00100 11111 00100 00100 00000",
    ".": "00000 00000 00000 00000 00000 01100 01100",
    "e": "00000 00000 01110 10001 11111 10000 01111",
    " ": "00000 00000 00000 00000 00000 00000 00000",
}


def draw_text(canvas: np.ndarray, x: int, y: int, text: str,
              color=(0, 0, 0)) -> None:
    """Stamp 5x7 glyphs at (row y, col x); silently clips at edges."""
    h, w, _ = canvas.shape
    for ch in text:
        g = _GLYPHS.get(ch)
        if g is None:
            g = _GLYPHS[" "]
        for r, rowbits in enumerate(g.split()):
            for c, bit in enumerate(rowbits):
                if bit == "1" and 0 <= y + r < h and 0 <= x + c < w:
                    canvas[y + r, x + c] = color
        x += 6


def fmt_tick(v: float) -> str:
    """Short numeric label renderable by the glyph set."""
    if v == 0:
        return "0"
    a = abs(v)
    if 1e-3 <= a < 1e5:
        s = f"{v:.4g}"
    else:
        s = f"{v:.2e}"
    return s.replace("E", "e")


# viridis approximation: 9 anchor colors (public matplotlib colormap
# endpoints), linearly interpolated — perceptually-uniform enough for a
# quicklook raster
_VIRIDIS_ANCHORS = np.array([
    (68, 1, 84), (72, 40, 120), (62, 74, 137), (49, 104, 142),
    (38, 130, 142), (31, 158, 137), (53, 183, 121), (109, 205, 89),
    (180, 222, 44), (253, 231, 37)], dtype=np.float64)


def colormap(values: np.ndarray) -> np.ndarray:
    """(N,) floats in [0, 1] → (N, 3) uint8 viridis-like colors; NaN →
    white."""
    v = np.asarray(values, dtype=np.float64)
    nan = ~np.isfinite(v)
    v = np.clip(np.where(nan, 0.0, v), 0.0, 1.0)
    pos = v * (len(_VIRIDIS_ANCHORS) - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(_VIRIDIS_ANCHORS) - 1)
    frac = (pos - lo)[:, None]
    rgb = (_VIRIDIS_ANCHORS[lo] * (1 - frac)
           + _VIRIDIS_ANCHORS[hi] * frac)
    rgb[nan] = (255.0, 255.0, 255.0)
    return rgb.astype(np.uint8)
