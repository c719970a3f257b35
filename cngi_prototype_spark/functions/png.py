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


def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as a PNG file."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {rgb.shape}")
    h, w, _ = rgb.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)],
        axis=1).tobytes()  # filter byte 0 per scanline
    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        f.write(chunk(b"IEND", b""))


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
