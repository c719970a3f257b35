"""Baseline JFIF/JPEG codec in pure numpy + stdlib (round-12 stretch).

Scope — ITU-T T.81 baseline sequential DCT, the profile that covers the
overwhelming majority of web-corpus images:

- decoder: SOI/APP*/COM/DQT/DHT/SOF0/SOS/EOI marker walk, canonical
  Huffman decode with byte-unstuffing, dequantize + inverse zigzag +
  float IDCT per 8x8 block, arbitrary sampling factors up to 2x2
  (4:4:4 / 4:2:2 / 4:2:0), 1- or 3-component scans, nearest-neighbor
  chroma upsampling, BT.601 full-range YCbCr -> RGB;
- encoder: quality-scaled Annex-K quantization tables, Annex-K Huffman
  tables, optional 2x2 chroma subsampling (mean pooling), used for
  self-encoded round-trip fixtures exactly like ``functions.png``'s
  encoder is for PNG.

Restart intervals (DRI/RSTn — common in camera output) decode and
encode: predictors reset and the bit reader re-aligns at each marker.

Progressive DCT (SOF2, T.81 Annex G) decodes in full — spectral
selection, successive approximation (DC + AC first and refinement
scans, EOB-run coding, correction bits), interleaved DC /
non-interleaved AC block orders, restarts per scan — and the encoder
gains ``progressive=True`` (a libjpeg-style scan script with one level
of successive approximation and single-length custom AC Huffman tables
covering the EOB-run alphabet) so the decoder's every scan kind has a
self-encoded round-trip fixture. The decisive cross-check: a
progressive and a baseline encoding of the same image share identical
quantized coefficients, so their decodes must match byte-for-byte
(tested).

Out of scope (explicit ``NotImplementedError``, same capability-guard
convention as the other stdlib decoders): lossless/hierarchical SOFs,
arithmetic coding, 12-bit precision, CMYK/4-component scans.

The codec is a correctness baseline, not a SIMD turbo: the per-block
Huffman loop is python. At scale the decode runs inside Arrow-batched
``mapInPandas`` (multimodal.media), so throughput parallelizes across
executors; swapping in libjpeg-turbo later changes only
``media._decode_one``.

Reference surface: none — the reference repo has no media tier at all
(this whole tier is the beyond-reference training-data pipeline work).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K — public standard tables)

_QY = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

_DC_Y_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_Y_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))

_AC_Y_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_Y_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag_pairs() -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        # odd anti-diagonals walk down-left (row ascending), even ones
        # up-right (row descending) — the T.81 order
        rows = rng if s % 2 else reversed(list(rng))
        out.extend((i, s - i) for i in rows)
    return out


_ZZ = _zigzag_pairs()
_ZZ_ROWS = np.array([i for i, _ in _ZZ])
_ZZ_COLS = np.array([j for _, j in _ZZ])

_DCT = np.zeros((8, 8))
for _u in range(8):
    _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def quality_tables(quality: int = 75) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the libjpeg quality convention."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qy = np.clip((_QY * scale + 50) // 100, 1, 255).astype(np.int32)
    qc = np.clip((_QC * scale + 50) // 100, 1, 255).astype(np.int32)
    return qy, qc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)


def _cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _enc_block(w: _BitWriter, q: np.ndarray, block: np.ndarray,
               prev_dc: int, dc_tab, ac_tab) -> int:
    coef = np.round(_DCT @ (block - 128.0) @ _DCT.T / q).astype(np.int64)
    zz = coef[_ZZ_ROWS, _ZZ_COLS]
    dc = int(zz[0])
    diff = dc - prev_dc
    s = _cat(diff)
    code, ln = dc_tab[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, ln = ac_tab[0x00]  # EOB
            w.put(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.put(code, ln)
            run -= 16
        s = _cat(v)
        code, ln = ac_tab[(run << 4) | s]
        w.put(code, ln)
        w.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _plane_pad(p: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = p.shape
    ph = -h % bh
    pw = -w % bw
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def jpeg_bytes(arr: np.ndarray, quality: int = 75,
               subsample: bool | str = True,
               restart_interval: int = 0,
               progressive: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w) grayscale) as a
    baseline JFIF JPEG. ``subsample``: True = 4:2:0 (mean-pooled 2x2
    chroma), "422" = horizontal-only 4:2:2, False = 4:4:4; grayscale
    is a single-component scan. ``restart_interval`` > 0 emits DRI +
    RSTn markers every N MCUs (predictor reset + byte alignment, the
    camera-output convention) so the decoder's restart path has a
    self-encoded round-trip fixture. ``progressive=True`` emits SOF2
    with a libjpeg-style scan script (interleaved DC at Al=1 + DC
    refinement, per-component AC bands 1-5 / 6-63 at Al=1 + AC
    refinement to Al=0) — same quantized coefficients as the baseline
    encoding, so both decode identically."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    qy, qc = quality_tables(quality)
    if gray:
        planes = [arr.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "422":
            ph = _plane_pad(cb, 1, 2)
            pr = _plane_pad(cr, 1, 2)
            cb = (ph[:, 0::2] + ph[:, 1::2]) / 2.0
            cr = (pr[:, 0::2] + pr[:, 1::2]) / 2.0
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsample:
            ph = _plane_pad(cb, 2, 2)
            pr = _plane_pad(cr, 2, 2)
            cb = (ph[0::2, 0::2] + ph[0::2, 1::2]
                  + ph[1::2, 0::2] + ph[1::2, 1::2]) / 4.0
            cr = (pr[0::2, 0::2] + pr[0::2, 1::2]
                  + pr[1::2, 0::2] + pr[1::2, 1::2]) / 4.0
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes = [_plane_pad(p, 8 * samp[c][1], 8 * samp[c][0])
              for c, p in enumerate(planes)]
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    # plane extents must cover every MCU block (edge-replicate further)
    for c, p in enumerate(planes):
        need_h = mcus_y * 8 * samp[c][1]
        need_w = mcus_x * 8 * samp[c][0]
        planes[c] = np.pad(p, ((0, need_h - p.shape[0]),
                               (0, need_w - p.shape[1])), mode="edge")

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00"
            b"\x00\x01\x00\x01\x00\x00")  # APP0
    for tid, q in ((0, qy),) + (() if gray else ((1, qc),)):
        out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid])
        out += bytes(int(q[i, j]) for i, j in _ZZ)
    ncomp = 1 if gray else 3
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + (8 + 3 * ncomp).to_bytes(2, "big") + b"\x08"
    out += h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        out += bytes([c + 1, (samp[c][0] << 4) | samp[c][1], qsel[c]])
    if progressive:
        _enc_progressive_scans(out, planes, samp, qsel, qy, qc, h, w,
                               mcus_x, mcus_y, restart_interval)
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    tabs = [(0x00, _DC_Y_BITS, _DC_Y_VALS), (0x10, _AC_Y_BITS, _AC_Y_VALS)]
    if not gray:
        tabs += [(0x01, _DC_C_BITS, _DC_C_VALS),
                 (0x11, _AC_C_BITS, _AC_C_VALS)]
    for tc, bits, vals in tabs:
        out += b"\xff\xc4" + (3 + 16 + len(vals)).to_bytes(2, "big")
        out += bytes([tc]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + int(restart_interval).to_bytes(
            2, "big")
    out += b"\xff\xda" + (6 + 2 * ncomp).to_bytes(2, "big") + bytes([ncomp])
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_y = _huff_codes(_DC_Y_BITS, _DC_Y_VALS)
    ac_y = _huff_codes(_AC_Y_BITS, _AC_Y_VALS)
    dc_c = _huff_codes(_DC_C_BITS, _DC_C_VALS)
    ac_c = _huff_codes(_AC_C_BITS, _AC_C_VALS)
    wtr = _BitWriter()
    prev = [0] * ncomp
    mcu_n, rst = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                wtr.flush()  # pad to byte boundary with 1-bits
                wtr.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                prev = [0] * ncomp
            mcu_n += 1
            for c in range(ncomp):
                sh, sv = samp[c]
                qtab = qy if qsel[c] == 0 else qc
                dct, act = (dc_y, ac_y) if c == 0 else (dc_c, ac_c)
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = planes[c][y0:y0 + 8, x0:x0 + 8]
                        prev[c] = _enc_block(wtr, qtab, blk, prev[c],
                                             dct, act)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoding (T.81 Annex G) — fixture generator for the
# progressive decode path; same quantized coefficients as baseline


def _prog_ac_table() -> tuple[list[int], list[int]]:
    """Canonical AC Huffman table covering the full progressive
    alphabet — EOB-runs 0x00..0xE0, ZRL 0xF0, (run, size) for size
    1..10 — every symbol at length 9 (176 symbols < 512 codes, so the
    single-length table is trivially prefix-free and never reaches the
    all-ones code). Annex-K AC tables lack the EOB-run symbols, which
    is why progressive scans carry their own DHT (libjpeg ships
    optimized tables for the same reason)."""
    vals = sorted({r << 4 for r in range(15)} | {0xF0}
                  | {(r << 4) | s for r in range(16)
                     for s in range(1, 11)})
    bits = [0] * 16
    bits[8] = len(vals)  # all codes at length 9
    return bits, vals


def _quant_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Quantized zigzag coefficients for every 8x8 block of a padded
    plane → (nby, nbx, 64) int64 — the shared source for baseline and
    progressive entropy coding."""
    nby, nbx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((nby, nbx, 64), np.int64)
    for by in range(nby):
        for bx in range(nbx):
            blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            coef = np.round(
                _DCT @ (blk - 128.0) @ _DCT.T / q).astype(np.int64)
            out[by, bx] = coef[_ZZ_ROWS, _ZZ_COLS]
    return out


class _ProgAC:
    """EOB-run + buffered-correction-bit state for one progressive AC
    scan (the jcphuff discipline: one global buffer riding the pending
    EOB run, one per-block buffer emitted after each run/size code)."""

    def __init__(self, w: _BitWriter, tab: dict[int, tuple[int, int]]):
        self.w = w
        self.tab = tab
        self.eobrun = 0
        self.bits: list[int] = []  # corrections riding the EOB run

    def flush(self) -> None:
        """Emit the pending EOB run (code + extension bits) and every
        buffered correction bit."""
        if self.eobrun > 0:
            nb = self.eobrun.bit_length() - 1
            code, ln = self.tab[nb << 4]
            self.w.put(code, ln)
            if nb:
                self.w.put(self.eobrun - (1 << nb), nb)
            self.eobrun = 0
        for b in self.bits:
            self.w.put(b, 1)
        self.bits = []

    def end_block(self, br: list[int]) -> None:
        """Block ends with only zero-run/corrections left: extend the
        EOB run."""
        self.eobrun += 1
        self.bits.extend(br)
        if self.eobrun == 0x7FFF:
            self.flush()


def _enc_ac_first(st: _ProgAC, zz: np.ndarray, ss: int, se: int,
                  al: int) -> None:
    w, tab = st.w, st.tab
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (v if v >= 0 else -v) >> al
        if t == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            code, ln = tab[0xF0]
            w.put(code, ln)
            r -= 16
        s = t.bit_length()
        code, ln = tab[(r << 4) | s]
        w.put(code, ln)
        w.put(t if v >= 0 else (~t) & ((1 << s) - 1), s)
        r = 0
        emitted = True
    if r > 0 or not emitted:
        st.end_block([])


def _enc_ac_refine(st: _ProgAC, zz: np.ndarray, ss: int, se: int,
                   al: int) -> None:
    w, tab = st.w, st.tab
    absv = [((int(zz[k]) if zz[k] >= 0 else -int(zz[k])) >> al)
            for k in range(ss, se + 1)]
    eob = 0  # band index AFTER the last newly-significant coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    r = 0
    br: list[int] = []  # current block's correction bits
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            st.flush()
            code, ln = tab[0xF0]
            w.put(code, ln)
            r -= 16
            for b in br:
                w.put(b, 1)
            br = []
        if t > 1:  # previously significant: one correction bit
            br.append(t & 1)
            continue
        # newly significant (t == 1): run/size code + sign
        st.flush()
        code, ln = tab[(r << 4) | 1]
        w.put(code, ln)
        w.put(1 if zz[ss + i] >= 0 else 0, 1)
        for b in br:
            w.put(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.end_block(br)


def _enc_progressive_scans(out: bytearray, planes, samp, qsel, qy, qc,
                           h: int, w: int, mcus_x: int, mcus_y: int,
                           restart_interval: int) -> None:
    """Emit DHTs + the scan script: interleaved DC (Al=1) → per-comp
    AC bands 1-5 and 6-63 (Al=1) → per-comp AC refinement (→ Al=0) →
    DC refinement. One successive-approximation level exercises every
    progressive decode path while staying two scans per band."""
    ncomp = len(planes)
    coefs = [_quant_coefs(planes[c], qy if qsel[c] == 0 else qc)
             for c in range(ncomp)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # real (non-interleaved) block grids per component
    grids = []
    for c in range(ncomp):
        cw = -(-w * samp[c][0] // hmax)
        ch = -(-h * samp[c][1] // vmax)
        grids.append((-(-ch // 8), -(-cw // 8)))

    tabs = [(0x00, _DC_Y_BITS, _DC_Y_VALS)]
    if ncomp > 1:
        tabs.append((0x01, _DC_C_BITS, _DC_C_VALS))
    pbits, pvals = _prog_ac_table()
    tabs.append((0x10, pbits, pvals))
    for tc, bits, vals in tabs:
        out += b"\xff\xc4" + (3 + 16 + len(vals)).to_bytes(2, "big")
        out += bytes([tc]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd\x00\x04" + int(restart_interval).to_bytes(
            2, "big")

    dc_codes = [_huff_codes(_DC_Y_BITS, _DC_Y_VALS),
                _huff_codes(_DC_C_BITS, _DC_C_VALS)]
    ac_codes = _huff_codes(pbits, pvals)

    def sos_header(comps_in_scan, ss, se, ah, al):
        out.extend(b"\xff\xda")
        out.extend((6 + 2 * len(comps_in_scan)).to_bytes(2, "big"))
        out.append(len(comps_in_scan))
        for c in comps_in_scan:
            td = 0 if c == 0 else (1 if ncomp > 1 else 0)
            out.extend(bytes([c + 1, (td << 4) | 0]))
        out.extend(bytes([ss, se, (ah << 4) | al]))

    def maybe_restart(wtr, n, state, reset):
        if restart_interval and n and n % restart_interval == 0:
            if state is not None:
                state.flush()
            wtr.flush()
            wtr.out += bytes([0xFF, 0xD0 + (n // restart_interval - 1) % 8])
            reset()

    # ---- scan 1: DC first, all components, Al=1 -------------------
    al = 1
    sos_header(list(range(ncomp)), 0, 0, 0, al)
    wtr = _BitWriter()
    prev = [0] * ncomp

    def _reset_prev():
        prev[:] = [0] * ncomp

    n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            maybe_restart(wtr, n, None, _reset_prev)
            n += 1
            for c in range(ncomp):
                sh, sv = samp[c]
                dct = dc_codes[0 if c == 0 else 1]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coefs[c][my * sv + by, mx * sh + bx, 0])
                        dc >>= al  # DC point transform: arithmetic shift
                        diff = dc - prev[c]
                        prev[c] = dc
                        s = _cat(diff)
                        code, ln = dct[s]
                        wtr.put(code, ln)
                        if s:
                            wtr.put(diff if diff > 0
                                    else diff + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out

    # ---- AC first scans (bands 1-5 then 6-63), then refinement ----
    for ss, se, ah, al_s, enc in ((1, 5, 0, 1, _enc_ac_first),
                                  (6, 63, 0, 1, _enc_ac_first),
                                  (1, 63, 1, 0, _enc_ac_refine)):
        for c in range(ncomp):
            sos_header([c], ss, se, ah, al_s)
            wtr = _BitWriter()
            st = _ProgAC(wtr, ac_codes)
            nby, nbx = grids[c]
            n = 0
            for by in range(nby):
                for bx in range(nbx):
                    maybe_restart(wtr, n, st, lambda: None)
                    n += 1
                    enc(st, coefs[c][by, bx], ss, se, al_s)
            st.flush()
            wtr.flush()
            out += wtr.out

    # ---- final scan: DC refinement (Ah=1, Al=0), raw bits ---------
    sos_header(list(range(ncomp)), 0, 0, 1, 0)
    wtr = _BitWriter()
    n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            maybe_restart(wtr, n, None, lambda: None)
            n += 1
            for c in range(ncomp):
                sh, sv = samp[c]
                for by in range(sv):
                    for bx in range(sh):
                        dc = int(coefs[c][my * sv + by, mx * sh + bx, 0])
                        wtr.put(dc & 1, 1)
    wtr.flush()
    out += wtr.out


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.d[self.i]
        if b == 0xFF:
            nxt = self.d[self.i + 1]
            if nxt == 0x00:
                self.i += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError(
                    "RST marker inside an MCU (corrupt restart layout)")
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.i += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        # truncate consumed high bits (the writer's discipline): an
        # ever-growing acc makes each bit read O(bits-ever-read) — on
        # a real multi-hundred-KB scan that is O(N^2) total
        self.acc &= (1 << self.n) - 1

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker (T.81
        restart convention: pad bits discarded, predictors reset by
        the caller)."""
        self.acc = 0
        self.n = 0
        if self.d[self.i] == 0xFF and self.d[self.i + 1] == 0x00:
            self.i += 2  # stuffed pad byte the bit path never consumed
        if not (self.d[self.i] == 0xFF
                and 0xD0 <= self.d[self.i + 1] <= 0xD7):
            raise ValueError("expected RST marker at restart boundary")
        self.i += 2

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _finish_planes(planes, comps, hmax: int, vmax: int,
                   h: int, w: int) -> np.ndarray:
    """Upsample + color-convert decoded component planes (shared by
    the baseline and progressive paths)."""
    up = []
    for c, p in enumerate(planes):
        _, sh, sv, _ = comps[c]
        p = np.repeat(np.repeat(p, vmax // sv, axis=0),
                      hmax // sh, axis=1)
        up.append(p[:h, :w])
    if len(up) == 1:
        return np.clip(np.round(up[0]), 0, 255).astype(np.uint8)
    y, cb, cr = up
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _ProgState:
    """Per-scan-group progressive decode state: coefficient arrays per
    component (padded MCU grid, zigzag order) + the EOB-run counter."""

    def __init__(self, comps, mcus_x: int, mcus_y: int):
        self.coefs = [np.zeros((mcus_y * c[2], mcus_x * c[1], 64),
                               np.int64) for c in comps]
        self.eobrun = 0


def _dec_dc_prog(rdr, st, scan, comps, huff, mcus_x, mcus_y, grids,
                 ah, al, restart_interval) -> None:
    prev = [0] * len(comps)
    if len(scan) > 1:  # interleaved: MCU order over the padded grid
        mcus = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]

        def mcu_blocks(my, mx):
            for (ci, td, _) in scan:
                _, sh, sv, _ = comps[ci]
                for by in range(sv):
                    for bx in range(sh):
                        yield ci, td, my * sv + by, mx * sh + bx
    else:  # single component: raster over the real block grid
        ci0, td0, _ = scan[0]
        nby, nbx = grids[ci0]
        mcus = [(by, bx) for by in range(nby) for bx in range(nbx)]

        def mcu_blocks(by, bx):
            yield ci0, td0, by, bx

    for n, (a, b) in enumerate(mcus):
        if restart_interval and n and n % restart_interval == 0:
            rdr.restart()
            prev = [0] * len(comps)
        for ci, td, by, bx in mcu_blocks(a, b):
            zz = st.coefs[ci][by, bx]
            if ah == 0:  # DC first: Huffman diff on the point transform
                s_ = rdr.huff(huff[td])
                diff = _extend(rdr.bits(s_), s_) if s_ else 0
                prev[ci] += diff
                zz[0] = prev[ci] << al
            else:        # DC refinement: one raw bit
                if rdr.bit():
                    zz[0] |= 1 << al


def _dec_ac_first(rdr, st, zz, atab, ss, se, al) -> None:
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        sym = rdr.huff(atab)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            st.eobrun = (1 << r) - 1
            if r:
                st.eobrun += rdr.bits(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow (progressive)")
        zz[k] = _extend(rdr.bits(s), s) << al
        k += 1


def _dec_ac_refine(rdr, st, zz, atab, ss, se, al) -> None:
    p1, m1 = 1 << al, -(1 << al)

    def correct(k: int) -> None:
        if rdr.bit() and (zz[k] & p1) == 0:
            zz[k] += p1 if zz[k] >= 0 else m1

    if st.eobrun > 0:
        for k in range(ss, se + 1):
            if zz[k] != 0:
                correct(k)
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        sym = rdr.huff(atab)
        r, s = sym >> 4, sym & 0xF
        newval = 0
        if s == 0:
            if r != 15:  # EOB run: finish this block in the tail pass
                st.eobrun = 1 << r
                if r:
                    st.eobrun += rdr.bits(r)
                break
            # else ZRL: skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("bad refinement symbol")
            newval = p1 if rdr.bit() else m1
        while k <= se:
            if zz[k] != 0:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            zz[k] = newval
        k += 1
    if st.eobrun > 0:  # correction tail of the block that opened the run
        for kk in range(k, se + 1):
            if zz[kk] != 0:
                correct(kk)
        st.eobrun -= 1


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Decode a baseline or progressive JPEG to (h, w, 3) uint8 RGB
    ((h, w) for a single-component scan). Restart intervals (DRI/RSTn)
    are handled in both modes; raises ``NotImplementedError`` on
    lossless/hierarchical/arithmetic/12-bit streams."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[int, dict[tuple[int, int], int]] = {}
    restart_interval = 0
    h = w = 0
    progressive = False
    prog_scans = 0
    prog: _ProgState | None = None
    geo = None  # (hmax, vmax, mcus_x, mcus_y, grids) once SOF known
    comps: list[tuple[int, int, int, int]] = []  # (id, hi, vi, tq)
    scan: list[tuple[int, int, int]] = []        # (comp idx, td, ta)
    while i < len(blob):
        if blob[i] != 0xFF:
            i += 1
            continue
        m = blob[i + 1]
        if m == 0xFF:  # T.81 B.1.1.2: 0xFF fill bytes before a marker
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        ln = int.from_bytes(blob[i + 2:i + 4], "big")
        seg = blob[i + 4:i + 2 + ln]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit DQT not supported")
                tbl = np.zeros((8, 8), np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = np.frombuffer(
                    seg[j + 1:j + 65], np.uint8).astype(np.int32)
                qt[tq] = tbl
                j += 65
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc_th = seg[j]
                bits = list(seg[j + 1:j + 17])
                nv = sum(bits)
                vals = list(seg[j + 17:j + 17 + nv])
                huff[tc_th] = _huff_decode_map(bits, vals)
                j += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 + progressive SOF2
            progressive = m == 0xC2
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            if nc not in (1, 3):
                raise NotImplementedError("1- or 3-component only")
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            grids = [(-(-(-(-h * c[2] // vmax)) // 8),
                      -(-(-(-w * c[1] // hmax)) // 8))
                     for c in comps]
            geo = (hmax, vmax, mcus_x, mcus_y, grids)
            if progressive:
                prog = _ProgState(comps, mcus_x, mcus_y)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF{m - 0xC0}: baseline/progressive DCT only")
        elif m == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif m == 0xDA:  # SOS
            ns = seg[0]
            this_scan: list[tuple[int, int, int]] = []
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                idx = next(k for k, cc in enumerate(comps) if cc[0] == cid)
                this_scan.append((idx, tdta >> 4, tdta & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            i = i + 2 + ln
            if not progressive:
                scan = this_scan
                break
            i = _dec_prog_scan(
                blob, i, prog, this_scan, comps, huff, geo,
                ss, se, ah, al, restart_interval)
            prog_scans += 1
            # strict post-scan resync: the entropy decoder stops AT
            # the next marker, modulo one never-consumed stuffed pad
            # byte (FF 00 — the T.81 1-padded final byte) and 0xFF
            # fill bytes. Anything else means the scan under-consumed
            # (corrupt/foreign stream); letting the lenient header
            # walk interpret such bytes as length-prefixed segments
            # could silently skip a real SOS/DHT — fail loudly.
            if (i + 1 < len(blob) and blob[i] == 0xFF
                    and blob[i + 1] == 0x00):
                i += 2
            while (i + 1 < len(blob) and blob[i] == 0xFF
                    and blob[i + 1] == 0xFF):
                i += 1
            if i < len(blob) and (
                    blob[i] != 0xFF
                    or (i + 1 < len(blob) and blob[i + 1] == 0x00)):
                raise ValueError(
                    "corrupt progressive stream: expected a marker "
                    f"after scan entropy data, got 0x{blob[i]:02x} "
                    f"at offset {i}")
            continue
        i += 2 + ln
    # a progressive stream with ZERO decoded scans (truncated after
    # the headers) must not silently return the all-128 IDCT of an
    # empty coefficient array — same explicit-failure convention as
    # the baseline path's missing-SOS error
    if not comps or (not progressive and not scan) or (
            progressive and prog_scans == 0):
        raise ValueError("no SOF/SOS found")

    hmax, vmax, mcus_x, mcus_y, grids = geo
    if progressive:
        # all scans accumulated: dequantize + IDCT the padded grid
        planes = []
        for c, (cid, sh, sv, tq) in enumerate(comps):
            q = qt[tq]
            p = np.zeros((mcus_y * 8 * sv, mcus_x * 8 * sh))
            arr = prog.coefs[c]
            for by in range(arr.shape[0]):
                for bx in range(arr.shape[1]):
                    coef = np.zeros((8, 8))
                    coef[_ZZ_ROWS, _ZZ_COLS] = (
                        arr[by, bx] * q[_ZZ_ROWS, _ZZ_COLS])
                    p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        _DCT.T @ coef @ _DCT + 128.0)
            planes.append(p)
        return _finish_planes(planes, comps, hmax, vmax, h, w)

    planes = [np.zeros((mcus_y * 8 * c[2], mcus_x * 8 * c[1]))
              for c in comps]
    rdr = _BitReader(blob, i)
    prev = [0] * len(comps)
    mcu_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (restart_interval and mcu_n
                    and mcu_n % restart_interval == 0):
                rdr.restart()
                prev = [0] * len(comps)
            mcu_n += 1
            for (ci, td, ta) in scan:
                _, sh, sv, tq = comps[ci]
                dtab, atab = huff[td], huff[0x10 | ta]
                q = qt[tq]
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, np.int64)
                        s = rdr.huff(dtab)
                        diff = _extend(rdr.bits(s), s) if s else 0
                        prev[ci] += diff
                        zz[0] = prev[ci]
                        k = 1
                        while k < 64:
                            sym = rdr.huff(atab)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rdr.bits(size), size)
                            k += 1
                        coef = np.zeros((8, 8))
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS,
                                                          _ZZ_COLS]
                        blk = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk

    return _finish_planes(planes, comps, hmax, vmax, h, w)


def _dec_prog_scan(blob: bytes, i: int, st: _ProgState, scan, comps,
                   huff, geo, ss: int, se: int, ah: int, al: int,
                   restart_interval: int) -> int:
    """Decode one progressive scan's entropy data starting at ``i``;
    returns the byte position after it (where the marker walk
    resumes)."""
    hmax, vmax, mcus_x, mcus_y, grids = geo
    rdr = _BitReader(blob, i)
    st.eobrun = 0
    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("DC scan must have Se=0")
        _dec_dc_prog(rdr, st, scan, comps, huff, mcus_x, mcus_y,
                     grids, ah, al, restart_interval)
        return rdr.i
    # AC scan: T.81 requires exactly one component
    if len(scan) != 1:
        raise ValueError("interleaved AC scan is not legal")
    ci, _, ta = scan[0]
    atab = huff[0x10 | ta]
    nby, nbx = grids[ci]
    n = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and n and n % restart_interval == 0:
                rdr.restart()
                st.eobrun = 0
            n += 1
            zz = st.coefs[ci][by, bx]
            if ah == 0:
                _dec_ac_first(rdr, st, zz, atab, ss, se, al)
            else:
                _dec_ac_refine(rdr, st, zz, atab, ss, se, al)
    return rdr.i
