"""visplot/implot smoke: real PNG files out, bounded collects."""

import struct
import zlib

import numpy as np
import pytest

from cngi_prototype_spark.functions.png import write_png
from cngi_prototype_spark.operators.plotting import implot, visplot


def _read_png(path):
    """Decode our own filter-0 RGB PNG back to an array (stdlib only) —
    proves the file is spec-valid, not just non-empty."""
    raw = open(path, "rb").read()
    assert raw[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", None
    while pos < len(raw):
        ln, tag = struct.unpack(">I4s", raw[pos:pos + 8])
        payload = raw[pos + 8:pos + 8 + ln]
        crc = struct.unpack(">I", raw[pos + 8 + ln:pos + 12 + ln])[0]
        assert crc == zlib.crc32(tag + payload)
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", payload[:10])
            assert (bits, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + ln
    rows = np.frombuffer(zlib.decompress(idat), np.uint8) \
        .reshape(h, 1 + w * 3)
    assert np.all(rows[:, 0] == 0)
    return rows[:, 1:].reshape(h, w, 3)


def test_write_png_roundtrip(tmp_path):
    rgb = (np.arange(4 * 5 * 3, dtype=np.uint8)).reshape(4, 5, 3)
    p = str(tmp_path / "t.png")
    write_png(p, rgb)
    np.testing.assert_array_equal(_read_png(p), rgb)


def test_visplot_scatter(spark, tmp_path):
    n = 5000
    df = spark.range(n).selectExpr("CAST(id AS DOUBLE) AS x",
                                   "sin(id / 100.0) AS y")
    p = str(tmp_path / "v.png")
    info = visplot(df, "x", "y", p, tsize=1000)
    assert info["points"] <= 1001 and info["points"] > 400
    img = _read_png(p)
    assert img.shape == (500, 800, 3)
    # some data-colored pixels landed
    blue = (img == np.array([31, 119, 180])).all(axis=2)
    assert blue.sum() > 100


def test_implot_plane(spark, tmp_path):
    rows = [(0, 0, l, m, float(l * m)) for l in range(16)
            for m in range(16)]
    df = spark.createDataFrame(
        rows, "chan int, pol int, l_idx int, m_idx int, image double")
    p = str(tmp_path / "i.png")
    info = implot(df, p, chan=0, pol=0, scale=4)
    assert info["shape"] == (16, 16)
    assert info["vmax"] == 225.0
    img = _read_png(p)
    assert img.shape == (64, 64, 3)
    # gradient: the max-value corner is the bright anchor, the zero
    # edges the dark one
    assert img.std() > 20


def test_implot_missing_plane_raises(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, 0, 0, 0, 1.0)],
        "chan int, pol int, l_idx int, m_idx int, image double")
    with pytest.raises(ValueError, match="no pixels"):
        implot(df, str(tmp_path / "x.png"), chan=3)
