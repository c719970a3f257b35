"""cngi/image parity ops: mask/region booleans, gaussian beam, FFT smooth,
stokes basis change, per-pixel cont_sub, thinning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.image import make_empty_sky_image
from cngi_prototype_spark.imaging.image_ops import (
    beam_abc,
    cont_sub,
    corr_to_stokes,
    gaussian_beam,
    mask,
    region,
    reframe,
    smooth,
    stokes_to_corr,
    thin,
)

N = 16
CELL = (1e-4, 1e-4)


@pytest.fixture(scope="module")
def sky(spark):
    return make_empty_sky_image(spark, (0.8, -0.4), (N, N), CELL).cache()


def test_mask_and_region_are_complementary_inside_box(spark, sky):
    df = sky.withColumn("chan", F.lit(0)).withColumn("pol", F.lit(0))
    m = mask(df, "m", pixels=[[4, 4], [10, 10]]).toPandas()
    r = region(df, "r", pixels=[[4, 4], [10, 10]]).toPandas()
    inside = (m.l_idx > 4) & (m.l_idx < 10) & (m.m_idx > 4) & (m.m_idx < 10)
    assert (~m.m[inside]).all() and m.m[~inside].all()      # mask: True outside
    assert r.r[inside].all() and (~r.r[~inside]).all()      # region: True inside


def test_region_radec_box(spark, sky):
    pdf = sky.toPandas()
    ra_rng = (pdf.right_ascension.quantile(0.3), pdf.right_ascension.quantile(0.7))
    dec_rng = (pdf.declination.quantile(0.3), pdf.declination.quantile(0.7))
    r = region(sky, "r", ra=ra_rng, dec=dec_rng).toPandas()
    exp = ((r.right_ascension > min(ra_rng)) & (r.right_ascension < max(ra_rng))
           & (r.declination > min(dec_rng)) & (r.declination < max(dec_rng)))
    assert (r.r == exp).all()


def test_gaussian_beam_matches_numpy(spark, sky):
    out = gaussian_beam(sky, (1.0, 0.5, 30.0), CELL, scale=2.0).toPandas()
    a, b, g = beam_abc(1.0, 0.5, 30.0, CELL)
    x = out.l_idx - N // 2
    y = out.m_idx - N // 2
    exp = 2.0 * np.exp(-(a * x**2 + b * x * y + g * y**2))
    np.testing.assert_allclose(out.beam.to_numpy(), exp.to_numpy(), rtol=1e-12)


def test_smooth_preserves_flux_gaussian(spark):
    rng = np.random.default_rng(2)
    li, mi = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    img = np.zeros((N, N)); img[7, 9] = 5.0; img[3, 4] = 1.0
    pdf = pd.DataFrame({"chan": 0, "pol": 0,
                        "l_idx": li.ravel(), "m_idx": mi.ravel(),
                        "image": img.ravel()})
    # cell = 1e-4 rad ~= 20.6 arcsec; 40 arcsec beam ~= 2 cells FWHM
    out = smooth(spark.createDataFrame(pdf), CELL, image_size=(N, N),
                 size=(40.0, 40.0, 0.0)).toPandas()
    got = np.zeros((N, N)); got[out.l_idx, out.m_idx] = out.image
    # unity-normalized kernel preserves total flux
    assert got.sum() == pytest.approx(img.sum(), rel=1e-6)
    # peak stays at the bright pixel but is spread
    assert np.unravel_index(np.argmax(got), got.shape) == (7, 9)
    assert got[7, 9] < 5.0


def test_stokes_roundtrip(spark):
    rows = []
    rng = np.random.default_rng(4)
    for px in range(6):
        i, q, u = rng.normal(), rng.normal(), rng.normal()
        for code, val in [(1, i), (2, q), (3, u), (4, 0.0)]:
            rows.append({"l_idx": px, "m_idx": 0, "chan": 0, "pol": code, "image": val})
    df = spark.createDataFrame(pd.DataFrame(rows))
    corr = stokes_to_corr(df, basis="linear")
    got_corr = corr.toPandas()
    assert sorted(got_corr.pol.unique()) == [9, 10, 11, 12]
    back = corr_to_stokes(corr, basis="linear").toPandas()
    orig = pd.DataFrame(rows)
    m = back.merge(orig, on=["l_idx", "m_idx", "chan", "pol"], suffixes=("_got", "_exp"))
    assert len(m) == len(orig)
    np.testing.assert_allclose(m.image_got, m.image_exp, atol=1e-12)


@pytest.mark.parametrize("fitorder", [1, 2])
def test_cont_sub_removes_polynomial(spark, fitorder):
    nchan = 12
    rows = []
    for px in range(4):
        a, b, c = px + 1.0, 0.5 * px, 0.1
        for ch in range(nchan):
            base = a + b * ch + (c * ch * ch if fitorder >= 2 else 0.0)
            line = 3.0 if ch == 6 else 0.0
            rows.append({"l_idx": px, "m_idx": 0, "pol": 0, "chan": ch,
                         "image": base + line})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = cont_sub(df, fitorder=fitorder,
                   chans=[c for c in range(nchan) if c != 6]).toPandas()
    on_line = out[out.chan == 6]
    off_line = out[out.chan != 6]
    np.testing.assert_allclose(off_line.image, 0.0, atol=1e-7)
    np.testing.assert_allclose(on_line.image, 3.0, atol=1e-7)


def test_reframe_and_thin(spark, sky):
    df = sky.withColumn("freq", F.lit(1.0e9))
    out = reframe(df, velocity=3.0e5).toPandas()
    assert out.freq.iloc[0] == pytest.approx(1.0e9 * (1 - 3.0e5 / 299792458.0), rel=1e-15)
    t = thin(sky, {"l_idx": 4, "m_idx": 2}).toPandas()
    assert set(t.l_idx.unique()) <= {0, 4, 8, 12}
    assert len(t) == (N // 4) * (N // 2)
