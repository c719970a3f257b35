"""Production-shape parity: the full-size imaging paths against plain
numpy reference implementations at a mid-size config (64²).

The driver gates value-check these operators through small-size twins
(DFT/unrolled-CTE oracles at 12-16²); these tests protect the
production shapes the 50-slot window can't reach, per the reference's
own compare convention (1e-8, tests/test_ms_conversion.py:11-33):
make_image (both gridder variants + the dense-planes fast path),
make_psf, smooth, and deconvolve_point_clean.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.deconvolve import deconvolve_point_clean
from cngi_prototype_spark.imaging.grid import GridParms
from cngi_prototype_spark.imaging.image import make_image, make_psf
from cngi_prototype_spark.imaging.image_ops import beam_abc, smooth
from cngi_prototype_spark.imaging.kernels import pswf, pswf_kernel_1d

N = 64
GP = GridParms(n_u=N, n_v=N, cell_u=2.0e-5, cell_v=2.0e-5,
               support=7, oversampling=100)
C = 299792458.0


def _vis_pdf(n=4000, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "u": rng.uniform(-9000, 9000, n),
        "v": rng.uniform(-9000, 9000, n),
        "freq": np.full(n, 1.0e9),
        "chan": np.zeros(n, np.int32),
        "pol": rng.integers(0, 2, n).astype(np.int32),
        "data_re": rng.normal(size=n),
        "data_im": rng.normal(size=n),
        "weight": rng.uniform(0.5, 2.0, n),
    })


def _np_grid(pdf, psf_mode=False):
    """Straight numpy replica of the reference standard gridder."""
    cgk = pswf_kernel_1d(GP.oversampling, GP.support)
    half, ov = GP.half, GP.oversampling
    grids = {}
    sumw = {}
    for _, r in pdf.iterrows():
        scale = -(r.freq * GP.cell_u * N) / C
        up = r.u * scale + N // 2
        vp = r.v * scale + N // 2
        uc, vc = int(np.floor(up + 0.5)), int(np.floor(vp + 0.5))
        du = int(np.floor((uc - up) * ov + 0.5))
        dv = int(np.floor((vc - vp) * ov + 0.5))
        if not (half <= uc < N - half and half <= vc < N - half):
            continue
        wd = (r.weight if psf_mode
              else (r.data_re + 1j * r.data_im) * r.weight)
        if wd == 0:
            continue
        key = (int(r.chan), int(r.pol))
        g = grids.setdefault(key, np.zeros((N, N), complex))
        norm_u = norm_v = 0.0
        for iu in range(-half, GP.support - half):
            cu = cgk[abs(ov * iu + du)]
            norm_u += cu
            for iv in range(-half, GP.support - half):
                cv = cgk[abs(ov * iv + dv)]
                g[uc + iu, vc + iv] += cu * cv * wd
        for iv in range(-half, GP.support - half):
            norm_v += cgk[abs(ov * iv + dv)]
        sumw[key] = sumw.get(key, 0.0) + r.weight * norm_u * norm_v
    return grids, sumw


def _np_image(grids, sumw, correct=True):
    imgs = {}
    corr = pswf((np.arange(N) - N // 2) / (N // 2))[0]
    for key, g in grids.items():
        img = np.fft.fftshift(np.fft.ifft2(np.fft.ifftshift(g))).real * N * N
        img = img / (sumw.get(key) or 1.0)
        if correct:
            img = img / np.outer(corr, corr)
        imgs[key] = img
    return imgs


def _collect_planes(pdf_rows, val):
    planes = {}
    for key, sub in pdf_rows.groupby(["chan", "pol"]):
        g = np.zeros((N, N))
        g[sub.l_idx, sub.m_idx] = sub[val]
        planes[key] = g
    return planes


@pytest.mark.parametrize("variant,output", [
    ("explode", "cells"), ("kernel", "cells"), ("kernel", "planes")])
def test_make_image_production_parity(spark, variant, output):
    pdf = _vis_pdf()
    df = spark.createDataFrame(pdf)
    kw = dict(image_size=(N, N), weight="weight", variant=variant)
    if output == "planes":
        kw.update(n_planes=2, output="planes")
    out = make_image(df, GP, **kw).toPandas()
    ref = _np_image(*_np_grid(pdf))
    if output == "planes":
        planes = {(r.chan, r.pol): np.asarray(r.image).reshape(N, N)
                  for r in out.itertuples()}
    else:
        planes = _collect_planes(out, "image")
    assert set(planes) == set(ref)
    for key in ref:
        assert np.abs(planes[key] - ref[key]).max() < 1e-8


def test_make_psf_production_parity(spark):
    pdf = _vis_pdf(seed=6)
    out = make_psf(spark.createDataFrame(pdf), GP,
                   image_size=(N, N), weight="weight").toPandas()
    grids, sumw = _np_grid(pdf, psf_mode=True)
    ref = _np_image(grids, sumw)
    planes = _collect_planes(out, "psf")
    for key in ref:
        assert np.abs(planes[key] - ref[key]).max() < 1e-8


def test_smooth_production_parity(spark):
    rng = np.random.default_rng(7)
    img = rng.normal(size=(N, N))
    li, mi = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    pdf = pd.DataFrame({
        "chan": np.zeros(img.size, np.int32),
        "pol": np.zeros(img.size, np.int32),
        "l_idx": li.ravel().astype(np.int32),
        "m_idx": mi.ravel().astype(np.int32),
        "image": img.ravel(),
    })
    incr = (2.0e-5, 2.0e-5)
    size = (8.0, 5.0, 20.0)
    out = smooth(spark.createDataFrame(pdf), incr,
                 image_size=(N, N), size=size).toPandas()
    # numpy reference: |fftshift(ifft2(fft2(img)*fft2(beam/sum)))|
    a, b, g = beam_abc(*size, incr)
    x = (np.arange(N) - N / 2)[:, None]
    y = (np.arange(N) - N / 2)[None, :]
    beam = np.exp(-(a * x * x + b * x * y + g * y * y))
    beam = beam / beam.sum()
    ref = np.abs(np.fft.fftshift(np.fft.ifft2(np.fft.fft2(img)
                                              * np.fft.fft2(beam))))
    got = _collect_planes(out, "image")[(0, 0)]
    assert np.abs(got - ref).max() < 1e-8


def test_hogbom_production_parity(spark):
    rng = np.random.default_rng(8)
    c = N // 2
    # synthetic psf: peaked, symmetric sidelobes
    x = (np.arange(N) - c)[:, None]
    y = (np.arange(N) - c)[None, :]
    psf = np.exp(-0.1 * (x * x + y * y)) + 0.05 * np.exp(
        -0.01 * ((x - 10) ** 2 + y * y))
    psf[c, c] = 1.0
    img = rng.normal(size=(N, N)) * 0.01
    img[20, 30] += 2.0
    img[40, 44] += 1.5
    li, mi = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")

    def pl(v, name):
        return pd.DataFrame({
            "chan": np.zeros(v.size, np.int32),
            "pol": np.zeros(v.size, np.int32),
            "l_idx": li.ravel().astype(np.int32),
            "m_idx": mi.ravel().astype(np.int32),
            name: v.ravel(),
        })

    gain, niter = 0.2, 25
    out = deconvolve_point_clean(
        spark.createDataFrame(pl(img, "image")),
        spark.createDataFrame(pl(psf, "psf")),
        gain=gain, threshold=0.0, niter=niter).toPandas()
    # numpy Hogbom reference (row-major argmax like the engine)
    model = np.zeros((N, N))
    r = img.copy()
    for _ in range(niter):
        p = np.unravel_index(np.argmax(np.abs(r)), r.shape)
        mc = gain * r[p]
        model[p] += mc
        lo_l, lo_m = p[0] - c, p[1] - c
        sl = psf[max(0, -lo_l):min(N, N - lo_l),
                 max(0, -lo_m):min(N, N - lo_m)]
        r[max(0, lo_l):min(N, N + lo_l),
          max(0, lo_m):min(N, N + lo_m)] -= mc * sl
    got_m = _collect_planes(out, "model")[(0, 0)]
    got_r = _collect_planes(out, "residual")[(0, 0)]
    assert np.abs(got_m - model).max() < 1e-8
    assert np.abs(got_r - r).max() < 1e-8
