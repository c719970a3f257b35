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


# ---- round-5 deconvolvers at mid-size vs the in-process numpy forms
# (the unrolled-CTE twins pin 8x8 shapes; these protect the production
# path between those shapes and the rows-only registrations) ----

M = 48


def _mid_psf(n=M, width=1.8):
    x = (np.arange(n) - n // 2)[:, None]
    y = (np.arange(n) - n // 2)[None, :]
    p = np.exp(-(x * x + y * y) / (2 * width ** 2))
    p[n // 2, n // 2] = 1.0
    return p


def _plane_rows(spark, planes):
    """planes: {(chan, pol): (img, psf)} -> one DataFrame with both."""
    frames = []
    for (c, p), (img, psf) in planes.items():
        li, mi = np.meshgrid(np.arange(img.shape[0]),
                             np.arange(img.shape[1]), indexing="ij")
        frames.append(pd.DataFrame({
            "chan": np.full(img.size, c, np.int32),
            "pol": np.full(img.size, p, np.int32),
            "l_idx": li.ravel().astype(np.int32),
            "m_idx": mi.ravel().astype(np.int32),
            "image": img.ravel(), "psf": psf.ravel()}))
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def test_msclean_production_parity(spark):
    from cngi_prototype_spark.imaging.mtclean import (
        deconvolve_multiterm_clean, msclean_plane)
    rng = np.random.default_rng(21)
    psf = _mid_psf()
    planes = {(c, 0): (rng.normal(size=(M, M)), psf) for c in range(2)}
    df = _plane_rows(spark, planes)
    out = deconvolve_multiterm_clean(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        scales=[0.0, 2.0, 4.0], gain=0.15, niter=15).toPandas()
    for c in range(2):
        want_m, want_r = msclean_plane(
            planes[(c, 0)][0], psf, scales=[0.0, 2.0, 4.0], gain=0.15,
            threshold=0.0, niter=15)
        sel = out[out.chan == c]
        got_m = np.zeros((M, M))
        got_r = np.zeros((M, M))
        got_m[sel.l_idx, sel.m_idx] = sel["model"]
        got_r[sel.l_idx, sel.m_idx] = sel["residual"]
        assert np.abs(got_m - want_m).max() < 1e-8
        assert np.abs(got_r - want_r).max() < 1e-8


@pytest.mark.parametrize("precise", [True, False])
def test_mtmfs_production_parity_64chan(spark, precise):
    # 64 chans x 48^2: the cube never reaches Python — the Catalyst
    # pre-reduction must reproduce the in-process Taylor sums. precise
    # (sorted fold) is bit-comparable; the production SUM path is
    # order-free doubles, compared at the reference's 1e-8.
    from cngi_prototype_spark.imaging.mtclean import (
        deconvolve_multiterm_clean, mtmfs_cube)
    nchan = 64
    freqs = {c: 0.9e9 + c * 4.0e6 for c in range(nchan)}
    nu = np.array([freqs[c] for c in sorted(freqs)])
    rng = np.random.default_rng(22)
    psf = _mid_psf()
    res = rng.normal(size=(nchan, M, M))
    planes = {(c, 0): (res[c], psf) for c in range(nchan)}
    df = _plane_rows(spark, planes).repartition(16)
    out = deconvolve_multiterm_clean(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        nterms=2, freqs=freqs, gain=0.2, niter=10,
        precise=precise).toPandas()
    models, R = mtmfs_cube(res, np.stack([psf] * nchan), nu, gain=0.2,
                           threshold=0.0, niter=10)
    tol = 1e-12 if precise else 1e-8
    for t in range(2):
        sel = out[out.term == t]
        got_m = np.zeros((M, M))
        got_r = np.zeros((M, M))
        got_m[sel.l_idx, sel.m_idx] = sel["model"]
        got_r[sel.l_idx, sel.m_idx] = sel["residual"]
        assert np.abs(got_m - models[t]).max() < tol
        assert np.abs(got_r - R[t]).max() < tol


def test_asp_production_parity(spark):
    from cngi_prototype_spark.imaging.asp import (
        asp_plane, deconvolve_adaptive_scale_pixel)
    rng = np.random.default_rng(23)
    psf = _mid_psf()
    dirty = rng.normal(size=(M, M))
    df = _plane_rows(spark, {(0, 0): (dirty, psf)})
    out = deconvolve_adaptive_scale_pixel(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        widths=[1.0, 2.0, 4.0], gain=0.5, niter=12).toPandas()
    model, resid, _ = asp_plane(dirty, psf, widths=[1.0, 2.0, 4.0],
                                gain=0.5, threshold=0.0, niter=12)
    got_m = np.zeros((M, M))
    got_r = np.zeros((M, M))
    got_m[out.l_idx, out.m_idx] = out["model"]
    got_r[out.l_idx, out.m_idx] = out["residual"]
    assert np.abs(got_m - model).max() < 1e-8
    assert np.abs(got_r - resid).max() < 1e-8


def test_rmclean_production_parity(spark):
    # 8x8 pixels x 16 chans x 25 phi, production (double) transform,
    # vs the numpy transform + scalar per-pixel CLEAN
    from cngi_prototype_spark.imaging.rmclean import (
        deconvolve_rotation_measure_clean, lambda_sq_offsets,
        rm_clean_pixel, rmtf_values)
    freqs = {c: 1.0e9 + c * 3.0e7 for c in range(16)}
    phi_grid = [float(p) for p in np.linspace(-50.0, 50.0, 25)]
    phi = np.asarray(phi_grid)
    lam2, l20 = lambda_sq_offsets(freqs)
    d = lam2 - l20
    rng = np.random.default_rng(24)
    npx = 8
    qv = rng.normal(size=(npx * npx, 16))
    uv = rng.normal(size=(npx * npx, 16))
    rows = []
    for pix in range(npx * npx):
        for ci, c in enumerate(sorted(freqs)):
            rows.append((pix // npx, pix % npx, c,
                         float(qv[pix, ci]), float(uv[pix, ci])))
    df = spark.createDataFrame(
        rows, schema="l_idx int, m_idx int, chan int, q double, u double")
    out = deconvolve_rotation_measure_clean(
        df, freqs, phi_grid, gain=0.25, niter=25,
        precise=False).toPandas()
    mat = np.empty((phi.size, phi.size), np.complex128)
    for j in range(phi.size):
        mat[:, j] = rmtf_values(freqs, phi - phi[j])
    for pix in (0, 27, 63):
        p = qv[pix] + 1j * uv[pix]
        f = np.array([(p * np.exp(-2j * ph * d)).mean() for ph in phi])
        want_m, want_r = rm_clean_pixel(f, mat, gain=0.25, threshold=0.0,
                                        niter=25)
        sel = out[(out.l_idx == pix // npx)
                  & (out.m_idx == pix % npx)].sort_values("phi_idx")
        assert np.abs(sel["model_re"].to_numpy() - want_m.real).max() < 1e-8
        assert np.abs(sel["model_im"].to_numpy() - want_m.imag).max() < 1e-8
        assert np.abs(sel["resid_re"].to_numpy() - want_r.real).max() < 1e-8
        assert np.abs(sel["resid_im"].to_numpy() - want_r.imag).max() < 1e-8


def test_dense_gridder_salt_probe_parity(spark):
    # centrally-condensed uv (triggers the hot-group probe) gridded
    # with and without stats-driven sub-salting must agree at the
    # reference tolerance — salting only changes partial-row
    # boundaries, never the accumulated planes
    from cngi_prototype_spark.imaging.image import make_image as mi
    rng = np.random.default_rng(41)
    n = 6000
    uu = rng.uniform(-9000, 9000, (4, n)).mean(0)
    vv = rng.uniform(-9000, 9000, (4, n)).mean(0)
    # pin 60% of rows into one tiny uv neighborhood: that (plane,
    # u-slab) group holds >> total/npart rows, so the fair-share
    # trigger (grid.py) MUST classify it hot — the test then proves
    # the engaged salt path is value-identical, not just the no-op one
    kcold = n * 6 // 10
    uu[:kcold] = rng.uniform(-40.0, 40.0, kcold)
    vv[:kcold] = rng.uniform(-40.0, 40.0, kcold)
    pdf = pd.DataFrame({
        "u": uu, "v": vv, "freq": np.full(n, 1.0e9),
        "chan": np.zeros(n, np.int32),
        "pol": rng.integers(0, 2, n).astype(np.int32),
        "data_re": rng.normal(size=n), "data_im": rng.normal(size=n),
        "weight": rng.uniform(0.5, 2.0, n),
    })
    df = spark.createDataFrame(pdf).repartition(8).persist()
    df.count()
    kw = dict(image_size=(N, N), weight="weight", variant="kernel",
              n_planes=2, output="planes")
    plain = mi(df, GP, **kw).toPandas()
    salted = mi(df, GP, salt_probe=True, **kw).toPandas()
    df.unpersist()
    assert len(plain) == len(salted)
    pm = {(r.chan, r.pol): np.asarray(r.image) for r in plain.itertuples()}
    sm = {(r.chan, r.pol): np.asarray(r.image) for r in salted.itertuples()}
    assert set(pm) == set(sm)
    for k in pm:
        assert np.abs(pm[k] - sm[k]).max() < 1e-8
