"""MS-Clean / MT-MFS deconvolution: recovery properties + parity with
deconvolve_point_clean in the degenerate case."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.deconvolve import hogbom_clean_plane
from cngi_prototype_spark.imaging.mtclean import (
    _lin_conv,
    deconvolve_multiterm_clean,
    evaluate_taylor_to_cube,
    msclean_plane,
    mtmfs_cube,
    scale_kernel,
    spectral_index_map,
)

N = 24


def _psf(n=N, width=1.5):
    x = (np.arange(n) - n // 2)[:, None]
    y = (np.arange(n) - n // 2)[None, :]
    return np.exp(-(x * x + y * y) / (2 * width ** 2))


def test_lin_conv_matches_direct_sum():
    rng = np.random.default_rng(0)
    a, k = rng.normal(size=(9, 9)), rng.normal(size=(9, 9))
    want = np.zeros((9, 9))
    c = 4
    for x in range(9):
        for y in range(9):
            s = 0.0
            for p in range(9):
                for q in range(9):
                    i, j = x + c - p, y + c - q
                    if 0 <= i < 9 and 0 <= j < 9:
                        s += a[p, q] * k[i, j]
            want[x, y] = s
    np.testing.assert_allclose(_lin_conv(a, k), want, atol=1e-12)


def test_scale_kernel_volume_and_delta():
    k0 = scale_kernel(N, N, 0.0)
    assert k0[N // 2, N // 2] == 1.0 and k0.sum() == 1.0
    k3 = scale_kernel(N, N, 3.0)
    assert abs(k3.sum() - 1.0) < 1e-12
    assert k3[N // 2, N // 2] == k3.max()


def test_msclean_scale0_only_matches_hogbom():
    # nscales=1 (scale 0) degenerates to point CLEAN: same peaks, same
    # subtraction bookkeeping (reference: "the special case ... is the
    # same use-case as deconvolve_point_clean").
    rng = np.random.default_rng(1)
    dirty = rng.normal(size=(N, N))
    psf = _psf()
    m_ms, r_ms = msclean_plane(dirty, psf, scales=[0.0], gain=0.1,
                               threshold=0.0, niter=12)
    m_hb, r_hb = hogbom_clean_plane(dirty, psf, gain=0.1, threshold=0.0,
                                    niter=12)
    np.testing.assert_allclose(m_ms, m_hb, atol=1e-10)
    np.testing.assert_allclose(r_ms, r_hb, atol=1e-10)


def test_msclean_recovers_extended_source_flux():
    # An extended (scale-4) gaussian blob convolved with the psf: MS
    # CLEAN at matching scales must remove most of the dirty flux into
    # the model and the bookkeeping dirty = model⊛psf... holds loosely;
    # check residual shrinks and model flux is positive-definite.
    psf = _psf()
    blob = _lin_conv(scale_kernel(N, N, 4.0) * 50.0, psf)
    model, resid = msclean_plane(blob, psf, scales=[0.0, 2.0, 4.0],
                                 gain=0.2, threshold=0.0, niter=60)
    assert np.abs(resid).max() < 0.25 * np.abs(blob).max()
    assert model.sum() > 0


def test_mtmfs_recovers_point_source_spectrum():
    # Point source with flux I(ν) = I0·(1 + α·ω): Taylor maps must
    # recover m0 ≈ I0 and m1/m0 ≈ α at the source pixel.
    freqs = np.array([0.9e9, 1.0e9, 1.1e9])
    nu0 = freqs.mean()
    w = (freqs - nu0) / nu0
    I0, alpha = 3.0, -0.7
    psf = _psf()
    px, py = 10, 14
    res = np.zeros((3, N, N))
    psf_c = np.stack([psf] * 3)
    for c in range(3):
        delta = np.zeros((N, N))
        delta[px, py] = I0 * (1.0 + alpha * w[c])
        res[c] = _lin_conv(delta, psf)
    models, R = mtmfs_cube(res, psf_c, freqs, gain=0.3, threshold=0.0,
                           niter=80)
    assert abs(models[0, px, py] - I0) < 0.05 * I0
    assert abs(models[1, px, py] / models[0, px, py] - alpha) < 0.1
    assert np.abs(R[0]).max() < 0.05 * I0


def _plane_df(spark, arrs: dict, chans, pol=0):
    rows = []
    for c in chans:
        img, psf = arrs[c]
        for l in range(N):
            for m in range(N):
                rows.append((c, pol, l, m, float(img[l, m]), float(psf[l, m])))
    return spark.createDataFrame(
        rows, schema="chan int, pol int, l_idx int, m_idx int, "
                     "image double, psf double")


def test_spark_msclean_matches_local(spark):
    rng = np.random.default_rng(2)
    dirty = rng.normal(size=(N, N))
    psf = _psf()
    df = _plane_df(spark, {0: (dirty, psf)}, [0])
    out = deconvolve_multiterm_clean(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        scales=[0.0, 2.0], gain=0.1, niter=8).toPandas()
    model, resid = msclean_plane(dirty, psf, scales=[0.0, 2.0], gain=0.1,
                                 threshold=0.0, niter=8)
    got_m = np.zeros((N, N))
    got_r = np.zeros((N, N))
    got_m[out["l_idx"], out["m_idx"]] = out["model"]
    got_r[out["l_idx"], out["m_idx"]] = out["residual"]
    np.testing.assert_allclose(got_m, model, atol=1e-12)
    np.testing.assert_allclose(got_r, resid, atol=1e-12)


def test_spark_mtmfs_and_derived_maps(spark):
    freqs = {0: 0.9e9, 1: 1.0e9, 2: 1.1e9}
    nu = np.array([freqs[c] for c in sorted(freqs)])
    psf = _psf()
    rng = np.random.default_rng(3)
    arrs = {}
    res = np.zeros((3, N, N))
    for c in sorted(freqs):
        r = rng.normal(size=(N, N))
        arrs[c] = (r, psf)
        res[c] = r
    df = _plane_df(spark, arrs, sorted(freqs))
    tay = deconvolve_multiterm_clean(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        nterms=2, freqs=freqs, gain=0.2, niter=6)
    tay_pdf = tay.toPandas()
    models, R = mtmfs_cube(res, np.stack([psf] * 3), nu, gain=0.2,
                           threshold=0.0, niter=6)
    for t in range(2):
        sel = tay_pdf[tay_pdf["term"] == t]
        got_m = np.zeros((N, N))
        got_m[sel["l_idx"], sel["m_idx"]] = sel["model"]
        np.testing.assert_allclose(got_m, models[t], atol=1e-12)

    # derived surfaces run and have the right shape
    alpha = spectral_index_map(tay).toPandas()
    assert (np.abs(alpha["alpha"]) < np.inf).all()
    cube = evaluate_taylor_to_cube(tay, freqs).toPandas()
    assert set(cube["chan"]) == {0, 1, 2}
    # evaluation identity: model_c = m0 + omega_c*m1 at a spot pixel
    m0 = models[0, 5, 5]
    m1 = models[1, 5, 5]
    w0 = (freqs[0] - nu.mean()) / nu.mean()
    spot = cube[(cube.chan == 0) & (cube.l_idx == 5) & (cube.m_idx == 5)]
    if len(spot):
        assert abs(spot["model"].iloc[0] - (m0 + w0 * m1)) < 1e-12


def test_spark_mtmfs_raises_on_channel_missing_from_freqs(spark):
    import pytest as _pytest
    freqs = {0: 0.9e9, 1: 1.0e9}  # chan 2 present in data, not here
    psf = _psf()
    rng = np.random.default_rng(5)
    arrs = {c: (rng.normal(size=(N, N)), psf) for c in range(3)}
    df = _plane_df(spark, arrs, [0, 1, 2])
    out = deconvolve_multiterm_clean(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        nterms=2, freqs=freqs, gain=0.2, niter=2)
    with _pytest.raises(Exception, match="missing from freqs"):
        out.collect()
