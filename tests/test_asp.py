"""Adaptive-scale-pixel deconvolution: width selection + flux recovery."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.asp import (
    asp_plane,
    deconvolve_adaptive_scale_pixel,
    gaussian_atom,
)
from cngi_prototype_spark.imaging.mtclean import _lin_conv

N = 24


def _psf(width=1.5):
    return gaussian_atom(N, N, width)


def test_asp_selects_matching_width_and_recovers_flux():
    # A single gaussian source of width 3 observed through the psf: Asp
    # must pick the width-3 atom at the source position on iteration 1
    # and drive the residual down.
    psf = _psf()
    src = 5.0 * gaussian_atom(N, N, 3.0)
    dirty = _lin_conv(src, psf)
    model, resid, comps = asp_plane(dirty, psf, widths=[1.0, 3.0],
                                    gain=0.7, threshold=0.0, niter=20)
    assert comps[0][:3] == (N // 2, N // 2, 3.0)
    assert np.abs(resid).max() < 0.1 * np.abs(dirty).max()
    # recovered model resembles the source (peak within 15%)
    assert abs(model[N // 2, N // 2] - 5.0) < 0.75


def test_asp_point_source_picks_narrowest_atom():
    psf = _psf()
    delta = np.zeros((N, N))
    delta[8, 15] = 2.0
    dirty = _lin_conv(delta, psf)
    _, resid, comps = asp_plane(dirty, psf, widths=[0.8, 4.0],
                                gain=0.7, threshold=0.0, niter=30)
    assert comps[0][0] == 8 and comps[0][1] == 15
    assert comps[0][2] == 0.8
    assert np.abs(resid).max() < 0.1 * np.abs(dirty).max()


def test_spark_asp_matches_local_and_component_mode(spark):
    rng = np.random.default_rng(4)
    dirty = rng.normal(size=(N, N))
    psf = _psf()
    rows = [(0, 0, l, m, float(dirty[l, m]), float(psf[l, m]))
            for l in range(N) for m in range(N)]
    df = spark.createDataFrame(
        rows, schema="chan int, pol int, l_idx int, m_idx int, "
                     "image double, psf double")
    out = deconvolve_adaptive_scale_pixel(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        widths=[1.0, 2.0], gain=0.5, niter=6).toPandas()
    model, resid, comps = asp_plane(dirty, psf, widths=[1.0, 2.0],
                                    gain=0.5, threshold=0.0, niter=6)
    got_m = np.zeros((N, N))
    got_r = np.zeros((N, N))
    got_m[out["l_idx"], out["m_idx"]] = out["model"]
    got_r[out["l_idx"], out["m_idx"]] = out["residual"]
    np.testing.assert_allclose(got_m, model, atol=1e-12)
    np.testing.assert_allclose(got_r, resid, atol=1e-12)

    cdf = deconvolve_adaptive_scale_pixel(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        widths=[1.0, 2.0], gain=0.5, niter=6,
        out="components").toPandas()
    assert len(cdf) == len(comps)
    got = sorted(map(tuple, cdf[["l_idx", "m_idx", "width", "amp"]]
                     .itertuples(index=False)))
    want = sorted(comps)
    for g, w in zip(got, want):
        assert g[:3] == w[:3] and abs(g[3] - w[3]) < 1e-12
