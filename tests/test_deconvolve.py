"""Hogbom CLEAN invariants (reference deconvolve_point_clean.py:90-300,
with the intended gain·peak·psf subtraction — see module docstring)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cngi_prototype_spark.imaging.deconvolve import (
    deconvolve_point_clean,
    hogbom_clean_plane,
)

N = 24


def gaussian_psf(n: int, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(n) - n // 2
    g = np.exp(-(x[:, None] ** 2 + x[None, :] ** 2) / (2 * sigma ** 2))
    return g / g.max()


def make_scene():
    psf = gaussian_psf(N)
    model_true = np.zeros((N, N))
    model_true[10, 14] = 2.0
    model_true[16, 7] = 1.0
    # dirty = true model convolved with psf (psf centered at N//2)
    dirty = np.zeros((N, N))
    for (x, y), a in np.ndenumerate(model_true):
        if a:
            for i in range(N):
                for j in range(N):
                    px, py = i - x + N // 2, j - y + N // 2
                    if 0 <= px < N and 0 <= py < N:
                        dirty[i, j] += a * psf[px, py]
    return dirty, psf, model_true


def test_clean_bookkeeping_identity():
    dirty, psf, _ = make_scene()
    model, residual = hogbom_clean_plane(dirty, psf, gain=0.2,
                                         threshold=0.01, niter=500)
    # dirty == model (*) psf + residual, exactly (window covers image
    # for interior peaks; tolerance for edge-window truncation)
    recon = np.zeros_like(dirty)
    for (x, y), a in np.ndenumerate(model):
        if a:
            for i in range(max(x - N // 2, 0), min(x + N - N // 2, N)):
                for j in range(max(y - N // 2, 0), min(y + N - N // 2, N)):
                    recon[i, j] += a * psf[i - x + N // 2, j - y + N // 2]
    np.testing.assert_allclose(recon + residual, dirty, atol=1e-10)


def test_clean_recovers_sources():
    dirty, psf, model_true = make_scene()
    model, residual = hogbom_clean_plane(dirty, psf, gain=0.2,
                                         threshold=0.01, niter=2000)
    assert np.abs(residual).max() <= 0.011 * np.abs(dirty).max() + 1e-12
    # flux concentrates at the two true positions
    assert model[10, 14] == pytest.approx(2.0, rel=0.15)
    assert model[16, 7] == pytest.approx(1.0, rel=0.15)
    others = model.copy()
    others[8:13, 12:17] = 0
    others[14:19, 5:10] = 0
    assert np.abs(others).max() < 0.2


def test_clean_sparkside_matches_local(spark):
    dirty, psf, _ = make_scene()
    li, mi = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    rows = pd.DataFrame({
        "chan": np.zeros(N * N, np.int32), "pol": np.zeros(N * N, np.int32),
        "l_idx": li.ravel().astype(np.int32), "m_idx": mi.ravel().astype(np.int32),
        "image": dirty.ravel(), "psf": psf.ravel(),
    })
    out = deconvolve_point_clean(
        spark.createDataFrame(rows.drop(columns="psf")),
        spark.createDataFrame(rows.drop(columns="image")),
        gain=0.2, threshold=0.01, niter=500,
    ).toPandas()
    model_l, residual_l = hogbom_clean_plane(dirty, psf, gain=0.2,
                                             threshold=0.01, niter=500)
    got_m = np.zeros((N, N)); got_r = np.zeros((N, N))
    got_m[out.l_idx, out.m_idx] = out.model
    got_r[out.l_idx, out.m_idx] = out.residual
    np.testing.assert_allclose(got_m, model_l, atol=1e-12)
    np.testing.assert_allclose(got_r, residual_l, atol=1e-12)
