"""Wiener MAP deconvolution (deconvolve_fast_resolve): recovery
properties + Spark-vs-local parity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cngi_prototype_spark.imaging.fastresolve import (
    deconvolve_fast_resolve,
    fast_resolve_plane,
)

N = 32


def _psf(width=1.5):
    x = (np.arange(N) - N // 2)[:, None]
    y = (np.arange(N) - N // 2)[None, :]
    p = np.exp(-(x * x + y * y) / (2 * width ** 2))
    p[N // 2, N // 2] = 1.0
    return p


def _cyclic_conv(m, psf):
    ker = np.roll(psf, (-(N // 2), -(N // 2)), (0, 1))
    return np.fft.ifft2(np.fft.fft2(m) * np.fft.fft2(ker)).real


def test_wiener_normal_equations():
    # the MAP estimate satisfies the regularized normal equations
    # (|P|^2 + sigma^2/s) M = conj(P) D per Fourier mode, exactly
    rng = np.random.default_rng(31)
    psf = _psf()
    d = rng.normal(size=(N, N))
    nv, s = 0.25, 2.5
    m, err = fast_resolve_plane(d, psf, noise_var=nv, prior_power=s)
    ker = np.roll(psf, (-(N // 2), -(N // 2)), (0, 1))
    P = np.fft.fft2(ker)
    M = np.fft.fft2(m)
    D = np.fft.fft2(d)
    resid = (np.abs(P) ** 2 + nv / s) * M - np.conj(P) * D
    assert np.abs(resid).max() < 1e-9
    # data can only shrink the prior: 0 < var < s; and at the modes
    # the psf actually constrains, below the noise floor too
    assert 0.0 < err < s


def test_recovers_smooth_truth_under_low_noise():
    rng = np.random.default_rng(32)
    psf = _psf(2.0)
    truth = np.zeros((N, N))
    truth[10, 12] = 3.0
    truth[20, 8] = -2.0
    dirty = _cyclic_conv(truth, psf) + 1e-3 * rng.normal(size=(N, N))
    m, _ = fast_resolve_plane(dirty, psf, noise_var=1e-3, prior_power=10.0)
    # the model peaks at the truth positions with the right signs...
    assert np.unravel_index(np.argmax(m), m.shape) == (10, 12)
    assert np.unravel_index(np.argmin(m), m.shape) == (20, 8)
    # ...and refits the data: ||B*m - d|| small relative to ||d||
    refit = _cyclic_conv(m, psf)
    assert np.abs(refit - dirty).max() < 0.02 * np.abs(dirty).max()


def test_spark_matches_local(spark):
    rng = np.random.default_rng(33)
    psf = _psf()
    planes = {(c, 0): rng.normal(size=(N, N)) for c in range(2)}
    li, mi = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    frames = [pd.DataFrame({
        "chan": np.full(N * N, c, np.int32),
        "pol": np.zeros(N * N, np.int32),
        "l_idx": li.ravel().astype(np.int32),
        "m_idx": mi.ravel().astype(np.int32),
        "image": planes[(c, 0)].ravel(),
        "psf": psf.ravel(),
    }) for c in range(2)]
    df = spark.createDataFrame(pd.concat(frames, ignore_index=True))
    out = deconvolve_fast_resolve(
        df.select("chan", "pol", "l_idx", "m_idx", "image"),
        df.select("chan", "pol", "l_idx", "m_idx", "psf"),
        noise_var=0.3, prior_power=2.0).toPandas()
    for c in range(2):
        want_m, want_e = fast_resolve_plane(planes[(c, 0)], psf,
                                            noise_var=0.3, prior_power=2.0)
        sel = out[out.chan == c]
        got_m = np.zeros((N, N))
        got_m[sel.l_idx, sel.m_idx] = sel["model"]
        np.testing.assert_allclose(got_m, want_m, atol=1e-12)
        assert np.allclose(sel["error"], want_e)


def test_fit_spectral_index_recovers_power_law(spark):
    from cngi_prototype_spark.imaging.fastresolve import fit_spectral_index
    freqs = {c: 0.8e9 * 1.3 ** c for c in range(4)}
    alpha_true, flux = -0.7, 2.5
    rows = []
    for c, f in freqs.items():
        for l in range(3):
            for m in range(3):
                a = alpha_true + 0.1 * l - 0.05 * m
                rows.append((int(c), 0, l, m,
                             float(flux * (f / 1.0e9) ** a)))
    df = spark.createDataFrame(
        rows, schema="chan int, pol int, l_idx int, m_idx int, model double")
    for precise in (False, True):
        out = fit_spectral_index(df, freqs, precise=precise).toPandas()
        assert len(out) == 9
        for r in out.itertuples():
            want = alpha_true + 0.1 * r.l_idx - 0.05 * r.m_idx
            assert abs(r.alpha - want) < 1e-9
            # ln_flux is the intercept at ln(nu)=0; recover flux at 1 GHz
            got_flux = np.exp(r.ln_flux + r.alpha * np.log(1.0e9))
            assert abs(got_flux - flux) < 1e-6


def test_fit_spectral_index_drops_singular_and_sparse_pixels(spark):
    from cngi_prototype_spark.imaging.fastresolve import fit_spectral_index
    freqs = {0: 1.0e9, 1: 1.2e9}
    rows = [
        (0, 0, 0, 0, 2.0), (1, 0, 0, 0, 1.8),   # fine: 2 chans
        (0, 0, 1, 1, 2.0),                       # only 1 chan -> dropped
        (0, 0, 2, 2, 0.0), (1, 0, 2, 2, 0.0),    # zero models -> dropped
    ]
    df = spark.createDataFrame(
        rows, schema="chan int, pol int, l_idx int, m_idx int, model double")
    out = fit_spectral_index(df, freqs).toPandas()
    assert len(out) == 1 and out.l_idx.iloc[0] == 0
