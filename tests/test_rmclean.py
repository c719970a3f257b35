"""RM synthesis + RM-CLEAN: truth recovery on synthetic Faraday screens."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.rmclean import (
    deconvolve_rotation_measure_clean,
    evaluate_rm_model_to_cube,
    faraday_depth_transform,
    lambda_sq_offsets,
    rm_clean_block,
    rm_clean_pixel,
    rmtf_values,
)

FREQS = {c: 1.0e9 + c * 5.0e7 for c in range(8)}
PHI = [float(p) for p in np.linspace(-40.0, 40.0, 21)]  # step 4 rad/m^2


def _screen_pdf(phi0: float, p0: complex, n_pix: int = 4) -> pd.DataFrame:
    """Uniform Faraday screen: P_c = p0·exp(2i·φ0·Δ_c) at every pixel."""
    lam2, l20 = lambda_sq_offsets(FREQS)
    rows = []
    for pix in range(n_pix):
        for c, d in zip(sorted(FREQS), lam2 - l20):
            pc = p0 * np.exp(2j * phi0 * d)
            rows.append((pix // 2, pix % 2, c, pc.real, pc.imag))
    return pd.DataFrame(rows, columns=["l_idx", "m_idx", "chan", "q", "u"])


def test_faraday_transform_peaks_at_screen_depth(spark):
    phi0 = PHI[13]  # on-grid depth
    df = spark.createDataFrame(_screen_pdf(phi0, 2.0 + 1.0j))
    spec = faraday_depth_transform(df, FREQS, PHI).toPandas()
    one = spec[(spec.l_idx == 0) & (spec.m_idx == 0)]
    amp = np.hypot(one["f_re"], one["f_im"])
    assert one.loc[amp.idxmax(), "phi"] == phi0
    # at the true depth the transform derotates exactly -> recovers p0
    at0 = one[one.phi == phi0].iloc[0]
    assert abs(at0["f_re"] - 2.0) < 1e-10
    assert abs(at0["f_im"] - 1.0) < 1e-10


def test_faraday_transform_matches_numpy():
    # pure-numpy twin of the Catalyst expression
    lam2, l20 = lambda_sq_offsets(FREQS)
    d = lam2 - l20
    rng = np.random.default_rng(7)
    qv = rng.normal(size=d.size)
    uv = rng.normal(size=d.size)
    p = qv + 1j * uv
    for phi in (PHI[3], PHI[10]):
        want = (p * np.exp(-2j * phi * d)).mean()
        got_re = (qv * np.cos(2 * phi * d) + uv * np.sin(2 * phi * d)).mean()
        got_im = (uv * np.cos(2 * phi * d) - qv * np.sin(2 * phi * d)).mean()
        assert abs(complex(got_re, got_im) - want) < 1e-12


def test_rm_clean_pixel_recovers_single_component():
    phi = np.asarray(PHI)
    phi0_idx = 13
    lam2, l20 = lambda_sq_offsets(FREQS)
    d = lam2 - l20
    p0 = 3.0 - 0.5j
    pc = p0 * np.exp(2j * phi[phi0_idx] * d)
    f = np.array([(pc * np.exp(-2j * ph * d)).mean() for ph in phi])
    mat = np.empty((phi.size, phi.size), np.complex128)
    for j in range(phi.size):
        mat[:, j] = rmtf_values(FREQS, phi - phi[j])
    model, resid = rm_clean_pixel(f, mat, gain=0.3, threshold=0.0,
                                  niter=200)
    flux = model.sum()
    assert abs(flux - p0) < 0.05 * abs(p0)
    assert np.abs(resid).max() < 0.05 * abs(p0)
    assert np.argmax(np.abs(model)) == phi0_idx


def test_rm_clean_block_bit_identical_to_scalar():
    # the vectorized block loop must reproduce the scalar per-pixel
    # loop exactly (same argmax, same subtract order) — incl. pixels
    # that stop early under a nonzero threshold
    phi = np.asarray(PHI)
    rng = np.random.default_rng(11)
    npix = 7
    f = rng.normal(size=(npix, phi.size)) + 1j * rng.normal(size=(npix, phi.size))
    f[3] *= 1e-3  # early-stopper under the shared absolute iterations
    mat = np.empty((phi.size, phi.size), np.complex128)
    for j in range(phi.size):
        mat[:, j] = rmtf_values(FREQS, phi - phi[j])
    for thr in (0.0, 0.3):
        mb, rb = rm_clean_block(f, mat, gain=0.25, threshold=thr, niter=40)
        for i in range(npix):
            mp, rp = rm_clean_pixel(f[i], mat, gain=0.25, threshold=thr,
                                    niter=40)
            np.testing.assert_array_equal(mb[i], mp)
            np.testing.assert_array_equal(rb[i], rp)


def test_spark_rm_clean_and_back_evaluation(spark):
    phi0 = PHI[7]
    p0 = 2.5 + 0.5j
    pdf = _screen_pdf(phi0, p0)
    df = spark.createDataFrame(pdf)
    out = deconvolve_rotation_measure_clean(
        df, FREQS, PHI, gain=0.3, niter=200).toPandas()
    one = out[(out.l_idx == 0) & (out.m_idx == 0)]
    peak = one.loc[np.hypot(one.model_re, one.model_im).idxmax()]
    assert peak["phi"] == phi0
    total = complex(one["model_re"].sum(), one["model_im"].sum())
    assert abs(total - p0) < 0.05 * abs(p0)

    cube = evaluate_rm_model_to_cube(
        spark.createDataFrame(out), FREQS).toPandas()
    merged = cube.merge(pdf, on=["l_idx", "m_idx", "chan"],
                        suffixes=("_got", "_want"))
    assert len(merged) == len(pdf)
    np.testing.assert_allclose(merged["q_got"], merged["q_want"],
                               atol=0.05 * abs(p0))
    np.testing.assert_allclose(merged["u_got"], merged["u_want"],
                               atol=0.05 * abs(p0))
