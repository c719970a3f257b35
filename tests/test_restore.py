"""feather / restore_model / linear_mosaic / make_mask / is_converged
against independent numpy references (reference-stub semantics, see
imaging/restore.py docstring)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.restore import (
    _beam_transfer,
    _gaussian_beam_array,
    feather,
    is_converged,
    linear_mosaic,
    make_mask,
    restore_model,
)

N = 16
INCR = (1.0e-4, 1.0e-4)


def _plane_df(spark, arr: np.ndarray, dv: str):
    n_l, n_m = arr.shape
    pdf = pd.DataFrame({
        "chan": 0, "pol": 0,
        "l_idx": np.repeat(np.arange(n_l, dtype=np.int32), n_m),
        "m_idx": np.tile(np.arange(n_m, dtype=np.int32), n_l),
        dv: arr.ravel(),
    })
    return spark.createDataFrame(pdf)


def _to_plane(df, dv: str, n: int = N) -> np.ndarray:
    pdf = df.toPandas()
    out = np.zeros((n, n))
    out[pdf["l_idx"].to_numpy(int), pdf["m_idx"].to_numpy(int)] = pdf[dv]
    return out


def _rng_plane(seed: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(0, 1, (N, N))


def test_feather_matches_numpy_formula(spark):
    low, high = _rng_plane(1), _rng_plane(2)
    size = (90.0, 60.0, 30.0)
    got = _to_plane(
        feather(_plane_df(spark, low, "image"), _plane_df(spark, high, "image"),
                INCR, image_size=(N, N), low_beam_size=size),
        "image")
    fb = _beam_transfer(_gaussian_beam_array(N, N, size, INCR, "sum"))
    want = np.real(np.fft.ifft2(np.fft.fft2(low) + (1.0 - fb) * np.fft.fft2(high)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_feather_flux_and_identity_limits(spark):
    # With high == 0 the output is exactly the low-res map (FT identity);
    # total flux always comes from the low map plus the beam-filtered high.
    low, high = _rng_plane(3), np.zeros((N, N))
    size = (90.0, 90.0, 0.0)
    got = _to_plane(
        feather(_plane_df(spark, low, "image"), _plane_df(spark, high, "image"),
                INCR, image_size=(N, N), low_beam_size=size),
        "image")
    np.testing.assert_allclose(got, low, atol=1e-12)


def test_restore_model_delta_reproduces_beam_plus_residual(spark):
    # A unit delta at the center restores to the unit-peak beam itself.
    size = (75.0, 50.0, 20.0)
    model = np.zeros((N, N))
    model[N // 2, N // 2] = 1.0
    res = _rng_plane(4) * 0.01
    got = _to_plane(
        restore_model(_plane_df(spark, model, "model"),
                      _plane_df(spark, res, "residual"),
                      INCR, image_size=(N, N), beam_size=size),
        "restored")
    beam = _gaussian_beam_array(N, N, size, INCR, "peak")
    np.testing.assert_allclose(got, beam + res, atol=1e-12)


def test_linear_mosaic_weighted_combine(spark):
    # Two 4x4 fields offset by (0,0) and (2,1) on an 8x8 mosaic:
    # overlap pixels must be sum(img)/sum(pb); singles pass through as
    # img/pb (flat-noise in, flat-sky out).
    rng = np.random.default_rng(5)
    rows = []
    for f, (ol, om) in ((0, (0, 0)), (1, (2, 1))):
        for l in range(4):
            for m in range(4):
                pb = 0.3 + 0.7 * rng.random()
                sky = rng.normal()
                rows.append((f, l, m, pb * sky, pb))
    df = spark.createDataFrame(
        rows, schema="field int, l_idx int, m_idx int, image double, pb double")
    got = linear_mosaic(df, {0: (0, 0), 1: (2, 1)}).toPandas()

    acc_img = {}
    acc_pb = {}
    for f, l, m, img, pb in rows:
        ol, om = (0, 0) if f == 0 else (2, 1)
        key = (l + ol, m + om)
        acc_img[key] = acc_img.get(key, 0.0) + img
        acc_pb[key] = acc_pb.get(key, 0.0) + pb
    want = {k: acc_img[k] / acc_pb[k] for k in acc_img}
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert abs(r["image"] - want[(r["l_idx"], r["m_idx"])]) < 1e-12


def test_make_mask_intersection(spark):
    img = _rng_plane(6)
    pb = np.abs(_rng_plane(7))
    pdf = pd.DataFrame({
        "chan": 0, "pol": 0,
        "l_idx": np.repeat(np.arange(N, dtype=np.int32), N),
        "m_idx": np.tile(np.arange(N, dtype=np.int32), N),
        "image": img.ravel(), "pb": pb.ravel(),
        "region": (np.arange(N * N) % 3 == 0),
    })
    df = spark.createDataFrame(pdf)
    out = make_mask(df, pb="pb", pb_limit=0.5, frac=0.4,
                    region="region").toPandas()
    peak = np.abs(img).max()
    want = ((pb.ravel() > 0.5)
            & (np.abs(img.ravel()) > 0.4 * peak)
            & pdf["region"].to_numpy())
    got = out.sort_values(["l_idx", "m_idx"])["mask"].to_numpy()
    idx = np.lexsort((pdf["m_idx"], pdf["l_idx"]))
    np.testing.assert_array_equal(got, want[idx])
    assert len(out) == N * N  # masks are data: no rows dropped


@pytest.mark.parametrize(
    "niter_done,peak_scale,want_converged",
    [(10, 1.0, False),      # loud residual, iterations remain
     (100, 1.0, True),      # niter exhausted
     (10, 1e-9, True)])     # peak below threshold
def test_is_converged_criteria(spark, niter_done, peak_scale, want_converged):
    res = _rng_plane(8) * peak_scale
    df = _plane_df(spark, res, "residual")
    row = is_converged(df, niter_done=niter_done, niter=100,
                       threshold=1e-3, psf_sidelobe_level=0.2).collect()[0]
    peak = np.abs(res).max()
    assert row["converged"] == want_converged
    assert abs(row["peak_residual"] - peak) < 1e-14
    assert abs(row["cyclethreshold"] - max(1e-3, 0.2 * peak)) < 1e-14
    assert row["n_pix"] == N * N


def test_is_converged_respects_mask(spark):
    res = _rng_plane(9)
    pdf = pd.DataFrame({
        "chan": 0, "pol": 0,
        "l_idx": np.repeat(np.arange(N, dtype=np.int32), N),
        "m_idx": np.tile(np.arange(N, dtype=np.int32), N),
        "residual": res.ravel(),
        "mask": np.arange(N * N) % 2 == 0,
    })
    df = spark.createDataFrame(pdf)
    row = is_converged(df, niter_done=0, niter=10, threshold=1e-3,
                       mask="mask").collect()[0]
    want = np.abs(res.ravel()[::2]).max()
    assert abs(row["peak_residual"] - want) < 1e-14
    assert row["n_pix"] == N * N // 2


def test_linear_mosaic_keeps_cube_planes_separate(spark):
    # cube inputs must combine per (chan, pol) plane, not collapse
    rows = []
    for ch in (0, 1):
        for f, (ol, om) in ((0, (0, 0)), (1, (1, 0))):
            for l in range(2):
                for m in range(2):
                    rows.append((ch, 0, f, l, m, float(ch + 1), 1.0))
    df = spark.createDataFrame(
        rows, schema="chan int, pol int, field int, l_idx int, m_idx int, "
                     "image double, pb double")
    out = linear_mosaic(df, {0: (0, 0), 1: (1, 0)}).toPandas()
    assert set(out["chan"]) == {0, 1}
    for ch in (0, 1):
        vals = out[out.chan == ch]["image"]
        assert (abs(vals - (ch + 1)) < 1e-12).all()
    # explicit plane_keys=() collapses on purpose
    merged = linear_mosaic(df, {0: (0, 0), 1: (1, 0)},
                           plane_keys=()).toPandas()
    assert "chan" not in merged.columns
