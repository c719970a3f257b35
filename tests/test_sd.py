"""Single-dish imaging operators vs independent numpy references."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.sd import (
    C_M_S,
    _FWHM_TO_SIGMA,
    make_sd_image,
    make_sd_psf,
    make_sd_weight_image,
)

N = 20
CELL = 1.0e-3
SUPPORT = 2
SIGMA = 1.1


def _sd_pdf(n_samp=200, seed=11):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "l": rng.uniform(-8e-3, 8e-3, n_samp),
        "m": rng.uniform(-8e-3, 8e-3, n_samp),
        "chan": rng.integers(0, 2, n_samp).astype(np.int32),
        "pol": np.zeros(n_samp, np.int32),
        "data": rng.normal(1.0, 0.3, n_samp),
        "weight": rng.uniform(0.5, 2.0, n_samp),
    })


def _numpy_sd(pdf):
    img = {}
    wt = {}
    for row in pdf.itertuples():
        xl = row.l / CELL + N / 2.0
        xm = row.m / CELL + N / 2.0
        bl, bm = int(np.floor(xl + 0.5)), int(np.floor(xm + 0.5))
        for di in range(-SUPPORT, SUPPORT + 1):
            for dj in range(-SUPPORT, SUPPORT + 1):
                li, mi = bl + di, bm + dj
                if not (0 <= li < N and 0 <= mi < N):
                    continue
                k = np.exp(-((li - xl) ** 2 + (mi - xm) ** 2)
                           / (2.0 * SIGMA ** 2))
                key = (row.chan, row.pol, li, mi)
                img[key] = img.get(key, 0.0) + row.weight * row.data * k
                wt[key] = wt.get(key, 0.0) + row.weight * k
    return img, wt


def test_sd_image_and_weight_match_numpy(spark):
    pdf = _sd_pdf()
    df = spark.createDataFrame(pdf)
    got = make_sd_image(df, N, N, CELL, CELL, support=SUPPORT,
                        sigma_px=SIGMA).toPandas()
    img, wt = _numpy_sd(pdf)
    assert len(got) == len(wt)
    for row in got.itertuples():
        key = (row.chan, row.pol, row.l_idx, row.m_idx)
        assert abs(row.sd_weight - wt[key]) < 1e-10
        assert abs(row.sd_image - img[key] / wt[key]) < 1e-10

    wdf = make_sd_weight_image(df, N, N, CELL, CELL, support=SUPPORT,
                               sigma_px=SIGMA).toPandas()
    assert len(wdf) == len(wt)
    for row in wdf.itertuples():
        assert abs(row.sd_weight
                   - wt[(row.chan, row.pol, row.l_idx, row.m_idx)]) < 1e-10


def test_sd_image_no_python_udf_in_plan(spark):
    # The SD gridder must stay entirely JVM-side (codegen exp + one
    # partial/final agg) — no Arrow/Python eval nodes.
    df = spark.createDataFrame(_sd_pdf(50))
    plan = (make_sd_image(df, N, N, CELL, CELL, support=SUPPORT,
                          sigma_px=SIGMA)
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_sd_psf_unit_peak_and_fwhm(spark):
    freqs = [1.0e9, 2.0e9]
    got = make_sd_psf(spark, freqs, N, N, CELL, CELL,
                      dish_diameter=25.0).toPandas()
    assert len(got) == 2 * N * N
    center = got[(got.l_idx == N // 2) & (got.m_idx == N // 2)]
    assert np.allclose(center["sd_psf"], 1.0)
    # beam narrows with frequency; check the analytic value off-center
    for f in freqs:
        sig = 1.02 * C_M_S / 25.0 / f * _FWHM_TO_SIGMA / CELL
        row = got[(got.freq == f) & (got.l_idx == N // 2 + 3)
                  & (got.m_idx == N // 2)]
        want = np.exp(-9.0 / (2.0 * sig * sig))
        assert abs(row["sd_psf"].iloc[0] - want) < 1e-12
