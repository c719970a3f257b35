"""self_cal: gain recovery on synthetic corrupted visibilities
(reference ngcasa/calibration/self_cal.py:52-543 semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cngi_prototype_spark.calibration.self_cal import self_cal, solve_gains_interval

N_ANT = 8


def synth(seed=0, noise=0.0, phase_only_mag=False):
    rng = np.random.default_rng(seed)
    true_g = (rng.uniform(0.7, 1.3, N_ANT)
              * np.exp(1j * rng.uniform(-np.pi, np.pi, N_ANT)))
    if phase_only_mag:
        true_g = true_g / np.abs(true_g)
    true_g = true_g * np.conj(true_g[0] / abs(true_g[0]))  # refant zero phase
    rows = []
    for it in range(2):
        for a1 in range(N_ANT):
            for a2 in range(a1, N_ANT):
                for ch in range(3):
                    m = 2.0 + 0.1 * ch
                    v = true_g[a1] * np.conj(true_g[a2]) * m
                    v += noise * (rng.normal() + 1j * rng.normal())
                    rows.append({
                        "interval": it, "ant1": a1, "ant2": a2, "chan": ch,
                        "pol": 0, "data_re": v.real, "data_im": v.imag,
                        "model_re": m, "model_im": 0.0,
                        "weight": 1.0, "flag": False,
                    })
    return pd.DataFrame(rows), true_g


def test_solver_recovers_gains_numpy():
    pdf, true_g = synth()
    cross = pdf[(pdf.ant1 != pdf.ant2) & (pdf.interval == 0) & (pdf.chan == 0)]
    x = ((cross.data_re + 1j * cross.data_im) / cross.model_re).to_numpy()
    g = solve_gains_interval(x, np.ones(len(x)),
                             cross.ant1.to_numpy(), cross.ant2.to_numpy(), N_ANT)
    np.testing.assert_allclose(g, true_g, atol=1e-8)


def test_self_cal_spark_end_to_end(spark):
    pdf, true_g = synth(seed=3)
    gains, corrected = self_cal(spark.createDataFrame(pdf), n_ant=N_ANT)
    gp = gains.toPandas()
    assert len(gp) == 2 * N_ANT  # 2 intervals x N_ANT
    for it in range(2):
        sel = gp[gp.interval == it].sort_values("ant")
        got = sel.gain_re.to_numpy() + 1j * sel.gain_im.to_numpy()
        np.testing.assert_allclose(got, true_g, atol=1e-7)
    # corrected cross-correlation data reproduces the model
    cp = corrected.toPandas()
    cross = cp[cp.ant1 != cp.ant2]
    np.testing.assert_allclose(cross.corrected_re, cross.model_re, atol=1e-6)
    np.testing.assert_allclose(cross.corrected_im, 0.0, atol=1e-6)


def test_self_cal_ignores_flagged_rows(spark):
    pdf, true_g = synth(seed=5)
    # corrupt some rows but flag them: solution must be unaffected
    bad = pdf.sample(frac=0.2, random_state=1).index
    pdf.loc[bad, "data_re"] = 1e6
    pdf.loc[bad, "flag"] = True
    gains, _ = self_cal(spark.createDataFrame(pdf), n_ant=N_ANT)
    gp = gains.toPandas()
    sel = gp[gp.interval == 0].sort_values("ant")
    got = sel.gain_re.to_numpy() + 1j * sel.gain_im.to_numpy()
    np.testing.assert_allclose(got, true_g, atol=1e-7)
