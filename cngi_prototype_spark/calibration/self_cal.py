"""Antenna-gain self-calibration, grouped-solve + broadcast-apply.

Reference parity: ``self_cal`` / ``_gain_selfcal_chunk``
(``/root/reference/ngcasa/calibration/self_cal.py:52-543``): per solution
interval, solve ``g_i·conj(g_j) = V_ij/M_ij`` in the weighted
least-squares sense, with

- flagged / NaN / autocorrelation samples zero-weighted (:253-258),
- the vis/model ratio weighted by ``w·|M|²`` (:288-291),
- channel-averaging of the ratio before the solve (:293-303),
- optional phase-only mode (normalize |X|, weight ×|X|², :348-353),
- a reference antenna held at zero phase (:415-418),
- corrected data ``V/(g_i·conj(g_j))`` and weights ``w·|g_i g_j|²``.

Solver divergence (documented): the reference drives
``scipy.optimize.least_squares`` over the stacked real/imag gain vector
(:441-447). scipy is unavailable here; we use the classical fixed-point
iteration on the same normal equations —
``g_i ← Σ_j w_ij·X_ij·g_j / Σ_j w_ij·|g_j|²`` with damping 0.5 and
refant re-phasing each sweep — the textbook antsol algorithm CASA's
solver is built on; it converges to the same stationary point of the
same chi-square.

Spark shape: one ``applyInPandas`` group per (solution interval × pol):
the solve touches every baseline of the interval, nothing else — the
same locality the reference gets from per-time-chunk delayed tasks
(:136-143). Gains come back as a small DataFrame; applying them to the
full vis table is a broadcast join + complex-divide exprs (no UDF on
the big side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def solve_gains_interval(
    x: np.ndarray, xwt: np.ndarray,
    ant_i: np.ndarray, ant_j: np.ndarray, n_ant: int,
    *, refant: int = 0, n_iter: int = 100, tol: float = 1e-12,
) -> np.ndarray:
    """Fixed-point antsol over one interval: X[b] ≈ g[ant_i]·conj(g[ant_j])."""
    g = np.ones(n_ant, np.complex128)
    # first guess from refant baselines (reference _guess_scalar_gain_from_vis)
    for b in range(len(x)):
        if xwt[b] <= 0:
            continue
        if ant_j[b] == refant and ant_i[b] != refant:
            g[ant_i[b]] = x[b]
        elif ant_i[b] == refant and ant_j[b] != refant:
            g[ant_j[b]] = np.conj(x[b])
    for _ in range(n_iter):
        num = np.zeros(n_ant, np.complex128)
        den = np.zeros(n_ant, np.float64)
        # X_ij ≈ g_i conj(g_j): for i, partner j contributes X_ij·g_j
        np.add.at(num, ant_i, xwt * x * g[ant_j])
        np.add.at(den, ant_i, xwt * np.abs(g[ant_j]) ** 2)
        np.add.at(num, ant_j, xwt * np.conj(x) * g[ant_i])
        np.add.at(den, ant_j, xwt * np.abs(g[ant_i]) ** 2)
        ok = den > 0
        g_new = g.copy()
        g_new[ok] = num[ok] / den[ok]
        g_new = 0.5 * g + 0.5 * g_new  # damping
        # refant at zero phase
        ph = g_new[refant]
        if np.abs(ph) > 0:
            g_new = g_new * np.conj(ph / np.abs(ph))
        delta = np.max(np.abs(g_new - g))
        g = g_new
        if delta < tol:
            break
    return g


def self_cal(
    df: DataFrame,
    *,
    interval: str = "interval",
    ant1: str = "ant1",
    ant2: str = "ant2",
    chan: str = "chan",
    pol: str = "pol",
    data: tuple[str, str] = ("data_re", "data_im"),
    model: tuple[str, str] = ("model_re", "model_im"),
    weight: str = "weight",
    flag: str = "flag",
    n_ant: int | None = None,
    refant: int = 0,
    phase_only: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Solve per (interval, pol) → ``(gains_df, corrected_df)``.

    gains_df: ``(interval, pol, ant, gain_re, gain_im)``;
    corrected_df: input plus corrected data/weight columns.
    """
    if n_ant is None:
        n_ant = (df.select(F.greatest(F.col(ant1), F.col(ant2)).alias("a"))
                 .agg(F.max("a")).collect()[0][0] + 1)

    schema = T.StructType([
        T.StructField(interval, T.LongType()),
        T.StructField(pol, T.IntegerType()),
        T.StructField("ant", T.IntegerType()),
        T.StructField("gain_re", T.DoubleType()),
        T.StructField("gain_im", T.DoubleType()),
    ])
    dre, dim = data
    mre, mim = model
    cols = [interval, ant1, ant2, chan, pol, dre, dim, mre, mim, weight, flag]

    def solve(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[dre].to_numpy(float) + 1j * pdf[dim].to_numpy(float)
        mo = pdf[mre].to_numpy(float) + 1j * pdf[mim].to_numpy(float)
        w = pdf[weight].to_numpy(float)
        fl = pdf[flag].to_numpy(bool) if flag in pdf else np.zeros(len(pdf), bool)
        a1 = pdf[ant1].to_numpy(int)
        a2 = pdf[ant2].to_numpy(int)
        # zero-weight flags / NaNs / autocorrelations (:253-258)
        bad = fl | np.isnan(w) | np.isnan(v) | (a1 == a2) | (mo == 0)
        v = np.where(bad, 0, v)
        mo = np.where(bad, 1, mo)
        w = np.where(bad, 0.0, w)
        x = v / mo
        xwt = w * (mo * np.conj(mo)).real
        # average the ratio over channels per (baseline): bincount on a
        # dense (a1, a2) key (:293-303)
        bkey = a1 * n_ant + a2
        uniq, inv = np.unique(bkey, return_inverse=True)
        num = np.zeros(len(uniq), np.complex128)
        den = np.zeros(len(uniq), np.float64)
        np.add.at(num, inv, x * xwt)
        np.add.at(den, inv, xwt)
        ok = den > 0
        xb = np.where(ok, num / np.where(ok, den, 1.0), 0)
        if phase_only:
            amp = np.abs(xb)
            nz = amp > 0
            xb[nz] /= amp[nz]
            den = den * amp ** 2
        g = solve_gains_interval(xb, den, (uniq // n_ant).astype(int),
                                 (uniq % n_ant).astype(int), n_ant,
                                 refant=refant)
        return pd.DataFrame({
            interval: np.full(n_ant, key[0], np.int64),
            pol: np.full(n_ant, key[1], np.int32),
            "ant": np.arange(n_ant, dtype=np.int32),
            "gain_re": g.real, "gain_im": g.imag,
        })

    gains = df.select(*cols).groupBy(interval, pol).applyInPandas(solve, schema)

    from cngi_prototype_spark.calibration.apply_calibration import apply_calibration

    corrected = apply_calibration(
        df, gains, join_keys=[interval, pol], ant1=ant1, ant2=ant2,
        data=data, weight=weight)
    return gains, corrected
