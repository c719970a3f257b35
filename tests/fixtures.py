"""Deterministic synthetic vis fixture per FIXTURES.md §1.

Long-form vis_main table: one row per (time, baseline, chan, pol), with
complex data as paired doubles, per-(time,baseline) NULL holes emulating
the reference's NaN padding, clustered flags, and scan/state/field
grouping columns. Seeded numpy -> pandas -> Spark (Arrow path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_vis_pdf(
    seed: int = 42,
    n_time: int = 20,
    n_ant: int = 4,
    n_chan: int = 8,
    pols: tuple[int, ...] = (9, 12),
    ddi: int = 0,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed + ddi)
    baselines = [(a1, a2) for a1 in range(n_ant) for a2 in range(a1, n_ant)]
    n_bl = len(baselines)
    t0 = np.datetime64("2020-01-01T00:00:00")
    rows = []
    for ti in range(n_time):
        t = t0 + np.timedelta64(10 * ti, "s")
        scan = 1 + ti // 10
        state = (ti // 5) % 2
        field = ti // (max(n_time // 3, 1))
        for bi, (a1, a2) in enumerate(baselines):
            hole = rng.random() < 0.03  # NaN-hole emulation: absent sample
            u, v, w = rng.normal(0, 100, 3)
            for ci in range(n_chan):
                for pol in pols:
                    amp = 1.0 + 0.1 * np.sin(ci / 2.0) + 0.05 * rng.normal()
                    ph = 0.1 * bi + 0.02 * ci + 0.01 * rng.normal()
                    rows.append(
                        {
                            "ddi": ddi,
                            "time": pd.Timestamp(t),
                            "baseline": bi,
                            "antenna1": a1,
                            "antenna2": a2,
                            "chan": ci,
                            "chan_freq": 100e9 + ci * 15.6e6,
                            "pol": pol,
                            "data_re": None if hole else amp * np.cos(ph),
                            "data_im": None if hole else amp * np.sin(ph),
                            "data_weight": float(rng.uniform(0.5, 2.0)),
                            "flag": bool((ci in (2, 3)) and rng.random() < 0.5),
                            "u": u,
                            "v": v,
                            "w": w,
                            "field_id": int(field),
                            "scan_number": int(scan),
                            "state_id": int(state),
                            "exposure": 10.0,
                        }
                    )
    return pd.DataFrame(rows)


def make_image_pdf(seed: int = 7, nx: int = 32, ny: int = 32, n_chan: int = 4,
                   pols: tuple[int, ...] = (9,)) -> pd.DataFrame:
    """Image fact table per FIXTURES.md §3: (l, m, chan, pol) with a
    gaussian source + noise, a centered gaussian PSF, box mask."""
    rng = np.random.default_rng(seed)
    l_idx, m_idx = np.meshgrid(np.arange(nx), np.arange(ny), indexing="ij")
    cx, cy = nx / 2, ny / 2
    rows = []
    for ci in range(n_chan):
        line = 1.0 + (0.5 if ci == n_chan // 2 else 0.0)
        src = line * np.exp(-(((l_idx - cx + 4) / 3.0) ** 2 + ((m_idx - cy - 2) / 2.0) ** 2))
        psf = np.exp(-(((l_idx - cx) / 3.0) ** 2 + ((m_idx - cy) / 2.0) ** 2))
        noise = 0.01 * rng.standard_normal((nx, ny))
        for pol in pols:
            for i in range(nx):
                for j in range(ny):
                    rows.append(
                        {
                            "l": i, "m": j, "chan": ci, "pol": pol,
                            "image": float(src[i, j] + noise[i, j]),
                            "psf": float(psf[i, j]),
                            "mask0": bool(abs(i - cx) < 10 and abs(j - cy) < 10),
                        }
                    )
    return pd.DataFrame(rows)
