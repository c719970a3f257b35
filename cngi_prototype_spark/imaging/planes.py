"""Shared sparse-rows → dense-plane scatter for per-plane grouped UDFs.

Every per-plane deconvolver (Hogbom, MS-Clean, MT-MFS maps, Asp,
fast-resolve) receives one ``applyInPandas`` group of long-form pixel
rows and rebuilds dense ``(n_x, n_y)`` arrays before its numpy kernel.
The sizing/fill conventions live here ONCE so they cannot drift between
operators: plane extent is ``max(idx) + 1`` per axis (the make_image
emission is dense row-major, so the max index IS the extent), absent
pixels are zero, and values are cast to float64.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def plane_arrays(pdf: pd.DataFrame, *cols: str
                 ) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Rebuild dense planes from one grouped-UDF batch →
    ``(li, mi, [plane for each of cols])``."""
    n_x = int(pdf["l_idx"].max()) + 1
    n_y = int(pdf["m_idx"].max()) + 1
    li = pdf["l_idx"].to_numpy(int)
    mi = pdf["m_idx"].to_numpy(int)
    planes = []
    for c in cols:
        a = np.zeros((n_x, n_y))
        a[li, mi] = pdf[c].to_numpy(float)
        planes.append(a)
    return li, mi, planes
