"""Hogbom point-source CLEAN, per-plane grouped UDF.

Reference parity: ``deconvolve_point_clean``
(``/root/reference/ngcasa/deconvolution/deconvolve_point_clean.py:90-300``):
per (chan, pol) image plane, iterate: find the absolute peak of the
residual, add ``gain·peak`` to the model at the peak position, subtract
the recentered PSF window scaled by ``gain·peak``, stop when
``|peak| <= threshold·|initial peak|`` (fractional threshold, :197-199)
or ``niter`` reached, or the peak is NaN/0.

Divergence note (intended-semantics fix, SURVEY.md §7.4): the reference
jit subtracts ``gain·psf`` *without* the peak factor
(deconvolve_point_clean.py:228 ``residual -= gain*psf[...]``), which only
converges when every peak ≈ 1. We subtract the standard
``gain·peak·psf``, which satisfies the CLEAN bookkeeping identity
``dirty = model ⊛ psf + residual`` (verified in tests).

Spark shape: iteration is confined *within* a plane, so one
``applyInPandas`` group per (chan, pol) runs the whole minor cycle — no
multi-job driver loop, matching the reference's single delayed task per
chunk (:104-118). Planes run in parallel across executors; the cube's
chan × pol extent is the scale axis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cngi_prototype_spark.imaging.planes import plane_arrays


def hogbom_clean_plane(dirty: np.ndarray, psf: np.ndarray, *,
                       gain: float, threshold: float,
                       niter: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized single-plane Hogbom loop (numpy argmax + window
    subtract — the same O(N²)-per-iteration shape as the numba kernel)."""
    residual = dirty.astype(np.float64).copy()
    model = np.zeros_like(residual)
    n_x, n_y = residual.shape
    p_x, p_y = psf.shape
    pc_x, pc_y = p_x // 2, p_y // 2

    flat = np.argmax(np.abs(residual))
    px, py = np.unravel_index(flat, residual.shape)
    peak = residual[px, py]
    if np.isnan(peak) or peak == 0.0:
        return model, residual
    scaled_threshold = threshold * abs(peak)

    for _ in range(niter):
        if abs(peak) <= scaled_threshold:
            break
        model[px, py] += gain * peak
        x0, x1 = max(px - pc_x, 0), min(px + (p_x - pc_x), n_x)
        y0, y1 = max(py - pc_y, 0), min(py + (p_y - pc_y), n_y)
        sub = psf[pc_x - (px - x0): pc_x + (x1 - px),
                  pc_y - (py - y0): pc_y + (y1 - py)]
        residual[x0:x1, y0:y1] -= gain * peak * sub
        flat = np.argmax(np.abs(residual))
        px, py = np.unravel_index(flat, residual.shape)
        peak = residual[px, py]
        if np.isnan(peak) or peak == 0.0:
            break
    return model, residual


def deconvolve_point_clean(
    image_df: DataFrame,
    psf_df: DataFrame,
    *,
    gain: float = 0.1,
    threshold: float = 0.02,
    niter: int = 100,
    chan: str = "chan",
    pol: str = "pol",
    image: str = "image",
    psf: str = "psf",
) -> DataFrame:
    """CLEAN every (chan, pol) plane → ``(chan, pol, l_idx, m_idx,
    model, residual)``. ``psf_df`` shares the plane keys and pixel
    layout of ``image_df`` (the make_psf output)."""
    schema = T.StructType([
        T.StructField(chan, T.IntegerType()),
        T.StructField(pol, T.IntegerType()),
        T.StructField("l_idx", T.IntegerType()),
        T.StructField("m_idx", T.IntegerType()),
        T.StructField("model", T.DoubleType()),
        T.StructField("residual", T.DoubleType()),
    ])

    if psf_df is image_df:
        # fused make_image_and_psf output: both cubes already share the
        # rows — skip the per-pixel join entirely
        both = image_df.select(chan, pol, "l_idx", "m_idx", image, psf)
    else:
        both = image_df.select(chan, pol, "l_idx", "m_idx", image).join(
            psf_df.select(chan, pol, "l_idx", "m_idx", psf),
            on=[chan, pol, "l_idx", "m_idx"], how="inner")

    def plane(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        li, mi, (dirty, psf_a) = plane_arrays(pdf, image, psf)
        model, residual = hogbom_clean_plane(
            dirty, psf_a, gain=gain, threshold=threshold, niter=niter)
        return pd.DataFrame({
            chan: np.full(li.size, key[0], np.int32),
            pol: np.full(li.size, key[1], np.int32),
            "l_idx": li.astype(np.int32),
            "m_idx": mi.astype(np.int32),
            "model": model[li, mi],
            "residual": residual[li, mi],
        })

    return both.groupBy(chan, pol).applyInPandas(plane, schema)
