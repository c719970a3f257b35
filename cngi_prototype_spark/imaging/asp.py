"""Adaptive-scale-pixel (Asp) deconvolution.

Reference parity: ``deconvolve_adaptive_scale_pixel``
(``/root/reference/ngcasa/deconvolution/deconvolve_adaptive_scale_pixel.py:21-37``
— specified stub): "Sky model — a linear combination of 2D gaussians.
Algorithm — chi-square minimization on atom parameters, with subspace
selections. Output — cube model image and/or a list of flux components."

Compact faithful form (Bhatnagar & Cornwell 2004, discretized): the
atom subspace is a fixed set of gaussian widths; at each iteration,
take the residual peak position, and for every width ``w`` solve the
chi-square-optimal amplitude in closed form against the dirty atom
``B_w = G_w ⊛ psf`` (windowed at edges):

    amp_w = ⟨R, B_w(·−p)⟩ / ⟨B_w(·−p), B_w(·−p)⟩

The χ² reduction of the fit is ``amp_w·⟨R, B_w(·−p)⟩``; the width with
the largest reduction wins (the spec's "subspace selection"), the atom
``gain·amp·G_w`` enters the component list / model, and
``gain·amp·B_w`` is subtracted from the residual.

Spark shape: iteration is confined within a (chan, pol) plane → one
``applyInPandas`` group per plane, planes parallel across executors
(the deconvolve_point_clean rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cngi_prototype_spark.imaging.planes import plane_arrays

from cngi_prototype_spark.imaging.mtclean import (
    _lin_conv,
    _shift_window,
    _window_subtract,
)


def gaussian_atom(n_x: int, n_y: int, width_px: float) -> np.ndarray:
    """Unit-peak centered circular gaussian atom."""
    x = (np.arange(n_x) - n_x // 2)[:, None]
    y = (np.arange(n_y) - n_y // 2)[None, :]
    return np.exp(-(x * x + y * y) / (2.0 * float(width_px) ** 2))


def asp_plane(dirty: np.ndarray, psf: np.ndarray, *,
              widths: list[float], gain: float, threshold: float,
              niter: int) -> tuple[np.ndarray, np.ndarray, list[tuple]]:
    """Single-plane Asp loop → (evaluated model image, residual,
    components [(l, m, width, amp), ...])."""
    resid = dirty.astype(np.float64).copy()
    atoms = [gaussian_atom(*dirty.shape, w) for w in widths]
    batoms = [_lin_conv(psf, a) for a in atoms]
    comps: list[tuple] = []

    peak0 = float(np.abs(resid).max())
    if not np.isfinite(peak0) or peak0 == 0.0:
        return np.zeros_like(resid), resid, comps
    stop = threshold * peak0

    for _ in range(niter):
        flat = int(np.argmax(np.abs(resid)))
        px, py = np.unravel_index(flat, resid.shape)
        if abs(resid[px, py]) <= stop:
            break
        best_w, best_red, best_amp = -1, 0.0, 0.0
        tx, ty, kx, ky = _shift_window(resid.shape, px, py)  # width-indep.
        for wi, b in enumerate(batoms):
            bw = b[kx, ky]
            den = float((bw * bw).sum())
            if den == 0.0:
                continue
            num = float((resid[tx, ty] * bw).sum())
            amp = num / den
            red = amp * num
            if red > best_red:
                best_w, best_red, best_amp = wi, red, amp
        if best_w < 0:
            break
        amp = gain * best_amp
        comps.append((int(px), int(py), float(widths[best_w]), float(amp)))
        _window_subtract(resid, batoms[best_w], px, py, amp)

    model = np.zeros_like(resid)
    for px, py, w, amp in comps:
        wi = widths.index(w)
        tx, ty, kx, ky = _shift_window(model.shape, px, py)
        model[tx, ty] += amp * atoms[wi][kx, ky]
    return model, resid, comps


def deconvolve_adaptive_scale_pixel(
    image_df: DataFrame,
    psf_df: DataFrame,
    *,
    widths: list[float] | None = None,
    gain: float = 0.7,
    threshold: float = 0.0,
    niter: int = 10,
    out: str = "image",
    chan: str = "chan",
    pol: str = "pol",
    image: str = "image",
    psf: str = "psf",
) -> DataFrame:
    """Asp-CLEAN every (chan, pol) plane.

    ``out='image'`` → ``(chan, pol, l_idx, m_idx, model, residual)``;
    ``out='components'`` → the flux-component list
    ``(chan, pol, l_idx, m_idx, width, amp)``.
    """
    widths = widths if widths is not None else [1.0, 2.0, 4.0]

    if psf_df is image_df:
        # fused make_image_and_psf output: both cubes already share the
        # rows — skip the per-pixel join (and the duplicated grid
        # build) entirely, as deconvolve_point_clean does
        both = image_df.select(chan, pol, "l_idx", "m_idx", image, psf)
    else:
        both = image_df.select(chan, pol, "l_idx", "m_idx", image).join(
            psf_df.select(chan, pol, "l_idx", "m_idx", psf),
            on=[chan, pol, "l_idx", "m_idx"], how="inner")

    if out == "components":
        schema = T.StructType([
            T.StructField(chan, T.IntegerType()),
            T.StructField(pol, T.IntegerType()),
            T.StructField("l_idx", T.IntegerType()),
            T.StructField("m_idx", T.IntegerType()),
            T.StructField("width", T.DoubleType()),
            T.StructField("amp", T.DoubleType()),
        ])
    else:
        schema = T.StructType([
            T.StructField(chan, T.IntegerType()),
            T.StructField(pol, T.IntegerType()),
            T.StructField("l_idx", T.IntegerType()),
            T.StructField("m_idx", T.IntegerType()),
            T.StructField("model", T.DoubleType()),
            T.StructField("residual", T.DoubleType()),
        ])

    def plane(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        li, mi, (dirty, psf_a) = plane_arrays(pdf, image, psf)
        model, resid, comps = asp_plane(
            dirty, psf_a, widths=widths, gain=gain,
            threshold=threshold, niter=niter)
        if out == "components":
            return pd.DataFrame({
                chan: np.full(len(comps), key[0], np.int32),
                pol: np.full(len(comps), key[1], np.int32),
                "l_idx": np.array([c[0] for c in comps], np.int32),
                "m_idx": np.array([c[1] for c in comps], np.int32),
                "width": np.array([c[2] for c in comps]),
                "amp": np.array([c[3] for c in comps]),
            })
        return pd.DataFrame({
            chan: np.full(li.size, key[0], np.int32),
            pol: np.full(li.size, key[1], np.int32),
            "l_idx": li.astype(np.int32), "m_idx": mi.astype(np.int32),
            "model": model[li, mi], "residual": resid[li, mi],
        })

    return both.groupBy(chan, pol).applyInPandas(plane, schema)
