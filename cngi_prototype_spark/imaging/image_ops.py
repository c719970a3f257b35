"""cngi/image operator parity over the long-form image DataFrame.

One row per (l_idx, m_idx[, chan, pol]) with value columns; world
coordinates ``right_ascension``/``declination`` as ordinary columns
(from :func:`cngi_prototype_spark.imaging.image.make_empty_sky_image`).

Operators and their references (all ``/root/reference/cngi/image/``):

- :func:`mask` / :func:`region` — ``mask.py:20-85``, ``region.py:20-95``.
  Boolean column expressions; note the reference's semantics are kept
  verbatim: *mask* is True OUTSIDE the selection (it marks pixels to
  keep visible to later ``where``-style ops), *region* is True INSIDE.
- :func:`gaussian_beam` — ``gaussian_beam.py:18-80`` +
  ``_utils/_beams.py:28-50``: ``exp(-(αx² + βxy + γy²))`` as pure exprs.
- :func:`smooth` — ``smooth.py:22-113``: per-plane FFT convolution with
  a gaussian/boxcar kernel, including the analytic "correcting beam"
  (CASA memo 10 eqs 12-26) when deconvolving a current beam.
- :func:`stokes_to_corr` / :func:`corr_to_stokes` —
  ``stokes_to_corr.py:110-160``: pol-basis change as a conditional
  pivot; real-image semantics (the reference's ``.imag`` of real data
  is 0, so XY=YX=U and RL=LR=Q).
- :func:`cont_sub` — ``cont_sub.py:20-100``: polynomial continuum fit
  along chan per pixel; delegates to the generic closed-form linear
  fitter / batched normal-equation kernels in ``operators.fitting``.
- :func:`thin` — ``implot.py``/``visplot.py:56-58`` stride decimation.
- :func:`reframe` — ``reframe.py``: spectral reframing; implemented as
  the radio-convention Doppler relabel of the freq coordinate (astropy
  frame machinery is out of scope here and stubbed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cngi_prototype_spark.operators.fitting import uv_cont_fit

C_M_S = 299792458.0


# ---------------------------------------------------------------------------
# mask / region
# ---------------------------------------------------------------------------

def _box_conds(df: DataFrame, ra, dec, pixels) -> tuple[Column, Column]:
    radec = F.lit(False)
    if ra is not None and dec is not None:
        radec = ((F.col("right_ascension") > float(min(ra)))
                 & (F.col("right_ascension") < float(max(ra)))
                 & (F.col("declination") > float(min(dec)))
                 & (F.col("declination") < float(max(dec))))
    pix = F.lit(False)
    if pixels is not None:
        p = np.asarray(pixels, dtype=int)
        # reference takes strict bounds on the l/m VALUES spanned by the
        # pixel range (mask.py:72-76) — equivalent to strict index bounds
        # on an ascending uniform axis
        pix = ((F.col("l_idx") > int(p[:, 0].min())) & (F.col("l_idx") < int(p[:, 0].max()))
               & (F.col("m_idx") > int(p[:, 1].min())) & (F.col("m_idx") < int(p[:, 1].max())))
    return radec, pix


def _polchan(df: DataFrame, cond: Column, pol, channels, inside: bool) -> Column:
    for colname, sel in (("pol", pol), ("chan", channels)):
        if sel is not None and colname in df.columns:
            sel_list = [int(s) for s in np.atleast_1d(sel)]
            hit = F.col(colname).isin(sel_list)
            cond = (cond & ~hit) if not inside else (cond & hit)
    return cond


def mask(df: DataFrame, name: str = "mask1", *, ra=None, dec=None,
         pixels=None, pol=None, channels=None) -> DataFrame:
    """True OUTSIDE the AND of the selections (mask.py:66-82)."""
    radec, pix = _box_conds(df, ra, dec, pixels)
    cond = ~radec & ~pix
    cond = _polchan(df, cond, pol, channels, inside=False)
    return df.withColumn(name, cond)


def region(df: DataFrame, name: str = "region1", *, ra=None, dec=None,
           pixels=None, pol=None, channels=None) -> DataFrame:
    """True INSIDE (ra/dec OR pixel box), restricted to pol/chan lists
    (region.py:76-92)."""
    radec, pix = _box_conds(df, ra, dec, pixels)
    cond = radec | pix
    cond = _polchan(df, cond, pol, channels, inside=True)
    return df.withColumn(name, cond)


# ---------------------------------------------------------------------------
# gaussian beam
# ---------------------------------------------------------------------------

def beam_abc(d1_arcsec: float, d2_arcsec: float, theta_deg: float,
             incr_rad: tuple[float, float]) -> tuple[float, float, float]:
    """(α, β, γ) of ``exp(-(αx²+βxy+γy²))`` with axes in cells
    (_beams.py:28-50)."""
    incr = np.abs(np.asarray(incr_rad)) * 180 / np.pi * 3600
    d1 = d1_arcsec / incr[0]
    d2 = d2_arcsec / incr[1]
    th = np.deg2rad(theta_deg)
    log2x4 = 4 * np.log(2)
    alpha = log2x4 * (np.cos(th) ** 2 / d1 ** 2 + np.sin(th) ** 2 / d2 ** 2)
    beta = 2 * log2x4 * (1 / d1 ** 2 - 1 / d2 ** 2) * np.sin(th) * np.cos(th)
    gamma = log2x4 * (np.sin(th) ** 2 / d1 ** 2 + np.cos(th) ** 2 / d2 ** 2)
    return float(alpha), float(beta), float(gamma)


def gaussian_beam(sky_df: DataFrame, size: tuple[float, float, float],
                  incr_rad: tuple[float, float], *, scale: float = 1.0,
                  name: str = "beam") -> DataFrame:
    """Beam image as a column over the sky lattice (gaussian_beam.py:53-57)."""
    a, b, g = beam_abc(size[0], size[1], size[2], incr_rad)
    x = F.col("l_idx") - F.lit(int(_axis_half(sky_df, "l_idx")))
    y = F.col("m_idx") - F.lit(int(_axis_half(sky_df, "m_idx")))
    beam = F.exp(-(F.lit(a) * x * x + F.lit(b) * x * y + F.lit(g) * y * y))
    return sky_df.withColumn(name, F.lit(float(scale)) * beam)


def _axis_half(df: DataFrame, col: str) -> int:
    # driver-side max+1//2 — axis extents are tiny metadata, cached per plan
    n = df.agg(F.max(col)).collect()[0][0] + 1
    return n // 2


def sql_gaussian_beam(size: tuple[float, float, float],
                      incr_rad: tuple[float, float], n_l: int, n_m: int,
                      scale: float = 1.0) -> str:
    a, b, g = beam_abc(size[0], size[1], size[2], incr_rad)
    return f"""
    SELECT CAST(range // {n_m} AS INT) AS l_idx,
           CAST(range % {n_m} AS INT) AS m_idx,
           CAST({float(scale)!r} AS DOUBLE) * exp(-(CAST({a!r} AS DOUBLE) * (CAST(range // {n_m} AS INT) - {n_l // 2}) * (CAST(range // {n_m} AS INT) - {n_l // 2})
                 + CAST({b!r} AS DOUBLE) * (CAST(range // {n_m} AS INT) - {n_l // 2}) * (CAST(range % {n_m} AS INT) - {n_m // 2})
                 + CAST({g!r} AS DOUBLE) * (CAST(range % {n_m} AS INT) - {n_m // 2}) * (CAST(range % {n_m} AS INT) - {n_m // 2}))) AS beam
    FROM range({n_l * n_m})
    """


# ---------------------------------------------------------------------------
# smooth (per-plane FFT convolution)
# ---------------------------------------------------------------------------

def correcting_beam(size: tuple[float, float, float],
                    current: tuple[float, float, float],
                    incr_rad: tuple[float, float]) -> tuple[tuple[float, float, float], float]:
    """Analytic beam that convolves ``current`` into ``size`` (CASA memo
    10 eqs 12-26; smooth.py:79-94). Returns ((d1, d2, theta_deg), scale)."""
    def cf(parms):
        a, b, g = parms
        return (4 * np.pi ** 2 / (4 * a * g - b * b)) * np.asarray(parms)

    cf_tar = cf(beam_abc(*size, incr_rad))
    cf_curr = cf(beam_abc(*current, incr_rad))
    cf_corr = cf_tar - cf_curr
    c_corr = (4 * np.pi ** 2 / (4 * cf_corr[0] * cf_corr[2] - cf_corr[1] ** 2)) * cf_corr
    root = np.sqrt(c_corr[0] ** 2 - 2 * c_corr[0] * c_corr[2]
                   + c_corr[2] ** 2 + c_corr[1] ** 2)
    d1 = np.sqrt(8 * np.log(2) / ((c_corr[0] + c_corr[2]) - root))
    d2 = np.sqrt(8 * np.log(2) / ((c_corr[0] + c_corr[2]) + root))
    theta = 0.5 * np.arctan2(-c_corr[1], c_corr[2] - c_corr[0])
    incr = np.abs(np.asarray(incr_rad)) * 180 / np.pi * 3600
    size_corr = (float(d1 * incr[0]), float(d2 * incr[1]), float(np.rad2deg(theta)))
    scale_corr = float((4 * np.log(2) / (np.pi * d1 * d2))
                       * (size[0] * size[1] / (current[0] * current[1])))
    return size_corr, scale_corr


def smooth(
    df: DataFrame,
    incr_rad: tuple[float, float],
    *,
    image_size: tuple[int, int],
    dv: str = "image",
    kernel: str = "gaussian",
    size: tuple[float, float, float] = (1.0, 1.0, 30.0),
    current: tuple[float, float, float] | None = None,
    scale: float = 1.0,
    chan: str = "chan",
    pol: str = "pol",
) -> DataFrame:
    """FFT-convolve each (chan, pol) plane with the kernel beam
    (smooth.py:97-108): ``|fftshift(ifft2(fft2(img)·fft2(beam·scale)))|``.

    gaussian+current → the correcting beam replaces the kernel and its
    scale (smooth.py:79-94); boxcar → normalized box of
    ``size[:2]`` arcsec. One plane per task — same locality rule as the
    imaging FFTs.
    """
    n_l, n_m = image_size
    if kernel == "gaussian":
        use_size, use_scale = size, 1.0
        if current is not None:
            use_size, use_scale = correcting_beam(size, current, incr_rad)
        a, b, g = beam_abc(*use_size, incr_rad)

        def make_beam() -> np.ndarray:
            x = (np.arange(n_l) - n_l // 2)[:, None]
            y = (np.arange(n_m) - n_m // 2)[None, :]
            beam = np.exp(-(a * x * x + b * x * y + g * y * y))
            if current is None:
                beam = beam / beam.sum()  # unity-normalized (smooth.py:64)
            else:
                beam = use_scale * beam  # flux-scaled correcting beam (:94)
            return beam
    elif kernel == "boxcar":
        incr = np.abs(np.asarray(incr_rad)) * 180 / np.pi * 3600

        def make_beam() -> np.ndarray:
            bx = max(int(np.round(size[0] / incr[0])), 1)
            by = max(int(np.round(size[1] / incr[1])), 1)
            beam = np.zeros((n_l, n_m))
            x0, y0 = n_l // 2 - bx // 2, n_m // 2 - by // 2
            beam[x0:x0 + bx, y0:y0 + by] = 1.0
            return beam / beam.sum()
    else:
        raise ValueError(f"unknown kernel: {kernel}")

    schema = T.StructType([
        T.StructField(chan, T.IntegerType()),
        T.StructField(pol, T.IntegerType()),
        T.StructField("l_idx", T.IntegerType()),
        T.StructField("m_idx", T.IntegerType()),
        T.StructField(dv, T.DoubleType()),
    ])

    def plane(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((n_l, n_m))
        li = pdf["l_idx"].to_numpy(int)
        mi = pdf["m_idx"].to_numpy(int)
        img[li, mi] = pdf[dv].to_numpy(float)
        beam = make_beam()
        out = np.fft.fftshift(np.fft.ifft2(np.fft.fft2(img) * np.fft.fft2(beam * scale)))
        out = np.abs(out)
        return pd.DataFrame({
            chan: np.full(li.size, key[0], np.int32),
            pol: np.full(li.size, key[1], np.int32),
            "l_idx": li.astype(np.int32), "m_idx": mi.astype(np.int32),
            dv: out[li, mi],
        })

    return (df.select(chan, pol, "l_idx", "m_idx", dv)
            .groupBy(chan, pol).applyInPandas(plane, schema))


# ---------------------------------------------------------------------------
# polarization basis change
# ---------------------------------------------------------------------------

_STOKES = {"I": 1, "Q": 2, "U": 3, "V": 4}
_CORR = {"RR": 5, "RL": 6, "LR": 7, "LL": 8, "XX": 9, "XY": 10, "YX": 11, "YY": 12}


def stokes_to_corr(df: DataFrame, *, basis: str = "linear", value: str = "image",
                   pol: str = "pol") -> DataFrame:
    """Stokes (I,Q,U,V codes 1-4) → correlation basis (stokes_to_corr.py:117-124).

    Real-image semantics: XX=I+Q, YY=I-Q, XY=YX=U (linear);
    RR=I+V, LL=I-V, RL=LR=Q (circular)."""
    keys = [c for c in df.columns if c not in (pol, value)]
    p = df.groupBy(*keys).pivot(pol, [1, 2, 3, 4]).agg(F.first(value))
    i, q, u, v = [F.col(str(k)) for k in (1, 2, 3, 4)]
    if basis == "linear":
        outs = [("XX", i + q), ("XY", u), ("YX", u), ("YY", i - q)]
    elif basis == "circular":
        outs = [("RR", i + v), ("RL", q), ("LR", q), ("LL", i - v)]
    else:
        raise ValueError(f"unknown basis: {basis}")
    arms = [p.select(*keys, F.lit(_CORR[name]).alias(pol), expr.alias(value))
            for name, expr in outs]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionAll(a)
    return out


def corr_to_stokes(df: DataFrame, *, basis: str = "linear", value: str = "image",
                   pol: str = "pol") -> DataFrame:
    """Inverse basis change: I=(XX+YY)/2 ... (CASA (XX^YY)/2 convention)."""
    keys = [c for c in df.columns if c not in (pol, value)]
    if basis == "linear":
        codes, i_expr, q_expr, u_expr = ([9, 10, 11, 12],
                                         (F.col("9") + F.col("12")) / 2,
                                         (F.col("9") - F.col("12")) / 2,
                                         (F.col("10") + F.col("11")) / 2)
        outs = [("I", i_expr), ("Q", q_expr), ("U", u_expr), ("V", F.lit(0.0))]
    else:
        codes, i_expr, v_expr, q_expr = ([5, 6, 7, 8],
                                         (F.col("5") + F.col("8")) / 2,
                                         (F.col("5") - F.col("8")) / 2,
                                         (F.col("6") + F.col("7")) / 2)
        outs = [("I", i_expr), ("Q", q_expr), ("U", F.lit(0.0)), ("V", v_expr)]
    p = df.groupBy(*keys).pivot(pol, codes).agg(F.first(value))
    arms = [p.select(*keys, F.lit(_STOKES[name]).alias(pol), expr.alias(value))
            for name, expr in outs]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionAll(a)
    return out


# ---------------------------------------------------------------------------
# cont_sub / reframe / thinning
# ---------------------------------------------------------------------------

def cont_sub(df: DataFrame, *, fitorder: int = 2, chans: list[int] | None = None,
             value: str = "image", chan: str = "chan",
             group_cols: tuple[str, ...] = ("l_idx", "m_idx", "pol")) -> DataFrame:
    """Per-pixel polynomial continuum fit along chan (cont_sub.py:20-100):
    fit on ``chans``, subtract everywhere. fitorder 1 uses the pure-
    Catalyst closed form; higher orders use the batched normal-equation
    mapInPandas kernel from operators.fitting."""
    if fitorder == 1:
        # fit on the chans subset, evaluate + subtract on ALL chans: one
        # hash aggregation for the normal equations, broadcast join back
        fit_src = df if chans is None else df.filter(F.col(chan).isin([int(c) for c in chans]))
        x = F.col(chan).cast("double")
        sums = fit_src.groupBy(*group_cols).agg(
            F.sum(x).alias("__sx"), F.sum(x * x).alias("__sxx"),
            F.sum(value).alias("__sy"), F.sum(x * F.col(value)).alias("__sxy"),
            F.count(F.lit(1)).cast("double").alias("__n"))
        n, sx, sxx = F.col("__n"), F.col("__sx"), F.col("__sxx")
        sy, sxy = F.col("__sy"), F.col("__sxy")
        den = n * sxx - sx * sx
        slope = F.when(den != 0, (n * sxy - sx * sy) / den).otherwise(F.lit(0.0))
        coef = sums.select(*group_cols, slope.alias("__b"),
                           ((sy - slope * sx) / n).alias("__a"))
        out = df.join(F.broadcast(coef), list(group_cols), "left")
        cont = F.col("__a") + F.col("__b") * x
        return (out.withColumn(f"{value}_cont", cont)
                .withColumn(value, F.col(value) - cont)
                .drop("__a", "__b"))
    # general path: batched polynomial kernel over packed spectra
    from cngi_prototype_spark.schema import VisSchema
    vs = VisSchema(time=group_cols[0], baseline=group_cols[1],
                   chan=chan, pol=group_cols[2] if len(group_cols) > 2 else "pol",
                   data_cols=((value,),))  # single real column; the fitter
    # only consumes the flattened list (operators/fitting.py:108)
    # fit-channel selection passes through as includechans — no driver
    # collect of the distinct channel set, no extra job
    fitted = uv_cont_fit(df, vs, fitorder=fitorder,
                         includechans=None if chans is None else [int(c) for c in chans],
                         subtract=True)
    return fitted


def reframe(df: DataFrame, *, velocity: float = 0.0, freq: str = "freq") -> DataFrame:
    """Radio-convention Doppler relabel of the frequency coordinate:
    ``f' = f·(1 − v/c)`` (reframe.py's observer-motion correction; full
    astropy frame conversion is out of scope — documented divergence)."""
    return df.withColumn(freq, F.col(freq) * (F.lit(1.0) - F.lit(float(velocity)) / F.lit(C_M_S)))


def thin(df: DataFrame, axes: dict[str, int]) -> DataFrame:
    """Stride-decimate along index axes (visplot.py:56-58 thinning):
    keep rows where idx % stride == 0 for every (column, stride)."""
    cond = F.lit(True)
    for colname, stride in axes.items():
        cond = cond & (F.col(colname) % int(stride) == 0)
    return df.filter(cond)
