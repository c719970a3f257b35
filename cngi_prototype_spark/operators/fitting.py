"""Per-group regression / model-fitting operators (the reference's
"UDAF" tier, SURVEY.md §2.8).

Reference parity:
- ``uv_cont_fit`` — cngi/vis/uv_cont_fit.py:21-100: per-spectrum
  polynomial least-squares along chan (sklearn LinearRegression over
  PolynomialFeatures there; numpy.polynomial here), optional channel
  exclusion (fitspw), NaN handling by median imputation (:71), fit
  metrics (rms/min/max error over included chans, :84-95).
- ``cont_sub``    — cngi/vis/cont_sub.py: uv_cont_fit then subtract the
  evaluated continuum from the data.
- ``spec_fit``    — cngi/image/spec_fit.py:56-74: 1-D gaussian profile
  fit per spectrum (scipy.optimize.curve_fit there; Gauss-Newton in
  numpy here — scipy is not a dependency of this engine).
- ``fit_gaussian`` — cngi/image/fit_gaussian.py:184-234: 2-D elliptical
  gaussian fit per (time, chan, pol) image plane (numba chi^2 minimizer
  there; moment init + Gauss-Newton in numpy here).

Spark-first shape: all are ``applyInPandas`` grouped-map UDFs — the
iteration lives entirely *within* a group (a spectrum or an image
plane), so one shuffle groups the data and every fit runs in parallel
on executors with Arrow-batched transfer. This is the GROUPED_MAP
pattern the reference approximates with xarray.apply_ufunc/map_blocks
(SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from cngi_prototype_spark.schema import DEFAULT_VIS, VisSchema


def uv_cont_fit(
    df: DataFrame,
    vs: VisSchema = DEFAULT_VIS,
    fitorder: int = 1,
    excludechans: list[int] | None = None,
    includechans: list[int] | None = None,
    subtract: bool = False,
    precise: bool = False,
) -> DataFrame:
    """Fit a polynomial along chan per (time, baseline, pol) spectrum.

    Output: input columns plus ``<re>_cont``/``<im>_cont`` (evaluated
    continuum) — or, with ``subtract=True`` (= cont_sub), the data
    columns replaced by data − continuum.

    NaN cells are median-imputed before the fit exactly like
    uv_cont_fit.py:71; excluded channels don't constrain the fit but do
    get a continuum value (evaluation covers all chans).

    Scale design: per-group ``applyInPandas`` pays ~ms of Python overhead
    per group — ruinous for millions of small spectra. Instead this
    repartitions by the group keys, sorts within partitions, and runs ONE
    ``mapInPandas`` kernel per partition that solves the polynomial
    normal equations for ALL groups in the batch simultaneously
    (``np.bincount`` per-group sums + batched ``np.linalg.pinv``) — zero
    per-group Python. x is rescaled to [-1, 1] per group before forming
    the normal equations so conditioning holds for fitorder <= ~6.

    ``precise`` (gate hygiene, ``fitorder == 2`` only): each moment term
    is quantized with ``floor(t·1e9)`` and summed exactly as integers,
    and the system is solved by the explicit adjugate/determinant
    expression — the identical expression tree the DuckDB twin runs, so
    the continuum is bit-equal across engines (same trick as
    imaging/grid.py's quantized gridder sums). Spectra whose moment
    matrix is singular (fewer distinct chans than fitorder+1) come back
    NaN in this mode instead of the pinv least-squares solution.
    """
    if precise and fitorder != 2:
        raise ValueError("precise uv_cont_fit supports fitorder=2 only")
    if excludechans and includechans:
        raise ValueError("specify at most one of excludechans/includechans")
    incl = sorted(includechans) if includechans is not None else None
    excl = sorted(excludechans or [])
    keys = [vs.time, vs.baseline, vs.pol]
    data_cols = list(vs.flat_data_cols())
    chan = vs.chan
    d = fitorder

    out_fields = ", ".join(
        [f"{k} {t}" for k, t in _types_of(df, keys)]
        + [f"{chan} {_type_of(df, chan)}"]
        + [f"{c} double" for c in data_cols]
        + [f"{c}_cont double" for c in data_cols]
    )

    def fit_partition(batches):
        pdfs = list(batches)  # one partition == complete groups (repartitioned)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        g = pdf.groupby(keys, sort=False)
        codes = g.ngroup().to_numpy()
        n_groups = int(codes.max()) + 1 if len(codes) else 0
        x_raw = pdf[chan].to_numpy(dtype=float)
        # per-group rescale of x to [-1, 1] for conditioning
        xmin = g[chan].transform("min").to_numpy(dtype=float)
        xmax = g[chan].transform("max").to_numpy(dtype=float)
        span = np.where(xmax > xmin, xmax - xmin, 1.0)
        x = (2.0 * (x_raw - xmin) / span) - np.where(xmax > xmin, 1.0, 0.0)
        if incl is not None:
            use = np.isin(pdf[chan].to_numpy(), incl)
        elif excl:
            use = ~np.isin(pdf[chan].to_numpy(), excl)
        else:
            use = np.ones(len(x), bool)
        xp = np.stack([x**p for p in range(d + 1)])  # (d+1, n)

        if precise:
            # quantized moments + explicit adjugate solve: the exact
            # expression tree of the SQL twin (see docstring)
            def qsum(t: np.ndarray) -> np.ndarray:
                acc = np.zeros(n_groups, np.int64)
                np.add.at(acc, codes[use],
                          np.floor(t * 1.0e9)[use].astype(np.int64))
                return acc / 1.0e9

            x2, x3, x4 = x * x, x * x * x, x * x * x * x
            m0 = np.bincount(codes[use], minlength=n_groups).astype(np.float64)
            m1, m2, m3, m4 = qsum(x), qsum(x2), qsum(x3), qsum(x4)
            det = (m0 * (m2 * m4 - m3 * m3) - m1 * (m1 * m4 - m2 * m3)
                   + m2 * (m1 * m3 - m2 * m2))
            ok = det != 0
        else:
            # normal-equation matrices for every group at once
            A = np.zeros((n_groups, d + 1, d + 1))
            for p in range(d + 1):
                for q in range(p, d + 1):
                    s = np.bincount(codes[use], weights=(xp[p] * xp[q])[use],
                                    minlength=n_groups)
                    A[:, p, q] = s
                    A[:, q, p] = s
            counts = np.bincount(codes[use], minlength=n_groups)
            solvable = counts > d
            Ainv = np.zeros_like(A)
            if solvable.any():
                Ainv[solvable] = np.linalg.pinv(A[solvable])

        res = pdf[keys + [chan]].copy()
        for c in data_cols:
            y = pdf[c].to_numpy(dtype=float)
            yf = y.copy()
            nan_mask = np.isnan(yf)
            if nan_mask.any():
                med = g[c].transform("median").to_numpy(dtype=float)
                yf[nan_mask] = np.where(np.isnan(med[nan_mask]), 0.0, med[nan_mask])
            if precise:
                b0, b1, b2 = qsum(yf), qsum(x * yf), qsum(x2 * yf)
                a0 = ((m2 * m4 - m3 * m3) * b0 + (m2 * m3 - m1 * m4) * b1
                      + (m1 * m3 - m2 * m2) * b2)
                a1 = ((m3 * m2 - m1 * m4) * b0 + (m0 * m4 - m2 * m2) * b1
                      + (m1 * m2 - m0 * m3) * b2)
                a2 = ((m1 * m3 - m2 * m2) * b0 + (m2 * m1 - m0 * m3) * b1
                      + (m0 * m2 - m1 * m1) * b2)
                with np.errstate(divide="ignore", invalid="ignore"):
                    c0, c1, c2 = a0 / det, a1 / det, a2 / det
                cont = c0[codes] + c1[codes] * x + c2[codes] * x * x
                cont[~ok[codes]] = np.nan
            else:
                b = np.zeros((n_groups, d + 1))
                for p in range(d + 1):
                    b[:, p] = np.bincount(codes[use], weights=(xp[p] * yf)[use],
                                          minlength=n_groups)
                coef = np.einsum("gij,gj->gi", Ainv, b)  # (n_groups, d+1)
                cont = np.einsum("ni,in->n", coef[codes], xp)
                cont[~solvable[codes]] = np.nan
            res[c] = y - cont if subtract else y
            res[f"{c}_cont"] = cont
        yield res

    n_part = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    prepared = df.select(*keys, chan, *data_cols) \
        .repartition(int(n_part), *keys).sortWithinPartitions(*keys, chan)
    return prepared.mapInPandas(fit_partition, schema=out_fields)


def cont_sub(df: DataFrame, vs: VisSchema = DEFAULT_VIS, fitorder: int = 1,
             excludechans: list[int] | None = None) -> DataFrame:
    """uv_cont_fit with subtraction (cngi/vis/cont_sub.py)."""
    return uv_cont_fit(df, vs, fitorder, excludechans, subtract=True)


def _gauss1d(x: np.ndarray, amp: float, mu: float, sigma: float) -> np.ndarray:
    return amp * np.exp(-0.5 * ((x - mu) / sigma) ** 2)


def _fit_gauss1d(x: np.ndarray, y: np.ndarray, iters: int = 50) -> tuple[float, float, float]:
    """Gauss-Newton 1-D gaussian fit with moment initialization."""
    y0 = np.clip(y, 0, None)
    tot = y0.sum()
    if tot <= 0 or len(x) < 4:
        return (np.nan, np.nan, np.nan)
    mu = float((x * y0).sum() / tot)
    var = float((y0 * (x - mu) ** 2).sum() / tot)
    sigma = max(np.sqrt(var), (x[1] - x[0]) / 2 if len(x) > 1 else 1.0)
    amp = float(y.max())
    p = np.array([amp, mu, sigma])
    for _ in range(iters):
        a, m, s = p
        t = (x - m) / s
        e = np.exp(-0.5 * t * t)
        r = y - a * e
        J = np.stack([e, a * e * t / s, a * e * t * t / s], axis=1)
        try:
            dp, *_ = np.linalg.lstsq(J, r, rcond=None)
        except np.linalg.LinAlgError:
            break
        p = p + dp
        p[2] = abs(p[2])
        if np.max(np.abs(dp)) < 1e-12 * max(1.0, np.max(np.abs(p))):
            break
    return (float(p[0]), float(p[1]), float(p[2]))


def spec_fit(
    df: DataFrame,
    group_cols: list[str],
    axis_col: str,
    value_col: str,
) -> DataFrame:
    """1-D gaussian profile fit per spectrum (spec_fit.py:56-74).

    Output: one row per group with (amp, center, sigma, rms_err).
    """
    schema = ", ".join(
        [f"{k} {t}" for k, t in _types_of(df, group_cols)]
        + ["amp double", "center double", "sigma double", "rms_err double"]
    )

    def fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(axis_col)
        x = pdf[axis_col].to_numpy(dtype=float)
        y = pdf[value_col].to_numpy(dtype=float)
        ok = ~np.isnan(y)
        amp, mu, sig = _fit_gauss1d(x[ok], y[ok])
        rms = (
            float(np.sqrt(np.mean((y[ok] - _gauss1d(x[ok], amp, mu, sig)) ** 2)))
            if not np.isnan(amp)
            else np.nan
        )
        row = {k: [pdf[k].iloc[0]] for k in group_cols}
        row.update({"amp": [amp], "center": [mu], "sigma": [sig], "rms_err": [rms]})
        return pd.DataFrame(row)

    return df.select(*group_cols, axis_col, value_col).groupBy(*group_cols).applyInPandas(
        fit_group, schema=schema
    )


def fit_gaussian(
    df: DataFrame,
    plane_cols: list[str],
    x_col: str = "l",
    y_col: str = "m",
    value_col: str = "psf",
) -> DataFrame:
    """2-D elliptical gaussian fit per image plane
    (fit_gaussian.py:184-234: CASA-style beam fit of the PSF center).

    Output per plane: amp, x0, y0, major, minor (gaussian sigmas along
    principal axes) and position angle theta (radians, CCW from +x).
    Whole (l, m) planes group to one task — the same plane-locality
    assumption the reference makes by never chunking l, m.
    """
    schema = ", ".join(
        [f"{k} {t}" for k, t in _types_of(df, plane_cols)]
        + ["amp double", "x0 double", "y0 double",
           "major double", "minor double", "theta double"]
    )

    def fit_plane(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        v = pdf[value_col].to_numpy(dtype=float)
        ok = ~np.isnan(v)
        x, y, v = x[ok], y[ok], v[ok]
        w = np.clip(v, 0, None)
        tot = w.sum()
        if tot <= 0:
            params = [np.nan] * 6
        else:
            x0 = (x * w).sum() / tot
            y0 = (y * w).sum() / tot
            cxx = (w * (x - x0) ** 2).sum() / tot
            cyy = (w * (y - y0) ** 2).sum() / tot
            cxy = (w * (x - x0) * (y - y0)).sum() / tot
            cov = np.array([[cxx, cxy], [cxy, cyy]])
            evals, evecs = np.linalg.eigh(cov)
            minor, major = np.sqrt(np.clip(evals, 0, None))
            vmaj = evecs[:, 1]
            theta = float(np.arctan2(vmaj[1], vmaj[0])) % np.pi
            params = [float(v.max()), float(x0), float(y0),
                      float(major), float(minor), theta]
        row = {k: [pdf[k].iloc[0]] for k in plane_cols}
        for name, val in zip(["amp", "x0", "y0", "major", "minor", "theta"], params):
            row[name] = [val]
        return pd.DataFrame(row)

    return df.select(*plane_cols, x_col, y_col, value_col).groupBy(*plane_cols) \
        .applyInPandas(fit_plane, schema=schema)


def fit_gaussian_rl(
    df: DataFrame,
    plane_cols: list[str],
    *,
    l_col: str = "l_idx",
    m_col: str = "m_idx",
    value_col: str = "psf",
    cell_arcsec: tuple[float, float] = (1.0, 1.0),
    npix_window: tuple[int, int] = (21, 21),
    sampling: tuple[int, int] = (401, 401),
    cutoff: float = 0.5,
    cutoff_sensitivity: float = 0.003,
) -> DataFrame:
    """Beam fit via the half-power-contour ellipse algebra
    (cngi/image/fit_gaussian_rl.py:23-163 'rm_fit'): window the plane
    center, upsample, collect the ``|v − cutoff| < sensitivity`` contour
    points, fit a conic by the direct least-squares ellipse method
    (Fitzgibbon-style generalized eigenproblem), and convert the
    ellipse axes/rotation to beam FWHMs (arcsec) + position angle
    (degrees east of north).

    Divergence: the reference upsamples with scipy ``splinef2d``; scipy
    is not a dependency here, so the upsampling is bilinear — at 401²
    sampling over a 21² window the contour localization difference is
    far below the contour-band width set by ``cutoff_sensitivity``.

    Output per plane: (plane_cols..., major, minor, pa) — NaN when the
    contour has too few points to constrain a conic.
    """
    schema = ", ".join(
        [f"{k} {t}" for k, t in _types_of(df, plane_cols)]
        + ["major double", "minor double", "pa double"]
    )
    nw0, nw1 = int(npix_window[0]), int(npix_window[1])
    sa0, sa1 = int(sampling[0]), int(sampling[1])
    d0, d1 = abs(float(cell_arcsec[0])), abs(float(cell_arcsec[1]))

    def fit_plane(pdf: pd.DataFrame) -> pd.DataFrame:
        li = pdf[l_col].to_numpy(int)
        mi = pdf[m_col].to_numpy(int)
        n_l, n_m = li.max() + 1, mi.max() + 1
        img = np.full((n_l, n_m), np.nan)
        img[li, mi] = pdf[value_col].to_numpy(float)
        c0, c1 = n_l // 2, n_m // 2
        win = img[c0 - nw0 // 2: c0 + nw0 // 2 + 1,
                  c1 - nw1 // 2: c1 + nw1 // 2 + 1]
        params = _rm_fit_window(win, (nw0, nw1), (sa0, sa1), (d0, d1),
                                cutoff, cutoff_sensitivity)
        row = {k: [pdf[k].iloc[0]] for k in plane_cols}
        for name, val in zip(["major", "minor", "pa"], params):
            row[name] = [val]
        return pd.DataFrame(row)

    return df.select(*plane_cols, l_col, m_col, value_col) \
        .groupBy(*plane_cols).applyInPandas(fit_plane, schema=schema)


def _rm_fit_window(win, npix_window, sampling, delta, cutoff, sens):
    """Contour-ellipse beam fit of one centered window (numpy only)."""
    nw0, nw1 = npix_window
    sa0, sa1 = sampling
    d0, d1 = delta
    if win.shape != (nw0, nw1) or np.isnan(win).any():
        return (np.nan, np.nan, np.nan)
    # bilinear upsample onto the fine grid
    fi = np.linspace(0.0, nw0 - 1.0, sa0)
    fj = np.linspace(0.0, nw1 - 1.0, sa1)
    i0 = np.clip(np.floor(fi).astype(int), 0, nw0 - 2)
    j0 = np.clip(np.floor(fj).astype(int), 0, nw1 - 2)
    ti = (fi - i0)[:, None]
    tj = (fj - j0)[None, :]
    up = (win[np.ix_(i0, j0)] * (1 - ti) * (1 - tj)
          + win[np.ix_(i0 + 1, j0)] * ti * (1 - tj)
          + win[np.ix_(i0, j0 + 1)] * (1 - ti) * tj
          + win[np.ix_(i0 + 1, j0 + 1)] * ti * tj)
    pts = np.argwhere(np.abs(up - cutoff) < sens).astype(float)
    if len(pts) < 6:
        return (np.nan, np.nan, np.nan)
    mean = pts.mean(axis=0)
    x, y = pts[:, 0] - mean[0], pts[:, 1] - mean[1]
    # direct least-squares conic fit (generalized eigenproblem with the
    # ellipse constraint 4AC - B^2 = 1; fit_gaussian_rl.py:57-70)
    D = np.stack([x * x, x * y, y * y, x, y, np.ones_like(x)], axis=1)
    S = D.T @ D
    C = np.zeros((6, 6))
    C[0, 2] = C[2, 0] = 2.0
    C[1, 1] = -1.0
    try:
        evals, evecs = np.linalg.eig(np.linalg.inv(S) @ C)
    except np.linalg.LinAlgError:
        return (np.nan, np.nan, np.nan)
    a = np.real(evecs[:, np.argmax(np.real(evals))])
    if a[0] < 0:
        a = -a
    A, B, Cc, Dd, E, Fc = a
    b, c, d, f, g, a0 = B / 2, Cc, Dd / 2, E / 2, Fc, A
    num = b * b - a0 * c
    if num == 0:
        return (np.nan, np.nan, np.nan)
    # semi-axes (standard conic algebra; fit_gaussian_rl.py:93-101)
    up_t = 2 * (a0 * f * f + c * d * d + g * b * b - 2 * b * d * f - a0 * c * g)
    den1 = num * (np.sqrt((a0 - c) ** 2 + 4 * b * b) - (a0 + c))
    den2 = num * (-np.sqrt((a0 - c) ** 2 + 4 * b * b) - (a0 + c))
    with np.errstate(invalid="ignore", divide="ignore"):
        ax1 = np.sqrt(up_t / den1)
        ax2 = np.sqrt(up_t / den2)
    if not (np.isfinite(ax1) and np.isfinite(ax2)):
        return (np.nan, np.nan, np.nan)
    if b == 0:
        phi = 0.0 if a0 > c else np.pi / 2
    elif a0 < c:
        phi = np.arctan(2 * b / (a0 - c)) / 2
    else:
        phi = np.pi / 2 + np.arctan(2 * b / (a0 - c)) / 2
    pa = np.degrees(phi) - 90.0
    if pa < -90.0:
        pa += 180.0
    fwhm1 = ax1 / (sa0 - 1) * (nw0 - 1) * d0 * 2
    fwhm2 = ax2 / (sa1 - 1) * (nw1 - 1) * d1 * 2
    major, minor = max(fwhm1, fwhm2), min(fwhm1, fwhm2)
    if fwhm2 > fwhm1:
        # phi measures the first conic axis; when the second is the
        # major one the position angle is perpendicular
        pa += 90.0
        if pa >= 90.0:
            pa -= 180.0
    return (float(major), float(minor), float(pa))


def _type_of(df: DataFrame, col: str) -> str:
    return dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col]


def _types_of(df: DataFrame, cols: list[str]) -> list[tuple[str, str]]:
    m = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return [(c, m[c]) for c in cols]


def cont_sub_linear(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    value_cols: list[str],
    precise: bool = False,
    keep_fit: bool = True,
):
    """Catalyst-native closed-form linear continuum fit+subtract.

    The fitorder=1 fast path of :func:`uv_cont_fit`: slope/intercept from
    the normal equations
        b = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2),  a = (Sy - b*Sx) / n
    computed as ONE hash aggregation per group plus a broadcast join back
    — no Python boundary, no per-group task. At 100 TB this beats the
    grouped-map UDF by an order of magnitude; use uv_cont_fit only for
    fitorder >= 2. Groups with n <= 1 or zero variance yield NULL.
    """
    from pyspark.sql import functions as F  # local to keep module header light

    from cngi_prototype_spark.functions import exact

    x = F.col(x_col).cast("double")
    s = (lambda c: exact.dsum(c)) if precise else (lambda c: F.sum(c))
    aggs = [s(x).alias("__sx"), s(x * x).alias("__sxx"),
            F.count(F.lit(1)).cast("double").alias("__n")]
    for vcol in value_cols:
        y = F.col(vcol)
        aggs.append(s(y).alias(f"__sy_{vcol}"))
        aggs.append(s(x * y).alias(f"__sxy_{vcol}"))
    sums = df.groupBy(*group_cols).agg(*aggs)

    out = df.join(F.broadcast(sums), group_cols)
    for vcol in value_cols:
        n, sx, sxx = F.col("__n"), F.col("__sx"), F.col("__sxx")
        sy, sxy = F.col(f"__sy_{vcol}"), F.col(f"__sxy_{vcol}")
        den = n * sxx - sx * sx
        slope = F.when(den != 0, (n * sxy - sx * sy) / den)
        intercept = (sy - slope * sx) / n
        cont = intercept + slope * x
        out = out.withColumn(f"{vcol}_cont", cont) \
                 .withColumn(vcol, F.col(vcol) - cont)
        if not keep_fit:
            out = out.drop(f"{vcol}_cont")
    return out.drop("__n", "__sx", "__sxx",
                    *[f"__sy_{v}" for v in value_cols],
                    *[f"__sxy_{v}" for v in value_cols])
