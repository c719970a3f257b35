"""Spectral reference-frame conversion (full reframe).

Reference parity:
- ``cngi/vis/reframe.py:21-95`` — visibility reframe: per-field/time
  observer radial velocity (astropy SpectralCoord with an ALMA
  EarthLocation there) applied to channel frequencies, with
  mode/nchan/start/width/interpolation arguments describing a cvel-style
  re-grid of the spectral axis.
- ``cngi/image/reframe.py:21-255`` — image reframe: per-channel
  SpectralCoord transform of the frequency coordinate toward
  ``outframe`` given observer/target locations and a rest frequency.

Spark-first re-expression:
- the *frame physics* is a per-(field, time) scalar radial velocity.
  astropy is not available in this engine, so velocities come from
  :func:`topo_to_lsrk_velocity` — the textbook circular-orbit +
  standard-solar-apex analytic model (documented divergence: the
  reference uses astropy's full ephemeris; the pipeline shape is
  identical, and callers can supply their own velocities). Velocities
  are computed ON THE DRIVER and enter the plan as literals/broadcast
  LUTs, exactly like direction_rotate's rotation matrices — executors
  never run ephemeris code.
- the *spectral re-grid* is pure Catalyst: spectra are packed to
  chan-ordered arrays (operators/packing.py), each output channel reads
  its two bracketing input channels via ``F.get`` and linearly
  interpolates — no UDF, whole-stage codegen end to end, shuffle
  bounded by one pack groupBy.

Doppler convention: radio, ``f' = f·(1 − v/c)``; v > 0 receding.
Input spectra must be dense on the uniform grid ``f0 + k·df_hz``
(the layout ingest/chan_average produce).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

C_M_S = 299792458.0

# IAU-standard solar motion toward the apex (RA 18h, Dec +30deg, J2000-ish;
# textbook values) and mean Earth orbital speed — public constants.
_V_SUN_LSR = 20000.0          # m/s
_APEX_RA = 4.712388980384690  # 18h in radians
_APEX_DEC = 0.5235987755982988  # +30 deg in radians
_V_EARTH_ORBIT = 29785.9      # m/s
_ECL = 0.40909280422232897    # obliquity 23.439 deg in radians


def topo_to_lsrk_velocity(day_of_year: float, ra: float, dec: float) -> float:
    """Analytic observer radial velocity (m/s, receding positive) toward
    (ra, dec) for TOPO→LSRK: Earth's circular-orbit projection plus the
    standard solar motion. Pure driver-side math — the result enters
    Spark plans and DuckDB twins as the SAME double literal, so the
    engines cannot diverge on libm trig."""
    # source unit vector (equatorial)
    sx = math.cos(dec) * math.cos(ra)
    sy = math.cos(dec) * math.sin(ra)
    sz = math.sin(dec)
    # Earth velocity: circular orbit, ecliptic longitude of Sun ~ day
    lam = 2.0 * math.pi * (day_of_year - 80.0) / 365.25  # ~0 at equinox
    # Earth moves toward lam + 90deg in the ecliptic plane
    vx = -_V_EARTH_ORBIT * math.sin(lam)
    vy = _V_EARTH_ORBIT * math.cos(lam) * math.cos(_ECL)
    vz = _V_EARTH_ORBIT * math.cos(lam) * math.sin(_ECL)
    v_orb = -(vx * sx + vy * sy + vz * sz)  # receding positive
    # solar motion toward the apex: observed source recedes at -V.S
    ax = math.cos(_APEX_DEC) * math.cos(_APEX_RA)
    ay = math.cos(_APEX_DEC) * math.sin(_APEX_RA)
    az = math.sin(_APEX_DEC)
    v_lsr = -_V_SUN_LSR * (ax * sx + ay * sy + az * sz)
    return v_orb + v_lsr


def _lerp(vals: Column, k: Column, frac: Column, n_in: int,
          interpolation: str) -> Column:
    if interpolation == "nearest":
        kn = F.floor(k.cast("double") + frac + F.lit(0.5)).cast("int")
        return F.when((kn >= 0) & (kn <= n_in - 1), F.get(vals, kn))
    if interpolation != "linear":
        raise ValueError(f"unknown interpolation: {interpolation}")
    a = F.get(vals, k)
    b = F.get(vals, k + 1)
    val = a * (F.lit(1.0) - frac) + b * frac
    return F.when((k >= 0) & (k <= n_in - 2), val)


def reframe_spectra(
    df: DataFrame,
    *,
    keys: tuple[str, ...],
    chan: str = "chan",
    values: tuple[str, ...] = ("data_re", "data_im"),
    vel: Column,
    f0: float,
    df_hz: float,
    out_f0: float | None = None,
    out_df: float | None = None,
    out_nchan: int,
    n_in: int,
    interpolation: str = "linear",
    out_freq: str = "freq",
) -> DataFrame:
    """Long → long spectral re-grid under a Doppler shift.

    Each input spectrum (one row per ``chan`` on the uniform grid
    ``f0 + k·df_hz``) is relabeled to ``f·(1 − v/c)`` (``vel`` is an
    expression, constant within a spectrum — typically a field/time LUT
    lookup) and re-interpolated onto the output grid
    ``out_f0 + j·out_df`` (defaults: the input grid). Output channels
    outside the shifted input span are NULL, mirroring cvel edge
    channels."""
    from cngi_prototype_spark.operators.packing import pack_spectra

    out_f0 = f0 if out_f0 is None else out_f0
    out_df = df_hz if out_df is None else out_df

    packed = pack_spectra(df.withColumn("_v", vel),
                          keys=(*keys, "_v"), chan=chan, values=values)
    s = F.lit(1.0) - F.col("_v") / F.lit(C_M_S)
    j = F.explode(F.sequence(F.lit(0), F.lit(int(out_nchan) - 1))).alias("_j")
    out = packed.select(*keys, "_v", *values, j)
    g = F.lit(float(out_f0)) + F.col("_j").cast("double") * F.lit(float(out_df))
    p = (g - F.lit(float(f0)) * s) / (F.lit(float(df_hz)) * s)
    k = F.floor(p).cast("int")
    frac = p - k.cast("double")
    cols = [F.col("_j").alias(chan), g.alias(out_freq)]
    cols += [_lerp(F.col(v), k, frac, int(n_in), interpolation).alias(v)
             for v in values]
    return out.select(*keys, *cols)


def sql_reframe_spectra(
    src_sql: str,
    *,
    keys: str,
    vel_case: str,
    f0: float,
    df_hz: float,
    out_f0: float,
    out_df: float,
    out_nchan: int,
    n_in: int,
    value: str = "data_re",
) -> str:
    """DuckDB twin of :func:`reframe_spectra` (linear, one value col):
    identical expression tree — s, g, p, floor, frac, lerp — over a
    long-format join on the bracketing channels. ``src_sql`` must yield
    ``({keys}, chan, {value})`` dense rows; ``vel_case`` is a SQL
    expression over the key columns producing the SAME velocity literals
    the Spark plan got from the driver."""
    g = f"({out_f0!r} + CAST(j AS DOUBLE) * {out_df!r})"
    s = f"(1.0 - ({vel_case}) / {C_M_S!r})"
    p = f"(({g} - {f0!r} * {s}) / ({df_hz!r} * {s}))"
    key_list = [k.strip() for k in keys.split(",")]
    gkeys = ", ".join(f"grid.{k}" for k in key_list)
    on_a = " AND ".join(f"a.{k} = grid.{k}" for k in key_list)
    on_b = " AND ".join(f"b.{k} = grid.{k}" for k in key_list)
    return f"""
    WITH src AS ({src_sql}),
    spectra AS (SELECT DISTINCT {keys} FROM src),
    grid AS (
      SELECT {keys}, j,
             CAST(floor({p}) AS INT) AS k,
             {p} - CAST(CAST(floor({p}) AS INT) AS DOUBLE) AS frac,
             {g} AS freq
      FROM spectra CROSS JOIN range({out_nchan}) AS r(j)
    )
    SELECT {gkeys}, CAST(grid.j AS INT) AS chan, grid.freq,
           CASE WHEN grid.k >= 0 AND grid.k <= {n_in} - 2
                THEN a.{value} * (1.0 - grid.frac) + b.{value} * grid.frac
           END AS {value}
    FROM grid
    LEFT JOIN src a ON {on_a} AND a.chan = grid.k
    LEFT JOIN src b ON {on_b} AND b.chan = grid.k + 1
    """


def reframe_vis(
    df: DataFrame,
    field_directions: dict[int, tuple[float, float]],
    *,
    day_of_year: float,
    field: str = "field_id",
    keys: tuple[str, ...] = ("time", "baseline", "pol"),
    chan: str = "chan",
    values: tuple[str, ...] = ("data_re", "data_im"),
    f0: float,
    df_hz: float,
    out_f0: float | None = None,
    out_df: float | None = None,
    out_nchan: int,
    n_in: int,
    interpolation: str = "linear",
) -> DataFrame:
    """cngi/vis/reframe.py:21-95 surface: per-field TOPO→LSRK velocity
    (driver-computed LUT) + spectral re-grid. ``field`` must be one of
    ``keys``'s companions in the input (constant per spectrum)."""
    vels = {fid: topo_to_lsrk_velocity(day_of_year, ra, dec)
            for fid, (ra, dec) in field_directions.items()}
    vel = F.lit(0.0)
    for fid, v in vels.items():
        vel = F.when(F.col(field) == fid, F.lit(float(v))).otherwise(vel)
    return reframe_spectra(
        df, keys=(*keys, field), chan=chan, values=values, vel=vel,
        f0=f0, df_hz=df_hz, out_f0=out_f0, out_df=out_df,
        out_nchan=out_nchan, n_in=n_in, interpolation=interpolation)


def reframe_image(
    df: DataFrame,
    *,
    velocity: float,
    keys: tuple[str, ...] = ("l_idx", "m_idx"),
    chan: str = "chan",
    values: tuple[str, ...] = ("image",),
    f0: float,
    df_hz: float,
    n_in: int,
    regrid: bool = True,
    interpolation: str = "linear",
    freq: str = "freq",
) -> DataFrame:
    """cngi/image/reframe.py:21-255 surface: one observer velocity for
    the cube (the reference transforms the frequency coordinate per
    channel). ``regrid=False`` only relabels the frequency coordinate
    (exactly what the reference's SpectralCoord transform does to the
    coordinate); ``regrid=True`` additionally re-interpolates the
    planes back onto the original channel grid so downstream operators
    keep a uniform axis."""
    if not regrid:
        return df.withColumn(
            freq, F.col(freq) * (F.lit(1.0) - F.lit(float(velocity)) / F.lit(C_M_S)))
    return reframe_spectra(
        df, keys=keys, chan=chan, values=values, vel=F.lit(float(velocity)),
        f0=f0, df_hz=df_hz, out_nchan=n_in, n_in=n_in,
        interpolation=interpolation, out_freq=freq)
