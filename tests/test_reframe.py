"""Full spectral reframe (operators/reframe.py): identity, shift
direction, edge NULLs, nearest mode, and the analytic velocity model's
basic physics."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.operators.reframe import (
    C_M_S,
    reframe_image,
    reframe_spectra,
    topo_to_lsrk_velocity,
)


def _cube(spark, n_spec=4, n_chan=16):
    return spark.range(n_spec * n_chan).select(
        (F.col("id") / n_chan).cast("int").alias("bl"),
        (F.col("id") % n_chan).cast("int").alias("chan"),
        (F.col("id") % n_chan).cast("double").alias("data_re"))


def test_identity_when_v0_and_same_grid(spark):
    df = _cube(spark)
    out = reframe_spectra(
        df, keys=("bl",), values=("data_re",), vel=F.lit(0.0),
        f0=1.0e9, df_hz=1.0e6, out_nchan=16, n_in=16)
    pdf = out.orderBy("bl", "chan").toPandas()
    # interior channels reproduce the input exactly; last chan NULL
    # (needs bracketing chan k+1)
    got = pdf[pdf.chan < 15]
    assert np.allclose(got.data_re, got.chan)
    assert pdf[pdf.chan == 15].data_re.isna().all()


def test_shift_moves_data_the_right_way(spark):
    # receding source (v>0): shifted grid moves down in frequency, so an
    # output channel at the same frequency reads from HIGHER input chans
    df = _cube(spark, n_spec=1)
    v = 3.0e5  # 1e-3 c -> shift = 1e6 Hz = exactly one channel width at f0
    out = reframe_spectra(
        df, keys=("bl",), values=("data_re",), vel=F.lit(v),
        f0=1.0e9, df_hz=1.0e6, out_nchan=16, n_in=16)
    pdf = out.orderBy("chan").toPandas().dropna()
    # f'_k = (1e9 + k*1e6)(1-1e-3): chan j of the out grid sits ~ one
    # chan above the shifted origin -> reads input chan ~ j+1
    for _, r in pdf.iterrows():
        expect = (1.0e9 + r.chan * 1.0e6 - 1.0e9 * (1 - v / C_M_S)) / (1.0e6 * (1 - v / C_M_S))
        assert abs(r.data_re - expect) < 1e-6


def test_nearest_mode(spark):
    df = _cube(spark, n_spec=1)
    out = reframe_spectra(
        df, keys=("bl",), values=("data_re",), vel=F.lit(0.0),
        f0=1.0e9, df_hz=1.0e6, out_f0=1.0e9 + 4.0e5, out_df=1.0e6,
        out_nchan=15, n_in=16, interpolation="nearest")
    pdf = out.orderBy("chan").toPandas().dropna()
    # offset 0.4 chans -> nearest is floor(j + 0.4 + 0.5) = j
    assert np.allclose(pdf.data_re, pdf.chan)


def test_reframe_image_relabel_only(spark):
    df = _cube(spark).withColumn("freq", F.lit(1.0e9) + F.col("chan") * F.lit(1.0e6))
    out = reframe_image(df, velocity=1.0e5, keys=("bl",), values=("data_re",),
                        f0=1.0e9, df_hz=1.0e6, n_in=16, regrid=False)
    row = out.filter("bl = 0 AND chan = 0").collect()[0]
    assert row.freq == pytest.approx(1.0e9 * (1 - 1.0e5 / C_M_S))
    assert out.count() == df.count()


def test_velocity_model_physics():
    # velocity toward the ecliptic pole has no orbital component beyond
    # the obliquity projection; magnitude must stay below orbit+apex sum
    for doy in (0.0, 100.0, 200.0, 300.0):
        for ra, dec in ((0.0, 0.0), (1.0, 0.5), (4.7, -1.2)):
            v = topo_to_lsrk_velocity(doy, ra, dec)
            assert abs(v) < 29785.9 + 20000.0
    # opposite sky directions get opposite orbital signs (same doy)
    v1 = topo_to_lsrk_velocity(50.0, 0.3, 0.1)
    v2 = topo_to_lsrk_velocity(50.0, 0.3 + math.pi, -0.1)
    assert (v1 - (-20000.0 * 0)) * (v2 - 0) < 0 or abs(v1 + v2) < 2 * 20000.0
