"""Mosaic/GCF imaging: kernel properties, phase-gradient alignment,
heterogeneous-dish kernel selection, mosaic PB."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.grid import C_M_S, GridParms
from cngi_prototype_spark.imaging.image import make_empty_sky_image
from cngi_prototype_spark.imaging.kernels import airy_disk
from cngi_prototype_spark.imaging.mosaic import (
    apply_phase_gradient,
    make_gridding_convolution_function,
    make_image_with_gcf,
    make_mosaic_pb,
)

GP = GridParms(n_u=64, n_v=64, cell_u=1.0e-4, cell_v=1.0e-4, support=7, oversampling=100)
FREQS = [1.0e9, 1.0e9 + 1.0e6, 1.3e9]


def test_gcf_kernel_structure():
    gcf = make_gridding_convolution_function(GP, FREQS, [25.0, 12.0],
                                             oversampling=16, max_support=15)
    # 1e9 and 1e9+1e6 fall in one pb-freq group (tolerance 0.5%), 1.3e9 alone
    assert list(gcf.cf_chan_map) == [0, 0, 1]
    # dish pairs: (12,12), (12,25), (25,25)
    assert len(gcf.cf_baseline_map) == 3
    n_t, n_f, S, _ = gcf.kernels.shape
    assert (n_t, n_f) == (3, 2) and S == 16 * 16
    # kernel peaks at center, normalized, and has limited support
    for t in range(n_t):
        for f in range(n_f):
            k = gcf.kernels[t, f]
            assert k[S // 2, S // 2] == pytest.approx(1.0)
            assert np.abs(k).max() == pytest.approx(1.0)
            assert 3 <= gcf.support[t, f, 0] <= 15


def _point_source_vis(n, field_id, rng, flux=1.0):
    # unit vis of a source AT the given field's center once phase-aligned
    return pd.DataFrame({
        "field_id": np.full(n, field_id, np.int64),
        "baseline": rng.integers(0, 3, n),
        "u": rng.uniform(-25000, 25000, n),
        "v": rng.uniform(-25000, 25000, n),
        "freq": np.full(n, 1.0e9),
        "chan": np.zeros(n, np.int32), "pol": np.zeros(n, np.int32),
        "data_re": np.full(n, float(flux)), "data_im": np.zeros(n),
        "weight": np.ones(n),
    })


def test_mosaic_image_aligns_offset_field(spark):
    """A source at the center of an offset field: without the phase
    gradient its image peaks away from the mosaic center; with it the
    peak lands at the mosaic phase center."""
    rng = np.random.default_rng(7)
    # field 1 offset by 8 cells in l
    l_off = 8 * GP.cell_u
    vis_pdf = _point_source_vis(400, 1, rng)
    # data as observed: source at mosaic center seen from field at offset
    # => vis phase exp(-2pi i u_lambda l_off)
    ul = (vis_pdf.u * vis_pdf.freq / C_M_S).to_numpy()
    ph = np.exp(-2j * np.pi * (ul * l_off))
    vis_pdf["data_re"], vis_pdf["data_im"] = ph.real, ph.imag

    gcf = make_gridding_convolution_function(GP, [1.0e9], [25.0],
                                             oversampling=16, max_support=15)
    df = spark.createDataFrame(vis_pdf)
    img_aligned = make_image_with_gcf(df, gcf, GP,
                                      field_offsets={1: (l_off, 0.0)}).toPandas()
    peak = img_aligned.loc[img_aligned.image.idxmax()]
    assert (peak.l_idx, peak.m_idx) == (32, 32)

    img_raw = make_image_with_gcf(df, gcf, GP).toPandas()
    peak_raw = img_raw.loc[img_raw.image.idxmax()]
    assert (peak_raw.l_idx, peak_raw.m_idx) != (32, 32)


def test_heterogeneous_kernels_selected(spark):
    rng = np.random.default_rng(9)
    vis_pdf = _point_source_vis(300, 0, rng)
    gcf = make_gridding_convolution_function(GP, [1.0e9], [25.0, 12.0],
                                             oversampling=16, max_support=15)
    baseline_dish = {0: (25.0, 25.0), 1: (25.0, 12.0), 2: (12.0, 12.0)}
    img = make_image_with_gcf(spark.createDataFrame(vis_pdf), gcf, GP,
                              baseline_dish=baseline_dish).toPandas()
    peak = img.loc[img.image.idxmax()]
    assert (peak.l_idx, peak.m_idx) == (32, 32)
    assert peak.image == pytest.approx(1.0, rel=0.15)


def test_mosaic_pb(spark):
    sky = make_empty_sky_image(spark, (0.0, 0.0), (32, 32), (1e-4, 1e-4))
    offs = {0: (0.0, 0.0), 1: (8 * 1e-4, 0.0)}
    pb = make_mosaic_pb(sky, offs, 1.0e9, dish_diameter=25.0).toPandas()
    grid = np.zeros((32, 32))
    grid[pb.l_idx, pb.m_idx] = pb.pb_mosaic
    k = 2 * np.pi * 1.0e9 / C_M_S * 12.5
    exp_center = 0.5 * (airy_disk(np.array([0.0]))[0]
                        + airy_disk(np.array([8e-4 * k]))[0])
    assert grid[16, 16] == pytest.approx(exp_center, rel=1e-9)
    # ridge between the two pointings is higher than either flank
    assert grid[20, 16] > grid[8, 16]


def test_make_psf_with_gcf_peak_normalized(spark):
    """PSF mode grids the weights; the output is peak-normalized at the
    image center, and a uniform-weight PSF is symmetric about it."""
    from cngi_prototype_spark.imaging.mosaic import make_psf_with_gcf

    rng = np.random.default_rng(11)
    vis_pdf = _point_source_vis(500, 0, rng)
    # zero out some data (not weights): psf must still grid those rows
    vis_pdf.loc[:49, ["data_re", "data_im"]] = 0.0
    gcf = make_gridding_convolution_function(GP, [1.0e9], [25.0],
                                             oversampling=16, max_support=15)
    psf = make_psf_with_gcf(spark.createDataFrame(vis_pdf), gcf, GP).toPandas()
    grid = np.zeros((64, 64))
    grid[psf.l_idx, psf.m_idx] = psf.psf
    assert grid[32, 32] == pytest.approx(1.0, abs=1e-12)
    assert np.abs(grid).max() == pytest.approx(1.0, abs=1e-12)
