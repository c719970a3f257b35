"""Standard gridder: explode and kernel variants vs a direct numpy spec.

The numpy reference below independently implements the semantics of
``_standard_grid_jit`` (SURVEY.md §2.10; reference SG:242-371): PSWF
taps, int(x+0.5) rounding, center-cell bounds check, zero/NaN skip,
``sum_weight += w·Σconv``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cngi_prototype_spark.imaging.grid import C_M_S, GridParms, grid_visibilities
from cngi_prototype_spark.imaging.kernels import pswf_kernel_1d

GP = GridParms(n_u=48, n_v=40, cell_u=2.0e-5, cell_v=2.0e-5, support=7, oversampling=100)


def numpy_grid(pdf: pd.DataFrame, gp: GridParms):
    cgk = pswf_kernel_1d(gp.oversampling, gp.support)
    grids: dict[tuple[int, int], np.ndarray] = {}
    sumw: dict[tuple[int, int], float] = {}
    half = gp.half
    for row in pdf.itertuples():
        u_pos = row.u * (-(row.freq * gp.cell_u * gp.n_u) / C_M_S) + gp.n_u // 2
        v_pos = row.v * (-(row.freq * gp.cell_v * gp.n_v) / C_M_S) + gp.n_v // 2
        u_c, v_c = int(u_pos + 0.5), int(v_pos + 0.5)
        if not (u_c + half < gp.n_u and u_c - half >= 0
                and v_c + half < gp.n_v and v_c - half >= 0):
            continue
        wd = complex(row.data_re, row.data_im) * row.weight
        if np.isnan(wd) or wd == 0:
            continue
        du = int(np.floor((u_c - u_pos) * gp.oversampling + 0.5))
        dv = int(np.floor((v_c - v_pos) * gp.oversampling + 0.5))
        key = (row.chan, row.pol)
        g = grids.setdefault(key, np.zeros((gp.n_u, gp.n_v), np.complex128))
        norm = 0.0
        for iu in range(-half, gp.support - half):
            cu = cgk[abs(gp.oversampling * iu + du)]
            for iv in range(-half, gp.support - half):
                cv = cgk[abs(gp.oversampling * iv + dv)]
                g[u_c + iu, v_c + iv] += cu * cv * wd
                norm += cu * cv
        sumw[key] = sumw.get(key, 0.0) + row.weight * norm
    return grids, sumw


@pytest.fixture(scope="module")
def vis_pdf():
    rng = np.random.default_rng(7)
    n = 600
    pdf = pd.DataFrame({
        "u": rng.uniform(-60, 60, n),          # meters; some out of bounds
        "v": rng.uniform(-55, 55, n),
        "freq": 1.0e9 + rng.integers(0, 3, n) * 1.0e6,
        "chan": rng.integers(0, 3, n).astype(np.int32),
        "pol": rng.integers(0, 2, n).astype(np.int32),
        "data_re": rng.normal(size=n),
        "data_im": rng.normal(size=n),
        "weight": rng.uniform(0.5, 2.0, n),
    })
    pdf.loc[5, "weight"] = 0.0          # zero-weight skip
    pdf.loc[6, "data_re"] = np.nan      # NaN skip
    return pdf


def _collect_grid(grid_df, sumw_df):
    gpdf = grid_df.toPandas()
    spdf = sumw_df.toPandas()
    grids: dict[tuple[int, int], np.ndarray] = {}
    for row in gpdf.itertuples():
        g = grids.setdefault((row.chan, row.pol), np.zeros((GP.n_u, GP.n_v), np.complex128))
        g[row.u_idx, row.v_idx] = complex(row.grid_re, row.grid_im)
    sumw = {(r.chan, r.pol): r.sum_weight for r in spdf.itertuples()}
    return grids, sumw


@pytest.mark.parametrize("variant", ["explode", "kernel"])
def test_gridder_matches_numpy_spec(spark, vis_pdf, variant):
    df = spark.createDataFrame(vis_pdf).repartition(5)
    grid_df, sumw_df = grid_visibilities(df, GP, variant=variant)
    got_grids, got_sumw = _collect_grid(grid_df, sumw_df)
    exp_grids, exp_sumw = numpy_grid(vis_pdf, GP)

    assert set(got_grids) == set(exp_grids)
    for key in exp_grids:
        np.testing.assert_allclose(got_grids[key], exp_grids[key], atol=1e-9)
    assert set(got_sumw) == set(exp_sumw)
    for key in exp_sumw:
        assert got_sumw[key] == pytest.approx(exp_sumw[key], abs=1e-9)


def test_psf_mode_grids_weights(spark, vis_pdf):
    df = spark.createDataFrame(vis_pdf)
    grid_df, _ = grid_visibilities(df, GP, re=None, im=None)
    got = grid_df.toPandas()
    # psf grid is real-valued: imaginary part identically zero
    assert (got["grid_im"] == 0).all()
    # and equals gridding (weight + 0j) as data with weight 1
    wpdf = vis_pdf.assign(data_re=vis_pdf["weight"], data_im=0.0, weight=1.0)
    exp_grids, _ = numpy_grid(wpdf, GP)
    got_grids, _ = _collect_grid(grid_df, grid_df.groupBy("chan", "pol").count()
                                 .withColumnRenamed("count", "sum_weight"))
    for key in exp_grids:
        np.testing.assert_allclose(got_grids[key].real, exp_grids[key].real, atol=1e-9)


@pytest.mark.parametrize("variant", ["explode", "kernel"])
def test_cancelling_taps_still_emit_touched_cells(spark, variant):
    # two identical uv samples with exactly opposite weighted data: every
    # touched cell sums to exactly 0.0. Both variants must still emit the
    # touched cells (as 0.0 rows) — the kernel variant used to drop them,
    # diverging from the explode variant's row set.
    pdf = pd.DataFrame({
        "u": [10.0, 10.0],
        "v": [5.0, 5.0],
        "freq": [1.0e9, 1.0e9],
        "chan": np.array([0, 0], np.int32),
        "pol": np.array([0, 0], np.int32),
        "data_re": [1.0, -1.0],
        "data_im": [0.5, -0.5],
        "weight": [1.0, 1.0],
    })
    df = spark.createDataFrame(pdf).coalesce(1)
    grid_df, _ = grid_visibilities(df, GP, variant=variant)
    got = grid_df.toPandas()
    assert len(got) == GP.support * GP.support
    assert (got["grid_re"] == 0.0).all() and (got["grid_im"] == 0.0).all()


def test_dense_planes_subsalt_parity(spark):
    """Few planes + many input partitions trigger the fat-row sub-salt
    (multiple collect_list partials per slab); the consumer's slab sum
    must make the result identical to the explode variant."""
    import numpy as np
    import pandas as pd

    from cngi_prototype_spark.imaging.grid import GridParms, grid_visibilities

    rng = np.random.default_rng(4)
    n = 4000
    pdf = pd.DataFrame({
        "u": rng.uniform(-9000, 9000, n), "v": rng.uniform(-9000, 9000, n),
        "freq": np.full(n, 1.0e9),
        "chan": np.zeros(n, np.int32), "pol": np.zeros(n, np.int32),
        "data_re": rng.normal(size=n), "data_im": rng.normal(size=n),
        "weight": rng.uniform(0.5, 2.0, n),
    })
    gp = GridParms(n_u=64, n_v=64, cell_u=2e-5, cell_v=2e-5,
                   support=7, oversampling=100)
    # 1 plane, 300 input partitions -> nsub > 1 (multiple partials/slab)
    df = spark.createDataFrame(pdf).repartition(300)
    fast, _ = grid_visibilities(df, gp, variant="kernel", n_planes=1,
                                dense_planes=True)
    fp = fast.toPandas()
    assert len(fp) > 64, "sub-salt should emit multiple partials per slab"
    ref, _ = grid_visibilities(spark.createDataFrame(pdf), gp,
                               variant="explode")
    rp = ref.toPandas()
    g = np.zeros((64, 64), complex)
    for r in fp.itertuples():
        arr = (np.asarray(r.grid_re) + 1j * np.asarray(r.grid_im)
               ).reshape(-1, 64)
        u0 = int(r.u0)
        a0, a1 = max(0, -u0), min(len(arr), 64 - u0)
        g[u0 + a0:u0 + a1] += arr[a0:a1]
    gr = np.zeros((64, 64), complex)
    gr[rp.u_idx, rp.v_idx] = rp.grid_re + 1j * rp.grid_im
    assert np.abs(g - gr).max() < 1e-9


def test_fused_sumw_matches_standalone(spark, vis_pdf):
    """r14: ``fuse_sumw=True`` replaces the standalone sum-of-weights
    pass with per-cell center-tap partials EMBEDDED in the grid rows
    (the dense path's sum_w_norm design). Grid cells must be IDENTICAL
    (same aggregation), the partials non-null (int64 across Arrow in
    precise mode), and the rollup sum_weight bit-identical in precise
    mode (same BIGINT quanta, one final divide) / allclose in double
    mode (association moves from the (du, dv) pre-reduce to per-cell
    partials)."""
    df = spark.createDataFrame(vis_pdf).repartition(5)
    for precise in (True, False):
        g0, s0 = grid_visibilities(df, GP, variant="explode",
                                   precise=precise)
        g1, s1 = grid_visibilities(df, GP, variant="explode",
                                   precise=precise, fuse_sumw=True)
        assert g1.columns == g0.columns + ["_swc"]
        a = {(r.chan, r.pol): r.sum_weight for r in s0.toPandas().itertuples()}
        b = {(r.chan, r.pol): r.sum_weight for r in s1.toPandas().itertuples()}
        assert set(a) == set(b)
        for k in a:
            if precise:
                assert a[k] == b[k], "precise sum_weight must be bit-equal"
            else:
                assert a[k] == pytest.approx(b[k], rel=1e-12)
        key = ["chan", "pol", "u_idx", "v_idx"]
        p0 = g0.toPandas().sort_values(key).reset_index(drop=True)
        p1 = g1.toPandas().sort_values(key).reset_index(drop=True)
        assert len(p0) == len(p1)
        assert (p0[key].to_numpy() == p1[key].to_numpy()).all()
        assert (p0.grid_re.to_numpy() == p1.grid_re.to_numpy()).all()
        assert (p0.grid_im.to_numpy() == p1.grid_im.to_numpy()).all()
        # partials: non-null, exact dtype contract, and their plane sum
        # IS the standalone sum_weight
        swc = p1["_swc"]
        assert not swc.isna().any()
        import pandas.api.types as pt
        assert pt.is_integer_dtype(swc.dtype) == precise
        for k in a:
            mask = (p1.chan == k[0]) & (p1.pol == k[1])
            tot = swc[mask].sum()
            tot = float(int(tot)) / 1.0e9 if precise else float(tot)
            if precise:
                assert tot == a[k]
            else:
                assert tot == pytest.approx(a[k], rel=1e-12)


def test_fused_sumw_with_psf_matches_standalone(spark, vis_pdf):
    """r14: the with_psf fused-gridding path under ``fuse_sumw=True``
    keeps sum_weight AND sum_weight_psf (weight-valid row set) right."""
    df = spark.createDataFrame(vis_pdf)
    g0, s0 = grid_visibilities(df, GP, variant="explode", with_psf=True)
    g1, s1 = grid_visibilities(df, GP, variant="explode", with_psf=True,
                               fuse_sumw=True)
    assert g1.columns == g0.columns + ["_swc", "_swpc"]
    a = {(r.chan, r.pol): (r.sum_weight, r.sum_weight_psf)
         for r in s0.toPandas().itertuples()}
    b = {(r.chan, r.pol): (r.sum_weight, r.sum_weight_psf)
         for r in s1.toPandas().itertuples()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], rel=1e-12)
        assert a[k][1] == pytest.approx(b[k][1], rel=1e-12)
