"""direction_rotate semantic invariants (reference direction_rotate.py:90-260)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cngi_prototype_spark.imaging.rotate import (
    direction_rotate,
    rotation_parms,
)

FIELDS = {0: (0.5, -0.3), 1: (0.52, -0.28), 2: (0.48, -0.32)}
NEW = (0.51, -0.29)


@pytest.fixture(scope="module")
def vis_pdf():
    rng = np.random.default_rng(3)
    n = 300
    return pd.DataFrame({
        "rid": np.arange(n),
        "field_id": rng.integers(0, 3, n).astype(np.int64),
        "u": rng.uniform(-500, 500, n),
        "v": rng.uniform(-500, 500, n),
        "w": rng.uniform(-50, 50, n),
        "freq": np.full(n, 1.0e9),
        "data_re": rng.normal(size=n),
        "data_im": rng.normal(size=n),
    })


def test_same_center_is_identity(spark, vis_pdf):
    centers = {fid: NEW for fid in FIELDS}
    out = direction_rotate(spark.createDataFrame(vis_pdf), centers, NEW) \
        .toPandas().sort_values("rid")
    for c in ("u", "v", "w", "data_re", "data_im"):
        np.testing.assert_allclose(out[c].to_numpy(), vis_pdf[c].to_numpy(),
                                   rtol=1e-12, atol=1e-12)


def test_uvw_norm_preserved_without_tangent_trim(spark, vis_pdf):
    out = direction_rotate(spark.createDataFrame(vis_pdf), FIELDS, NEW,
                           common_tangent_reprojection=False) \
        .toPandas().sort_values("rid")
    got = np.sqrt(out.u**2 + out.v**2 + out.w**2).to_numpy()
    exp = np.sqrt(vis_pdf.u**2 + vis_pdf.v**2 + vis_pdf.w**2).to_numpy()
    np.testing.assert_allclose(got, exp, rtol=1e-12)
    # amplitude of data is preserved by a pure phase shift
    ga = np.hypot(out.data_re, out.data_im).to_numpy()
    ea = np.hypot(vis_pdf.data_re, vis_pdf.data_im).to_numpy()
    np.testing.assert_allclose(ga, ea, rtol=1e-12)


def test_round_trip_restores_data(spark, vis_pdf):
    # Rotate every field to NEW, then back to a single original field
    # center: fields collapse to NEW so the reverse map has one field.
    fwd = direction_rotate(spark.createDataFrame(vis_pdf), FIELDS, NEW,
                           common_tangent_reprojection=False)
    # after rotation all rows share phase center NEW
    back = direction_rotate(
        fwd, {fid: NEW for fid in FIELDS}, FIELDS[0],
        common_tangent_reprojection=False)
    out = back.toPandas().sort_values("rid")
    sel = vis_pdf[vis_pdf.field_id == 0].sort_values("rid")
    got = out[out.rid.isin(sel.rid)]
    for c in ("data_re", "data_im"):
        np.testing.assert_allclose(got[c].to_numpy(), sel[c].to_numpy(),
                                   rtol=1e-9, atol=1e-9)


def test_rotation_matrix_orthogonality():
    for m, _ in rotation_parms(FIELDS, NEW, common_tangent_reprojection=False).values():
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-14)
