"""Property-based invariants (hypothesis), mirroring the reference's
join/immutability test discipline (tests/test_vis_ddijoin.py:7-413):

- join_vis: merging a dataset with itself is the identity; disjoint
  merges preserve both sides; conflicting overlaps raise.
- time_average: weighted means are bounded by min/max of the inputs and
  exactly reproduce a hand-computed single-group case.
- gridder: linearity — grid(a·X + b·Y) == a·grid(X) + b·grid(Y).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cngi_prototype_spark.imaging.grid import GridParms, grid_visibilities
from cngi_prototype_spark.operators.joins import JoinConflictError, join_vis
from cngi_prototype_spark.schema import VisSchema

VS = VisSchema(time="t", baseline="bl", chan="ch", pol="po",
               data_cols=(("re", "im"),), weight="w", flag="fl",
               scan="sc", state="stt", field="fld")

GP = GridParms(n_u=24, n_v=24, cell_u=5e-5, cell_v=5e-5, support=5, oversampling=20)


def _vis_frame(rows):
    return pd.DataFrame(rows, columns=["t", "bl", "ch", "po", "re", "im",
                                       "w", "fl", "sc", "stt", "fld"])


rows_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(0, 2),
              st.integers(0, 1),
              st.floats(-10, 10, allow_nan=False),
              st.floats(-10, 10, allow_nan=False)),
    min_size=1, max_size=12, unique_by=lambda r: r[:4])


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows_strategy)
def test_join_vis_self_merge_is_identity(spark, rows):
    pdf = _vis_frame([(*r[:4], r[4], r[5], 1.0, False, 0, 0, 0) for r in rows])
    df = spark.createDataFrame(pdf)
    out = join_vis(df, df, vs=VS).toPandas().sort_values(["t", "bl", "ch", "po"])
    exp = pdf.sort_values(["t", "bl", "ch", "po"])
    assert len(out) == len(exp)
    np.testing.assert_allclose(out["re"].to_numpy(), exp["re"].to_numpy())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows_strategy)
def test_join_vis_disjoint_union(spark, rows):
    pdf = _vis_frame([(*r[:4], r[4], r[5], 1.0, False, 0, 0, 0) for r in rows])
    shifted = pdf.copy()
    shifted["t"] = shifted["t"] + 100  # disjoint keys
    out = join_vis(spark.createDataFrame(pdf), spark.createDataFrame(shifted),
                   vs=VS).toPandas()
    assert len(out) == 2 * len(pdf)


def test_join_vis_conflict_raises(spark):
    pdf = _vis_frame([(0, 0, 0, 0, 1.0, 0.0, 1.0, False, 0, 0, 0)])
    other = pdf.copy()
    other["re"] = 2.0  # same key, different value -> reference RuntimeError
    with pytest.raises(JoinConflictError):
        join_vis(spark.createDataFrame(pdf), spark.createDataFrame(other),
                 vs=VS, validate=True)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.floats(0.5, 2.0, allow_nan=False),
                          st.floats(-5, 5, allow_nan=False)),
                min_size=2, max_size=10))
def test_weighted_mean_bounded(spark, wx):
    # single group: weighted mean within [min, max] and matches numpy
    from cngi_prototype_spark.operators import averaging as OA

    pdf = pd.DataFrame({
        "time": pd.to_datetime("2024-01-01"),
        "baseline": 0, "chan": 0, "pol": 0,
        "data_re": [x for _, x in wx], "data_im": 0.0,
        "data_weight": [w for w, _ in wx],
        "flag": False, "scan_number": 0, "state_id": 0, "field_id": 0,
    })
    out = OA.time_average(spark.createDataFrame(pdf), width="1 hour").toPandas()
    assert len(out) == 1
    got = out["data_re"].iloc[0]
    exp = np.average([x for _, x in wx], weights=[w for w, _ in wx])
    assert got == pytest.approx(exp, rel=1e-12)
    assert min(x for _, x in wx) - 1e-12 <= got <= max(x for _, x in wx) + 1e-12


def test_gridder_linearity(spark):
    rng = np.random.default_rng(4)
    n = 80
    base = pd.DataFrame({
        "u": rng.uniform(-15, 15, n), "v": rng.uniform(-15, 15, n),
        "freq": np.full(n, 1.0e9),
        "chan": np.zeros(n, np.int32), "pol": np.zeros(n, np.int32),
        "weight": np.ones(n),
    })
    x = rng.normal(size=n)
    y = rng.normal(size=n)
    a, b = 2.5, -1.25

    def grid_of(values):
        pdf = base.assign(data_re=values, data_im=0.0)
        g, _ = grid_visibilities(spark.createDataFrame(pdf), GP)
        out = g.toPandas()
        arr = np.zeros((GP.n_u, GP.n_v))
        arr[out.u_idx, out.v_idx] = out.grid_re
        return arr

    np.testing.assert_allclose(grid_of(a * x + b * y),
                               a * grid_of(x) + b * grid_of(y), atol=1e-9)
