import pyspark.sql.functions as F
import pytest

from cngi_prototype_spark.operators import joins as OJ


def test_join_vis_roundtrip_and_coalesce(spark, vis_df):
    # split the cube by channel parity with an overlap band; rejoin must
    # reproduce every original cell exactly once
    a = vis_df.filter((F.col("chan") % 2 == 0) | (F.col("chan") < 2))
    b = vis_df.filter(F.col("chan") % 2 == 1)
    out = OJ.join_vis(a, b, validate=True)
    assert out.count() == vis_df.count()
    assert set(out.columns) == set(vis_df.columns)
    # values preserved: compare weighted checksum
    s0 = vis_df.agg(F.sum("data_re")).first()[0]
    s1 = out.agg(F.sum("data_re")).first()[0]
    assert abs(s0 - s1) < 1e-6


def test_join_vis_one_sided_columns(spark, vis_df):
    a = vis_df.select("time", "baseline", "chan", "pol", "data_re")
    b = vis_df.select("time", "baseline", "chan", "pol", "data_weight")
    out = OJ.join_vis(a, b)
    assert "data_re" in out.columns and "data_weight" in out.columns
    assert out.count() == vis_df.count()


def test_join_vis_conflict_raises(spark, vis_df):
    a = vis_df.select("time", "baseline", "chan", "pol", "data_re")
    b = a.withColumn("data_re", F.col("data_re") + 1.0)
    with pytest.raises(OJ.JoinConflictError):
        OJ.join_vis(a, b, validate=True)
    # without validate, left wins silently (documented divergence knob)
    out = OJ.join_vis(a, b, validate=False)
    assert out.count() == a.count()


def test_split_dataset_trims_dims(spark, vis_df):
    field_dim = vis_df.select(F.col("field_id").alias("fid")).distinct() \
        .withColumn("name", F.concat(F.lit("FIELD"), F.col("fid")))
    fact = vis_df.filter(F.col("field_id") == 0)
    _, trimmed = OJ.split_dataset(fact, {"field": (field_dim, "fid", "field_id")})
    assert trimmed["field"].count() == 1
    assert trimmed["field"].first()["fid"] == 0


def test_join_dataset_surrogate_keys(spark):
    dim1 = spark.createDataFrame([(0, "ANT0"), (1, "ANT1")], ["ant_id", "name"])
    dim2 = spark.createDataFrame([(0, "ANT1"), (1, "ANT2")], ["ant_id", "name"])
    fact1 = spark.createDataFrame([(0, 10.0), (1, 11.0)], ["ant_id", "v"])
    fact2 = spark.createDataFrame([(0, 20.0), (1, 21.0)], ["ant_id", "v"])
    fact_out, dim_out = OJ.join_dataset(fact1, dim1, fact2, dim2, "ant_id", "ant_id")
    dims = {r["name"]: r["ant_id"] for r in dim_out.collect()}
    # ANT1 matched -> reuses id 1; ANT2 fresh -> id 2 (max(dim1)+1)
    assert dims == {"ANT0": 0, "ANT1": 1, "ANT2": 2}
    facts = sorted((r["ant_id"], r["v"]) for r in fact_out.collect())
    assert facts == [(0, 10.0), (1, 11.0), (1, 20.0), (2, 21.0)]


def test_data_groups_registry(spark):
    """data_groups auto-derivation + group-selected operators
    (convert_ms.py:180-184 / _check_sel_parms parity)."""
    import pytest
    from cngi_prototype_spark.operators.data_groups import (
        data_groups_from_columns, read_data_groups, resolve_data_group,
        write_data_groups)
    cols = ["time", "bl", "chan", "pol", "data_re", "data_im",
            "data_weight", "corrected_data_re", "corrected_data_im",
            "corrected_data_weight", "flag"]
    groups = data_groups_from_columns(cols)
    assert groups["0"]["data"] == "data"
    assert groups["1"]["data"] == "corrected_data"
    assert groups["1"]["weight"] == "corrected_data_weight"

    df = spark.createDataFrame(
        [(0.0, 0, 0, 0, 1.0, 2.0, 1.0, 3.0, 4.0, 2.0, False)],
        ", ".join(f"{c} double" if "re" in c or "im" in c
                  or "weight" in c or c == "time" else f"{c} int"
                  if c != "flag" else "flag boolean" for c in cols))
    vs = resolve_data_group(df, "1")
    assert vs.data_cols == (("corrected_data_re", "corrected_data_im"),)
    assert vs.weight == "corrected_data_weight"
    with pytest.raises(KeyError, match="does not exist"):
        resolve_data_group(df, "7")
    with pytest.raises(ValueError, match="not in the dataset"):
        resolve_data_group(df, {"data": "nope", "weight": "w"})

    import tempfile
    with tempfile.TemporaryDirectory() as d:
        write_data_groups(d, groups)
        assert read_data_groups(d) == groups


def test_time_average_accepts_data_group(spark):
    from cngi_prototype_spark.operators.averaging import time_average
    from cngi_prototype_spark.schema import VisSchema
    rows = [(float(t), 0, 0, 0, float(t), -float(t), 10.0 * t, -10.0 * t,
             1.0, 1.0, False, 0, 0, 0)
            for t in range(4)]
    df = spark.createDataFrame(
        rows, "time double, baseline int, chan int, pol int, "
              "data_re double, data_im double, corrected_data_re double, "
              "corrected_data_im double, data_weight double, "
              "corrected_data_weight double, flag boolean, "
              "scan_number int, state_id int, field_id int")
    vs = VisSchema()
    plain = time_average(df, bin=2, vs=vs).orderBy("time").collect()
    corr = time_average(df, bin=2, vs=vs,
                        data_group="1").orderBy("time").collect()
    # group 1 averages the corrected columns: 10x the plain data
    assert corr[0]["corrected_data_re"] == 10 * plain[0]["data_re"]
