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
