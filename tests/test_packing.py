import pyspark.sql.functions as F

from cngi_prototype_spark.operators.packing import pack_spectra, unpack_spectra


def test_pack_roundtrip_identity(spark, vis_df):
    long0 = vis_df.select("time", "baseline", "pol", "chan", "data_re", "data_im")
    packed = pack_spectra(long0)
    back = unpack_spectra(packed)
    assert back.count() == long0.count()
    # exact multiset equality via anti-joins both ways
    assert back.exceptAll(long0).count() == 0
    assert long0.exceptAll(back).count() == 0


def test_pack_chan_order_and_alignment(spark, vis_df):
    # shuffle row order first; packed chans must still be ascending and
    # value arrays aligned with chans
    long0 = (vis_df.select("time", "baseline", "pol", "chan", "data_re", "data_im")
             .repartition(7))
    packed = pack_spectra(long0)
    bad = packed.filter(F.array_sort("chans") != F.col("chans")).count()
    assert bad == 0
    misaligned = packed.filter(
        (F.size("chans") != F.size("data_re")) | (F.size("chans") != F.size("data_im"))
    ).count()
    assert misaligned == 0
    # spot-check one cell against the long form
    row = packed.limit(1).collect()[0]
    c0 = row["chans"][0]
    want = (long0.filter((F.col("time") == row["time"])
                         & (F.col("baseline") == row["baseline"])
                         & (F.col("pol") == row["pol"])
                         & (F.col("chan") == c0))
            .select("data_re").first()[0])
    assert row["data_re"][0] == want


def test_pack_preserves_sparsity_and_nulls(spark, vis_df):
    # drop some chans entirely and null out some values: packing must keep
    # only present chans and carry nulls through the arrays
    long0 = (vis_df.select("time", "baseline", "pol", "chan",
                           F.when(F.col("chan") % 3 != 0, F.col("data_re"))
                           .alias("data_re"))
             .filter(F.col("chan") % 5 != 4))
    packed = pack_spectra(long0, values=("data_re",))
    assert packed.filter(F.array_contains("chans", 4)).count() == 0
    n_null_long = long0.filter(F.col("data_re").isNull()).count()
    n_null_packed = packed.select(
        F.sum(F.size(F.filter("data_re", lambda x: x.isNull())))).first()[0]
    assert n_null_long == n_null_packed
    back = unpack_spectra(packed, values=("data_re",))
    assert back.exceptAll(long0).count() == 0 and long0.exceptAll(back).count() == 0
