"""Image I/O round trip with partition pruning."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd

import pytest
from pyspark.sql import functions as F

from cngi_prototype_spark.sources.image_io import describe_image, read_image, write_image


def test_image_io_roundtrip_and_pruning(spark):
    rng = np.random.default_rng(1)
    li, mi = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    frames = []
    for ch in range(3):
        for po in range(2):
            frames.append(pd.DataFrame({
                "chan": ch, "pol": po,
                "l_idx": li.ravel(), "m_idx": mi.ravel(),
                "image": rng.normal(size=64)}))
    pdf = pd.concat(frames, ignore_index=True)
    tmp = tempfile.mkdtemp()
    try:
        write_image(spark.createDataFrame(pdf), f"{tmp}/img",
                    max_records_per_file=128)
        back = read_image(spark, f"{tmp}/img").toPandas()
        assert len(back) == len(pdf)
        sel = read_image(spark, f"{tmp}/img", chans=[1])
        assert set(sel.toPandas().chan) == {1}
        # partition pruning visible in the plan
        assert "PartitionFilters: [isnotnull(chan" in sel._jdf.queryExecution() \
            .executedPlan().toString() or sel.count() == 128
        d = describe_image(spark, f"{tmp}/img").toPandas()
        assert list(d.chan) == [0, 1, 2]
        assert (d.pixels == 128).all() and (d.pols == 2).all()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_fits_image_roundtrip(spark, tmp_path):
    import numpy as np
    from pyspark.sql import functions as F

    from cngi_prototype_spark.sources.image_io import (
        read_fits_image,
        write_fits_image,
    )

    n_l, n_m, n_chan, n_pol = 8, 6, 3, 2
    cube = spark.range(n_l * n_m * n_chan * n_pol).select(
        (F.col("id") % n_l).cast("int").alias("l_idx"),
        ((F.col("id") / n_l).cast("long") % n_m).cast("int").alias("m_idx"),
        ((F.col("id") / (n_l * n_m)).cast("long") % n_chan).cast("int").alias("chan"),
        ((F.col("id") / (n_l * n_m * n_chan)).cast("long") % n_pol).cast("int").alias("pol"),
        (F.col("id").cast("double") / 7.0).alias("image"))
    path = str(tmp_path / "cube.fits")
    write_fits_image(cube, path)

    # file structure: header block + data rounded to 2880
    raw = open(path, "rb").read()
    assert raw[:6] == b"SIMPLE"
    assert len(raw) % 2880 == 0

    back = read_fits_image(spark, path).toPandas().sort_values(
        ["pol", "chan", "m_idx", "l_idx"]).reset_index(drop=True)
    orig = cube.toPandas().sort_values(
        ["pol", "chan", "m_idx", "l_idx"]).reset_index(drop=True)
    assert len(back) == len(orig)
    assert np.array_equal(back.image.to_numpy(), orig.image.to_numpy())


def test_fits_reader_handles_bscale_int16(spark, tmp_path):
    import numpy as np

    from cngi_prototype_spark.sources.image_io import read_fits_image

    # hand-built BITPIX=16 file with BSCALE/BZERO
    n_l, n_m = 4, 3
    def card(k, v):
        return f"{k:<8}= {v:>20}".ljust(80).encode()
    hdr = (card("SIMPLE", "T") + card("BITPIX", "16") + card("NAXIS", "2")
           + card("NAXIS1", str(n_l)) + card("NAXIS2", str(n_m))
           + card("BSCALE", "0.5") + card("BZERO", "100.0")
           + b"END".ljust(80))
    hdr += b" " * (-len(hdr) % 2880)
    data = np.arange(n_l * n_m, dtype=">i2")
    body = data.tobytes()
    body += b"\0" * (-len(body) % 2880)
    path = str(tmp_path / "scaled.fits")
    open(path, "wb").write(hdr + body)

    got = read_fits_image(spark, path).toPandas().sort_values(
        ["m_idx", "l_idx"]).reset_index(drop=True)
    assert np.allclose(got.image, np.arange(n_l * n_m) * 0.5 + 100.0)
    assert (got.chan == 0).all() and (got.pol == 0).all()


def test_write_fits_image_guards_oversize_planes(spark, tmp_path):
    from cngi_prototype_spark.sources.image_io import write_fits_image
    import pytest as _pytest
    from pyspark.sql import functions as F

    df = spark.range(4).select(
        F.lit(0).alias("chan"), F.lit(0).alias("pol"),
        (F.col("id") / 2).cast("int").alias("l_idx"),
        (F.col("id") % 2).cast("int").alias("m_idx"),
        F.col("id").cast("double").alias("image"))
    with _pytest.raises(ValueError, match="max_plane_cells"):
        write_fits_image(df, str(tmp_path / "x.fits"), max_plane_cells=2)


def test_convert_image_artifacts_set(spark, tmp_path):
    """foo.image + foo.psf + taylor terms + 1x1 sumwt assemble into one
    table with per-artifact columns (convert_image parity)."""
    import numpy as np
    from cngi_prototype_spark.sources.image_io import (
        convert_image_artifacts, write_fits_image)
    rng = np.random.default_rng(11)
    rows = [(c, p, l, m, float(rng.normal()))
            for c in range(2) for p in range(1)
            for l in range(4) for m in range(4)]
    df = spark.createDataFrame(
        rows, "chan int, pol int, l_idx int, m_idx int, image double")
    pre = str(tmp_path / "foo")
    write_fits_image(df, pre + ".image")
    write_fits_image(df.withColumn("image", F.col("image") * 2.0),
                     pre + ".psf")
    write_fits_image(df.withColumn("image", F.col("image") + 1.0),
                     pre + ".model.tt0")
    write_fits_image(df.withColumn("image", F.col("image") - 1.0),
                     pre + ".model.tt1")
    sw = spark.createDataFrame(
        [(c, 0, 0, 0, 10.0 + c) for c in range(2)],
        "chan int, pol int, l_idx int, m_idx int, image double")
    write_fits_image(sw, pre + ".sumwt")

    out = convert_image_artifacts(spark, pre + ".image")
    pdf = out.orderBy("chan", "pol", "l_idx", "m_idx").toPandas()
    src = df.orderBy("chan", "pol", "l_idx", "m_idx").toPandas()
    assert {"image", "psf", "model", "model_tt1",
            "sumwt"} <= set(pdf.columns)
    assert np.allclose(pdf.image, src.image)
    assert np.allclose(pdf.psf, src.image * 2.0)
    assert np.allclose(pdf.model, src.image + 1.0)
    assert np.allclose(pdf.model_tt1, src.image - 1.0)
    # sumwt broadcast per (chan, pol)
    assert np.allclose(pdf[pdf.chan == 1].sumwt, 11.0)
    assert len(pdf) == len(src)


def test_convert_image_artifacts_casacore_dir_raises(spark, tmp_path):
    import os
    from cngi_prototype_spark.sources.image_io import (
        convert_image_artifacts)
    os.makedirs(tmp_path / "bar.image")
    with pytest.raises(NotImplementedError, match="convert_casa_image"):
        convert_image_artifacts(spark, str(tmp_path / "bar.image"))
