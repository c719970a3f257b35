"""Low-memory smoke tier: the dense fat-row gridder and the dense-slab
degrid kernel must COMPLETE (spill/split, not OOM) under an
artificially small JVM heap.

Round 8's driver bench died of a Java heap OOM in the skewed CHILES
tier — the fat-row ``collect_list`` buffers plus the deserialized
input cache outgrew the 8 GiB default — and because nothing in CI
exercised a tight-heap run, the regression shipped. This test is the
standing guard: a 1 GiB subprocess session (heap size is fixed at JVM
start, so the shared test session can't be used) runs both dense paths
at a proportionally scaled-down shape with the same ingredients —
skewed (centrally-condensed) uv, serialized persist, ``salt_probe``
byte-budgeted sub-salting — and must exit 0.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
from pyspark import StorageLevel
from pyspark.sql import functions as F

from cngi_prototype_spark.session import initialize_framework
from cngi_prototype_spark.imaging.grid import GridParms
from cngi_prototype_spark.imaging.image import make_image
from cngi_prototype_spark.imaging.degrid import (degrid_visibilities,
                                                 model_image_to_grid)

spark = initialize_framework(
    cores=8, memory="1g", shuffle_partitions=8, app_name="lowmem_smoke",
    # Arrow's JNI-critical array handoffs block GC; under a heap this
    # tight, G1's default 2 GCLocker allocation retries can give up
    # while a critical section is open (observed: "Retried waiting for
    # GCLocker too often" at 1g with 8 Arrow workers). More retries is
    # the standard Arrow-workload mitigation and a no-op off-pressure.
    extra_conf={"spark.driver.extraJavaOptions":
                "-XX:+UnlockDiagnosticVMOptions "
                "-XX:GCLockerRetryAllocationCount=64"})
gp = GridParms(n_u=512, n_v=512, cell_u=2.5e-6, cell_v=2.5e-6,
               support=17, oversampling=100)
n = 4_000_000
eid = F.col("id")
# Bates(4) central condensation — the hot-slab regime that OOMed r8
u = (((eid * 7919 % 40000) + ((eid * 104729 + 7) % 40000)
      + (eid * 7 % 40000) + ((eid * 31 + 3) % 40000))
     / F.lit(8.0) - F.lit(10000.0))
v = (((eid * 6007 % 40000) + ((eid * 90001 + 5) % 40000)
      + (eid * 13 % 40000) + ((eid * 57 + 1) % 40000))
     / F.lit(8.0) - F.lit(10000.0))
vis = spark.range(n).repartition(8).select(
    u.alias("u"), v.alias("v"),
    (F.lit(1.4e9) + (eid % 2) * F.lit(1.0e6)).alias("freq"),
    (eid % 2).cast("int").alias("chan"),
    (eid % 2).cast("int").alias("pol"),
    ((eid % 97).cast("double") / 48.0 - 1.0).alias("data_re"),
    ((eid % 89).cast("double") / 44.0 - 1.0).alias("data_im"),
    (F.lit(1.0) + (eid % 5).cast("double")).alias("weight"),
)
vis = vis.persist(StorageLevel.MEMORY_AND_DISK)
vis.count()
img = make_image(vis, gp, image_size=(500, 500), weight="weight",
                 variant="kernel", n_planes=4, output="planes",
                 salt_probe=True)
img.write.mode("overwrite").format("noop").save()
print("GRID_OK", flush=True)

model = spark.createDataFrame(
    [(c, p, 256 + 3 * c, 256 - 2 * p, 2.0)
     for c in range(2) for p in range(2)],
    "chan int, pol int, l_idx int, m_idx int, model double")
grid_df = model_image_to_grid(model, gp)
dg_vis = vis.limit(1_000_000).withColumn(
    "row_id", F.monotonically_increasing_id())
out = degrid_visibilities(dg_vis, grid_df, gp, variant="kernel",
                          salt_probe=True)
out.write.mode("overwrite").format("noop").save()
print("SMOKE_OK", flush=True)
spark.stop()
"""


def test_dense_paths_survive_1g_heap():
    env = {**os.environ, "SPARK_GRAFT_MEM": "1g"}
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"low-memory smoke died:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-3000:]}")
    assert "GRID_OK" in proc.stdout and "SMOKE_OK" in proc.stdout
