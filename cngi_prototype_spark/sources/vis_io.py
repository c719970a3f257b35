"""Read / write / describe visibility stores (Parquet layout).

Reference parity:
- ``read_vis``    — cngi/dio/read_vis.py:21-203 (open zarr store, pick a
  partition, rechunk; S3 via s3fs)
- ``write_vis``   — cngi/dio/write_vis.py:26-96 (per-variable Blosc-zstd
  encoding, chunks_on_disk, execution timing stored as attr)
- ``describe_vis`` — cngi/dio/describe_vis.py:21-56 (per-partition
  rows/chans/size summary)
- ``append_xds``  — cngi/dio/append_xds.py (add variables to an existing
  store without rewriting)

Layout: one store = one directory of Parquet, hive-partitioned by ``ddi``
(the reference's partition axis), zstd-compressed (its Blosc-zstd-2
analog). The reference's chunk-shape knob (``chunks_on_disk``,
convert_ms.py:46-48 — BASELINE.md shows 6.7x/0.36x swings from sizing)
maps to ``target_rows_per_file``: row-group/file sizing is the Parquet
equivalent of zarr chunk shape. S3 works unmodified via ``s3a://`` paths.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_vis(
    spark: SparkSession,
    infile: str,
    partition: int | list[int] | None = None,
    columns: list[str] | None = None,
    s3_key: str | None = None,
    s3_secret: str | None = None,
    s3_endpoint: str | None = None,
) -> DataFrame:
    """Open a vis store; optionally select ddi partition(s) and columns.

    The ddi filter prunes hive partitions at plan time and the column
    list prunes the Parquet read schema — the lazy-variable behavior of
    read_vis.py:183-199 for free from Catalyst.

    Keyed S3 access (read_vis.py:70-179's s3fs key/secret arguments):
    explicit credentials map onto the Hadoop S3A conf of this session,
    scoped PER BUCKET (``fs.s3a.bucket.<bucket>.*``) when ``infile`` is
    an ``s3a://`` URI, so two stores with different keys coexist in one
    session; a non-s3a ``infile`` falls back to the session-global keys
    (last writer wins — documented S3A semantics). Anonymous access is
    the S3A default credential chain.
    """
    if s3_key is not None or s3_secret is not None or s3_endpoint is not None:
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        prefix = "fs.s3a."
        if infile.startswith("s3a://"):
            bucket = infile[len("s3a://"):].split("/", 1)[0]
            if bucket:
                prefix = f"fs.s3a.bucket.{bucket}."
        if s3_key is not None:
            hconf.set(prefix + "access.key", s3_key)
        if s3_secret is not None:
            hconf.set(prefix + "secret.key", s3_secret)
        if s3_endpoint is not None:
            hconf.set(prefix + "endpoint", s3_endpoint)
    df = spark.read.parquet(infile)
    if partition is not None:
        parts = [partition] if isinstance(partition, int) else list(partition)
        df = df.filter(F.col("ddi").isin(parts))
    if columns:
        keep = [c for c in df.columns if c in set(columns) | {"ddi"}]
        df = df.select(*keep)
    return df


def write_vis(
    df: DataFrame,
    outfile: str,
    partition_by: list[str] | None = None,
    target_rows_per_file: int | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write a vis store; returns {'elapsed_sec': ...} the way write_vis
    records graph-execution time as a store attr (write_vis.py:90-92)."""
    t0 = time.time()
    writer = df.write.mode(mode)
    if target_rows_per_file:
        writer = writer.option("maxRecordsPerFile", str(target_rows_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(outfile)
    return {"elapsed_sec": time.time() - t0}


def append_vis_columns(
    spark: SparkSession,
    store: str,
    new_cols: DataFrame,
    keys: list[str],
) -> DataFrame:
    """append_xds analog: attach new data variables to an existing store
    without rewriting it — write the new columns as a side table and
    join-on-read on the cube keys (append_xds.py:26-181 writes new zarr
    arrays into the store directory)."""
    side = store.rstrip("/") + "__cols"
    new_cols.write.mode("overwrite").parquet(side)
    base = spark.read.parquet(store)
    return base.join(spark.read.parquet(side), keys, "left")


def describe_vis(spark: SparkSession, infile: str) -> DataFrame:
    """Per-ddi summary: rows, distinct times/baselines/chans/pols
    (describe_vis.py:21-56 returns the same per-partition table)."""
    df = spark.read.parquet(infile)
    return df.groupBy("ddi").agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("time").alias("n_time"),
        F.countDistinct("baseline").alias("n_baseline"),
        F.countDistinct("chan").alias("n_chan"),
        F.countDistinct("pol").alias("n_pol"),
    )


def read_ms(
    spark: SparkSession,
    infile: str,
    ddis: list[int] | None = None,
    ignore: list[str] | None = None,
) -> dict:
    """Lazy MS-shaped reader (``cngi/conversion/read_ms.py:21-163``
    surface): one MAIN DataFrame per DDI partition plus every subtable,
    all LAZY — nothing is scanned until an action runs, mirroring the
    reference's dask-delayed per-DDI xds partitions.

    The on-disk layout is this engine's MS analog (casacore tables have
    no sandbox reader): a directory with ``MAIN/`` parquet partitioned
    by ``ddi`` (the :func:`write_vis` layout) and one
    ``<SUBTABLE>.parquet`` per subtable (ANTENNA, SPECTRAL_WINDOW,
    POLARIZATION, FIELD, ... — the :func:`read_simple_table` targets).
    Returns ``{"xds<ddi>": DataFrame, ..., "global": {name: DataFrame}}``
    keyed like the reference's mxds attrs.

    DDI discovery reads only the hive partition directory names (file
    listing, not data); ``ddis`` restricts which partitions get an
    entry; ``ignore`` skips named subtables (read_ms.py:44-46).
    """
    import os

    main_path = os.path.join(infile, "MAIN")
    main = spark.read.parquet(main_path)
    if ddis is None:
        found = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(main_path)
            if d.startswith("ddi="))
        ddis = found
    out: dict = {}
    for ddi in ddis:
        out[f"xds{ddi}"] = main.filter(F.col("ddi") == int(ddi))
    skip = set(ignore or [])
    subs: dict = {}
    for entry in sorted(os.listdir(infile)):
        if not entry.endswith(".parquet"):
            continue
        name = entry[: -len(".parquet")]
        if name in skip:
            continue
        subs[name] = spark.read.parquet(os.path.join(infile, entry))
    out["global"] = subs
    return out


def read_simple_table(spark: SparkSession, infile: str, subtable: str,
                      add_row_id: str | None = None) -> DataFrame:
    """Subtable read (``_table_conversion2.read_simple_table`` surface):
    optionally adds the dense 0-based row-id column the reference
    derives from the table row order (read_ms.py:72-74)."""
    df = spark.read.parquet(f"{infile.rstrip('/')}/{subtable}.parquet")
    if add_row_id:
        from pyspark.sql.window import Window
        df = df.withColumn(
            add_row_id,
            F.row_number().over(Window.orderBy(F.monotonically_increasing_id())) - 1)
    return df


def write_vis_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: list[str],
    n_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Write a vis store as a BUCKETED catalog table (hash-bucketed on
    ``bucket_by`` into ``n_buckets`` files per partition, optionally
    sorted within buckets).

    The co-located-join leg of the scale toolkit: two stores bucketed
    identically on their join keys (e.g. ``baseline`` for vis⋈vis, or
    ``doc_id`` for corpus⋈features) join WITHOUT either side
    shuffling — Catalyst recognizes the matching output partitioning
    and plans a zero-Exchange sort-merge join
    (tests/test_plan_shapes.py asserts it). At 100 TB, re-bucketing
    once at ingest amortizes every downstream key-aligned join/groupBy
    of a pipeline; ``sort_by`` additionally removes the per-task sort
    from SMJ reads. Bucketing requires the table catalog (parquet files
    + bucket metadata under spark.sql.warehouse.dir), unlike plain
    ``write_vis`` paths."""
    t0 = time.time()
    writer = df.write.mode(mode).bucketBy(int(n_buckets), *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
    return {"elapsed_sec": time.time() - t0}


def read_vis_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog (possibly bucketed) vis table; bucket metadata
    rides the scan, so key-aligned joins skip their shuffles."""
    return spark.table(table)
