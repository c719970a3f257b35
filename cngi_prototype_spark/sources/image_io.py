"""Image dataset I/O (read_image / write_image / describe parity).

Reference: ``cngi/dio/read_image.py:21-105``, ``write_image.py:26-77``.
Long-form image rows persist as Parquet partitioned by ``chan`` (the
axis imaging pipelines prune on — each plane task reads exactly its
partition), zstd-compressed like the reference's Blosc-zstd chunks.
``chunks_on_disk`` maps to ``maxRecordsPerFile`` — the reference's
chunk-shape knob (``write_vis.py:61-62``) in Spark clothes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_image(df: DataFrame, outfile: str, *,
                partition_by: tuple[str, ...] = ("chan",),
                max_records_per_file: int | None = None,
                mode: str = "overwrite") -> None:
    w = df.write.mode(mode).option("compression", "zstd")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(outfile)


def read_image(spark: SparkSession, infile: str,
               chans: list[int] | None = None) -> DataFrame:
    """Partition-pruned image read (the ``chunks=``/selection surface of
    the reference's read_image)."""
    df = spark.read.parquet(infile)
    if chans is not None:
        df = df.filter(F.col("chan").isin([int(c) for c in chans]))
    return df


def describe_image(spark: SparkSession, infile: str) -> DataFrame:
    """Per-chan summary (describe_vis parity for images)."""
    df = spark.read.parquet(infile)
    return (df.groupBy("chan").agg(
        F.count(F.lit(1)).alias("pixels"),
        F.countDistinct("pol").alias("pols"),
        F.max("l_idx").alias("max_l"),
        F.max("m_idx").alias("max_m"))
        .orderBy("chan"))
