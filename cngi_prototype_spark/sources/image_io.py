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


# ---------------------------------------------------------------------------
# FITS image I/O — pure numpy, no astropy. The FITS layout is a public
# standard (NASA FITS 4.0): 2880-byte blocks, 80-char ASCII header
# cards, big-endian data scaled by BSCALE/BZERO, Fortran axis order
# (NAXIS1 fastest). convert_image parity for the FITS half of
# cngi/conversion/convert_image.py:21-130 (the casacore-image half has
# no sandbox analog).
# ---------------------------------------------------------------------------

_FITS_BLOCK = 2880
_FITS_DTYPES = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8",
                -32: ">f4", -64: ">f8"}


def _read_fits_header(fh) -> tuple[dict, int]:
    """Parse the primary header; returns (cards, data_offset)."""
    cards: dict[str, str] = {}
    offset = 0
    done = False
    while not done:
        block = fh.read(_FITS_BLOCK)
        if len(block) < _FITS_BLOCK:
            raise ValueError("truncated FITS header")
        offset += _FITS_BLOCK
        for i in range(0, _FITS_BLOCK, 80):
            card = block[i:i + 80].decode("ascii", "replace")
            key = card[:8].strip()
            if key == "END":
                done = True
                break
            if card[8:10] == "= ":
                cards[key] = card[10:].split("/")[0].strip()
    return cards, offset


def _fits_geometry(cards: dict) -> tuple:
    bitpix = int(cards["BITPIX"])
    naxis = int(cards["NAXIS"])
    shape = [int(cards[f"NAXIS{i}"]) for i in range(1, naxis + 1)]
    bscale = float(cards.get("BSCALE", "1.0"))
    bzero = float(cards.get("BZERO", "0.0"))
    return bitpix, shape, bscale, bzero


def read_fits_image(spark: SparkSession, infile: str,
                    value: str = "image") -> DataFrame:
    """Lazy distributed FITS image read: the driver parses ONLY the
    header (a few KB); each (chan, pol) plane becomes one task that
    seeks directly to its byte range — plane-parallel exactly like the
    parquet path, no driver-side data load. Axis convention: NAXIS1=l,
    NAXIS2=m, NAXIS3=chan, NAXIS4=pol (missing trailing axes = size 1).
    """
    import numpy as np
    import pandas as pd

    with open(infile, "rb") as fh:
        cards, data_off = _read_fits_header(fh)
    bitpix, shape, bscale, bzero = _fits_geometry(cards)
    n_l = shape[0] if len(shape) > 0 else 1
    n_m = shape[1] if len(shape) > 1 else 1
    n_chan = shape[2] if len(shape) > 2 else 1
    n_pol = shape[3] if len(shape) > 3 else 1
    dtype = np.dtype(_FITS_DTYPES[bitpix])
    plane_bytes = n_l * n_m * dtype.itemsize

    def read_planes(batches):
        for pdf in batches:
            out = []
            with open(infile, "rb") as fh:
                for pid in pdf["id"]:
                    pid = int(pid)
                    chan, pol = pid % n_chan, pid // n_chan
                    fh.seek(data_off + pid * plane_bytes)
                    raw = np.frombuffer(fh.read(plane_bytes), dtype=dtype)
                    vals = raw.astype(np.float64) * bscale + bzero
                    # FITS is Fortran order: NAXIS1 (l) varies fastest
                    li = np.tile(np.arange(n_l, dtype=np.int32), n_m)
                    mi = np.repeat(np.arange(n_m, dtype=np.int32), n_l)
                    out.append(pd.DataFrame({
                        "chan": np.full(vals.size, chan, np.int32),
                        "pol": np.full(vals.size, pol, np.int32),
                        "l_idx": li, "m_idx": mi, value: vals,
                    }))
            if out:
                yield pd.concat(out, ignore_index=True)

    planes = spark.range(n_chan * n_pol).repartition(
        min(n_chan * n_pol, int(spark.conf.get("spark.sql.shuffle.partitions"))))
    schema = f"chan int, pol int, l_idx int, m_idx int, {value} double"
    return planes.mapInPandas(read_planes, schema)


def write_fits_image(df: DataFrame, outfile: str, *,
                     value: str = "image",
                     max_plane_cells: int = 64_000_000) -> None:
    """Long-form image rows -> FITS primary HDU (BITPIX -64). The file
    format is one sequential stream, so planes are streamed through the
    driver one at a time (``toLocalIterator`` over plane-collected
    rows) — bounded by ONE plane of memory, never the cube.

    ``max_plane_cells`` guards the driver funnel: a single plane above
    this size (default 64M cells = 512 MB of float64) raises instead of
    silently OOM-ing the driver mid-write — at that scale export via a
    distributed format (parquet store) and convert outside Spark."""
    import numpy as np

    dims = df.agg(
        F.max("l_idx"), F.max("m_idx"), F.max("chan"), F.max("pol")).collect()[0]
    n_l, n_m, n_chan, n_pol = (int(d) + 1 for d in dims)
    if n_l * n_m > max_plane_cells:
        raise ValueError(
            f"plane size {n_l}x{n_m} = {n_l * n_m} cells exceeds "
            f"max_plane_cells={max_plane_cells}; FITS export funnels one "
            f"plane at a time through the driver — write a parquet image "
            f"store instead for cubes this large")

    def card(key: str, val: str) -> bytes:
        return f"{key:<8}= {val:>20}".ljust(80).encode("ascii")

    header = (card("SIMPLE", "T") + card("BITPIX", "-64")
              + card("NAXIS", "4")
              + card("NAXIS1", str(n_l)) + card("NAXIS2", str(n_m))
              + card("NAXIS3", str(n_chan)) + card("NAXIS4", str(n_pol))
              + "END".ljust(80).encode("ascii"))
    header += b" " * (-len(header) % _FITS_BLOCK)

    packed = (df.select("chan", "pol", "l_idx", "m_idx", value)
              .groupBy("chan", "pol")
              .agg(F.array_sort(F.collect_list(
                  F.struct("m_idx", "l_idx", value))).alias("cells"))
              .withColumn("vals", F.transform("cells", lambda s: s[value]))
              .select("chan", "pol", "vals")
              .orderBy("pol", "chan"))
    with open(outfile, "wb") as fh:
        fh.write(header)
        n = 0
        for row in packed.toLocalIterator():
            arr = np.asarray(row["vals"], dtype=">f8")
            if arr.size != n_l * n_m:
                raise ValueError("plane is not dense (l_idx x m_idx)")
            fh.write(arr.tobytes())
            n += arr.size
        fh.write(b"\0" * (-(n * 8) % _FITS_BLOCK))


# ---------------------------------------------------------------------------
# Artifact-set ingest (convert_image parity).
# ---------------------------------------------------------------------------

IMAGE_ARTIFACTS = ["image", "pb", "psf", "residual", "mask", "model",
                   "sumwt", "weight", "image.pbcor"]


def _fits_shape(path: str) -> tuple[int, int, int, int]:
    with open(path, "rb") as fh:
        cards, _ = _read_fits_header(fh)
    _, shape, _, _ = _fits_geometry(cards)
    dims = (shape + [1, 1, 1, 1])[:4]
    return tuple(int(d) for d in dims)


def convert_image_artifacts(
    spark: SparkSession,
    infile: str,
    artifacts: list[str] | None = None,
) -> DataFrame:
    """Ingest a CASA-convention image ARTIFACT SET into one long-form
    image table — ``convert_image``
    (``/root/reference/cngi/conversion/convert_image.py:22-233``): all
    products sharing a prefix (``foo.image`` + ``foo.psf`` + ``foo.pb``
    + ``foo.residual`` ...) become data variables of one dataset;
    Taylor-term files (``foo.image.tt0``, ``foo.image.tt1``) become
    per-term columns; ``sumwt`` (a 1×1×chan×pol image,
    convert_image.py:119) attaches per (chan, pol).

    Same discovery rules as the reference (exact suffix match, then
    ``.tt<N>``, then dotted artifacts like ``image.pbcor``;
    convert_image.py:96-101). Files here are FITS — the sandbox has no
    casatools, so a legacy casacore table directory raises with the
    reference's dependency named. Output: one row per (chan, pol,
    l_idx, m_idx) with a double column per artifact[/term]: ``image``,
    ``image_tt1``, ``psf``, ``sumwt``, ``image_pbcor``, ...

    Scale: each artifact reads plane-parallel (read_fits_image); the
    set is assembled with joins on the cube keys — one shuffle per
    artifact, each bounded by cube size, with the (chan, pol)-only
    sumwt side broadcast.
    """
    import os
    import re

    infile = os.path.expanduser(infile.rstrip("/"))
    prefix = infile[:infile.rindex(".")]
    suffix = infile[infile.rindex(".") + 1:]
    srcdir = os.path.dirname(infile) or "."
    if artifacts is None:
        artifacts = list(IMAGE_ARTIFACTS)
    if suffix not in artifacts:
        artifacts = [suffix] + artifacts

    dirlist = sorted(os.path.join(srcdir, f) for f in os.listdir(srcdir)
                     if os.path.join(srcdir, f).startswith(prefix))
    base: DataFrame | None = None
    pe = re.escape(prefix)
    for imtype in artifacts:
        files = [f for f in dirlist
                 if re.search(rf"{pe}\.{re.escape(imtype)}$", f)]
        if not files:
            files = [f for f in dirlist
                     if re.search(rf"{pe}\.{re.escape(imtype)}\.tt\d+$", f)]
        if not files and len(imtype.split(".")) > 1:
            a, b = imtype.split(".", 1)
            files = [f for f in dirlist if re.search(
                rf"{pe}\.{re.escape(a)}\.tt\d+\.{re.escape(b)}$", f)]
        if not files:
            continue
        for f in files:
            if os.path.isdir(f):
                raise NotImplementedError(
                    f"{f} is a legacy casacore image table — use "
                    "sources.casa_image_adapter.convert_casa_image "
                    "(python-casacore backed), or export to FITS "
                    "(ia.tofits) for this path")
        for f in files:
            m = re.search(r"\.tt(\d+)(\.[^.]+)?$", f)
            tt = int(m.group(1)) if m else 0
            col = imtype.replace(".", "_") + (f"_tt{tt}" if tt else "")
            n_l, n_m, _, _ = _fits_shape(f)
            art = read_fits_image(spark, f, value=col)
            if imtype == "sumwt" or (n_l == 1 and n_m == 1):
                # per-(chan, pol) scalar plane: broadcast-attach
                art = art.select("chan", "pol", col)
                base = art if base is None else base.join(
                    F.broadcast(art), ["chan", "pol"], "left")
            else:
                base = art if base is None else base.join(
                    art, ["chan", "pol", "l_idx", "m_idx"], "left")
    if base is None:
        raise FileNotFoundError(
            f"no image artifacts matching {prefix}.<{'|'.join(artifacts)}>")
    return base
