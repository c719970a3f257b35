"""MeasurementSet ingestion adapter (python-casacore backed).

Reference parity: ``convert_ms``
(``/root/reference/cngi/conversion/convert_ms.py:21-252``) reads
casacore MS tables per DDI and pivots them into the store format;
``convert_simple_table`` / ``convert_expanded_table``
(``cngi/_utils/_table_conversion.py:92-348``) handle the subtables.

The casacore table format is a binary container that needs the
casacore library — this sandbox doesn't have it, so this module is the
documented ADAPTER: against the public ``python-casacore`` API
(``casacore.tables.table``/``taql``), it converts the MAIN table per
DDI into the engine's long form (one row per (time, baseline, chan,
pol); complex DATA → ``data_re``/``data_im``; the reference's NaN pad
cells simply never exist) and every subtable into a plain DataFrame.
Install path on a real machine: ``pip install python-casacore`` (or
conda-forge ``casacore``). Without it, a clear ImportError names the
dependency. The conversion logic itself is unit-tested against a fake
casacore backend (tests/test_ms_adapter.py), so only the thin library
boundary is untested here.

Scale shape: conversion is the same driver-side chunked pass the
reference runs (casacore tables are not safely concurrently readable;
the reference's multiprocessing pool reads disjoint row ranges of a
LOCAL table — on a cluster the MS sits on one machine anyway). Rows
stream through in ``chunk_rows`` batches: getcol slices → numpy
chan/pol unroll → Arrow batches appended to the store; peak memory is
one chunk, never the MS. After conversion everything is distributed
parquet/zarr.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from cngi_prototype_spark.sources.ingest import MJD_UNIX_OFFSET_S

MAIN_COLUMNS = ["TIME", "ANTENNA1", "ANTENNA2", "DATA", "FLAG",
                "WEIGHT", "SCAN_NUMBER", "STATE_ID", "FIELD_ID", "UVW"]


def _tables():
    try:
        from casacore import tables  # type: ignore
        return tables
    except ImportError as e:
        raise ImportError(
            "convert_ms needs python-casacore to read MeasurementSet "
            "tables (pip install python-casacore / conda-forge "
            "casacore). In environments without it, convert the MS "
            "elsewhere and ship the parquet/zarr store."
        ) from e


def _main_chunk_to_pandas(cols: dict[str, np.ndarray]) -> "Any":
    """One getcol chunk → long-form pandas frame: unroll (row, chan,
    pol) to rows. DATA arrives (nrow, nchan, npol) complex; WEIGHT is
    per-(row, pol) (the MS convention) and broadcasts along chan."""
    import pandas as pd

    data = np.asarray(cols["DATA"])
    nrow, nchan, npol = data.shape
    flag = np.asarray(cols["FLAG"]).reshape(nrow, nchan, npol)
    weight = np.asarray(cols["WEIGHT"]).reshape(nrow, npol)
    uvw = np.asarray(cols["UVW"]).reshape(nrow, 3)

    def per_row(x):  # (nrow,) scalar -> every (chan, pol) cell
        return np.repeat(np.asarray(x), nchan * npol)

    chan_idx = np.tile(np.repeat(np.arange(nchan, dtype=np.int32), npol),
                       nrow)
    pol_idx = np.tile(np.arange(npol, dtype=np.int32), nrow * nchan)
    flat = data.reshape(-1)
    return pd.DataFrame({
        # MJD seconds → unix seconds (convert_time,
        # _table_conversion.py:42-44)
        "time": per_row(cols["TIME"]) - MJD_UNIX_OFFSET_S,
        "ant1": per_row(cols["ANTENNA1"]).astype(np.int32),
        "ant2": per_row(cols["ANTENNA2"]).astype(np.int32),
        "chan": chan_idx,
        "pol": pol_idx,
        "data_re": flat.real.astype(np.float64),
        "data_im": flat.imag.astype(np.float64),
        "flag": flag.reshape(-1).astype(bool),
        "data_weight": np.repeat(weight, nchan, axis=0).reshape(-1)
        .astype(np.float64),
        "scan_number": per_row(cols["SCAN_NUMBER"]).astype(np.int32),
        "state_id": per_row(cols["STATE_ID"]).astype(np.int32),
        "field_id": per_row(cols["FIELD_ID"]).astype(np.int32),
        "uvw_0": np.repeat(uvw[:, 0], nchan * npol),
        "uvw_1": np.repeat(uvw[:, 1], nchan * npol),
        "uvw_2": np.repeat(uvw[:, 2], nchan * npol),
    })


def _iter_main_chunks(tb, columns: list[str],
                      chunk_rows: int) -> Iterator[dict]:
    n = tb.nrows()
    for start in range(0, n, chunk_rows):
        k = min(chunk_rows, n - start)
        yield {c: tb.getcol(c, startrow=start, nrow=k) for c in columns}


def convert_ms(
    spark: SparkSession,
    infile: str,
    outfile: str,
    *,
    ddis: list[int] | None = None,
    chunk_rows: int = 100_000,
    subtables: bool = True,
) -> dict:
    """Convert a MeasurementSet into a long-form parquet vis store
    (hive-partitioned by ``ddi``) plus one parquet table per subtable
    under ``<outfile>__subtables/``. Returns
    ``{'ddis': [...], 'rows': {ddi: n}, 'subtables': [...]}``.
    """
    import numpy as np
    from pyspark.sql import functions as F

    from cngi_prototype_spark.operators.data_groups import (
        data_groups_from_columns, write_data_groups)

    tables = _tables()
    main = tables.table(infile, ack=False)
    try:
        if ddis is None:
            ddis = sorted(set(
                int(x) for x in main.getcol("DATA_DESC_ID")))
        # GLOBAL dense baseline ids (ordered by (ant1, ant2) like the
        # reference's TaQL sort) from one cheap chunked pass over the
        # two antenna columns — per-DDI assignment would give the same
        # physical pair different ids in different DDIs of the one
        # hive-partitioned store
        pair_set: set[tuple[int, int]] = set()
        for chunk in _iter_main_chunks(main, ["ANTENNA1", "ANTENNA2"],
                                       chunk_rows):
            a1 = np.asarray(chunk["ANTENNA1"])
            a2 = np.asarray(chunk["ANTENNA2"])
            pair_set.update(zip(a1.tolist(), a2.tolist()))
        baseline_of = {p: i for i, p in enumerate(sorted(pair_set))}
        rows: dict[int, int] = {}
        first = True
        for ddi in ddis:
            sel = tables.taql(
                f"SELECT * FROM $1 WHERE DATA_DESC_ID = {int(ddi)}",
                tables=[main])
            try:
                # STREAM chunk-by-chunk into the store: peak memory is
                # one chunk (the documented contract) — accumulating
                # per-DDI unions holds the whole DDI on the driver
                n_ddi = 0
                for chunk in _iter_main_chunks(sel, MAIN_COLUMNS,
                                               chunk_rows):
                    pdf = _main_chunk_to_pandas(chunk)
                    pdf["baseline"] = np.fromiter(
                        (baseline_of[(a, b)]
                         for a, b in zip(pdf["ant1"], pdf["ant2"])),
                        dtype=np.int32, count=len(pdf))
                    n_ddi += len(pdf)
                    df = spark.createDataFrame(pdf).withColumn(
                        "ddi", F.lit(int(ddi)))
                    mode = "overwrite" if first else "append"
                    w = df.write.mode(mode).partitionBy("ddi")
                    w.parquet(outfile)
                    first = False
                rows[ddi] = n_ddi
            finally:
                sel.close()
        write_data_groups(
            outfile,
            data_groups_from_columns(
                ["data_re", "data_im", "data_weight", "flag"]))
        subs = []
        if subtables:
            subs = convert_ms_subtables(spark, infile,
                                        outfile + "__subtables")
        return {"ddis": list(ddis), "rows": rows, "subtables": subs}
    finally:
        main.close()


def convert_ms_subtables(spark: SparkSession, infile: str,
                         outdir: str) -> list[str]:
    """convert_simple_table analog for every keyword-linked subtable
    (ANTENNA, SPECTRAL_WINDOW, POLARIZATION, FIELD, ...): scalar and
    small-array columns become DataFrame columns (arrays as lists);
    columns casacore cannot read uniformly are skipped, like the
    reference's ignore list (_table_conversion.py:92-130)."""
    import pandas as pd

    tables = _tables()
    main = tables.table(infile, ack=False)
    written = []
    try:
        sub_names = [k for k in main.keywordnames()
                     if str(main.getkeyword(k)).startswith("Table: ")]
        for name in sub_names:
            st = tables.table(str(main.getkeyword(name))[len("Table: "):],
                              ack=False)
            try:
                cols = {}
                for c in st.colnames():
                    try:
                        v = st.getcol(c)
                    except RuntimeError:
                        continue  # variable-shaped column: skip
                    arr = np.asarray(v)
                    if arr.ndim == 1:
                        cols[c.lower()] = arr
                    else:
                        cols[c.lower()] = list(
                            arr.reshape(arr.shape[0], -1))
                if cols:
                    spark.createDataFrame(pd.DataFrame(cols)) \
                        .write.mode("overwrite") \
                        .parquet(f"{outdir}/{name.lower()}.parquet")
                    written.append(name.lower())
            finally:
                st.close()
    finally:
        main.close()
    return written
