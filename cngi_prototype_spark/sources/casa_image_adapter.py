"""CASA image-table ingestion adapter (python-casacore backed).

Reference parity: ``convert_image``
(``/root/reference/cngi/conversion/convert_image.py:26-233``) opens
legacy ``.image`` casacore table containers with the casatools
``image`` tool and assembles the artifact set (``.psf``, ``.pb``,
``.residual``, Taylor ``.tt<N>`` terms, per-(chan, pol) ``.sumwt``)
into one dataset. The FITS half of that surface is covered by
``image_io.convert_image_artifacts``; THIS module covers the
casacore-table half against the public ``python-casacore`` ``images``
API (``casacore.images.image``: ``shape()``, ``coordinates()``,
``getdata(blc, trc)``, ``unit()``, ``info()``).

The sandbox has no casacore, so the adapter follows the ms_adapter
pattern: a clear ImportError names the dependency
(``pip install python-casacore``), and the conversion logic — axis
canonicalization, plane slicing, artifact-set assembly, Taylor/sumwt
handling — is fully exercised against a fake ``casacore.images``
backend (tests/test_casa_image_adapter.py) serving deterministic numpy
arrays with the real API's shapes and conventions. Only the thin
library boundary is untested here.

Scale shape: like ms_adapter, conversion is a driver-side streamed
pass (casacore table containers are single-machine, not safely
concurrently readable): planes stream through in ``batch_planes``
batches — peak memory is one batch across the artifact set, never the
cube — and land in the engine's parquet image store (partitioned by
``chan``), after which everything is distributed.
"""

from __future__ import annotations

import os
import re
from typing import Any, Iterator

import numpy as np

from pyspark.sql import DataFrame, SparkSession

#: the reference's default artifact list (convert_image.py:85)
IMAGE_ARTIFACTS = ("image", "pb", "psf", "residual", "mask", "model",
                   "sumwt", "weight", "image.pbcor")

_CANON = {"right_ascension": "l", "declination": "m",
          "stokes": "pol", "frequency": "chan"}


def _images():
    try:
        from casacore import images  # type: ignore
        return images
    except ImportError as e:
        raise ImportError(
            "convert_casa_image needs python-casacore to open legacy "
            "CASA image tables (pip install python-casacore / "
            "conda-forge casacore). Without it, export the image to "
            "FITS (casatools ia.tofits) and use "
            "image_io.convert_image_artifacts."
        ) from e


def _canon_axes(im) -> list[str]:
    """Flattened axis names in DATA (numpy) order, canonicalized to the
    engine's (l, m, chan, pol) vocabulary. python-casacore's
    ``coordinates().get_axes()`` lists per-coordinate axis-name groups
    in the order the data shape uses."""
    flat: list[str] = []
    for grp in im.coordinates().get_axes():
        if isinstance(grp, (list, tuple, np.ndarray)):
            flat.extend(str(a) for a in grp)
        else:
            flat.append(str(grp))
    names = [a.strip().lower().replace(" ", "_") for a in flat]
    return [_CANON.get(n, n) for n in names]


def _axis_size(im, axes: list[str], name: str) -> int:
    shp = list(im.shape())
    return int(shp[axes.index(name)]) if name in axes else 1


def _read_plane(im, axes: list[str], chan: int, pol: int) -> np.ndarray:
    """One (chan, pol) plane as a (n_m, n_l) float array. Non-canonical
    extra axes must be degenerate (size 1) — same limitation the
    reference's 4-axis chunk spec implies."""
    shp = [int(s) for s in im.shape()]
    blc = [0] * len(shp)
    trc = [s - 1 for s in shp]
    for name, val in (("chan", chan), ("pol", pol)):
        if name in axes:
            i = axes.index(name)
            blc[i] = trc[i] = min(val, shp[i] - 1)
    for i, (name, s) in enumerate(zip(axes, shp)):
        if name not in ("l", "m", "chan", "pol") and s != 1:
            raise NotImplementedError(
                f"non-degenerate extra image axis {name!r} (size {s}) "
                "not supported")
    arr = np.asarray(im.getdata(blc, trc), dtype=np.float64).reshape(
        [t - b + 1 for b, t in zip(blc, trc)])
    # squeeze everything but l/m, then put axes in (m, l) order
    keep = [i for i, n in enumerate(axes) if n in ("l", "m")]
    arr = arr.transpose(keep + [i for i in range(len(axes))
                                if i not in keep])
    arr = arr.reshape(arr.shape[:len(keep)] or (1,))
    if len(keep) == 2 and axes[keep[0]] == "l":
        arr = arr.T  # stored (l, m) → canonical (m, l)
    if arr.ndim == 1:
        # single spatial axis: l lies along columns, m along rows
        arr = (arr.reshape(-1, 1) if keep and axes[keep[0]] == "m"
               else arr.reshape(1, -1))
    return arr


def _discover_artifacts(infile: str,
                        artifacts: list[str] | None) -> dict[str, list]:
    """Reference discovery rules (convert_image.py:94-101): exact
    suffix, then ``.tt<N>`` Taylor terms, then dotted artifacts.
    Returns {column_name: path} per artifact[/term]."""
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
    pe = re.escape(prefix)
    out: dict[str, str] = {}
    for imtype in artifacts:
        files = [f for f in dirlist
                 if re.search(rf"{pe}\.{re.escape(imtype)}$", f)]
        if not files:
            files = [f for f in dirlist
                     if re.search(rf"{pe}\.{re.escape(imtype)}\.tt\d+$",
                                  f)]
        if not files and len(imtype.split(".")) > 1:
            a, b = imtype.split(".", 1)
            files = [f for f in dirlist if re.search(
                rf"{pe}\.{re.escape(a)}\.tt\d+\.{re.escape(b)}$", f)]
        for f in files:
            m = re.search(r"\.tt(\d+)(\.[^.]+)?$", f)
            tt = int(m.group(1)) if m else 0
            col = imtype.replace(".", "_") + (f"_tt{tt}" if tt else "")
            out[col] = f
    return out


def convert_casa_image(
    spark: SparkSession,
    infile: str,
    outfile: str | None = None,
    *,
    artifacts: list[str] | None = None,
    batch_planes: int = 8,
) -> dict:
    """Convert a legacy CASA ``.image`` table container (plus its
    artifact set) into the engine's long-form image store: one row per
    (chan, pol, l_idx, m_idx) with a double column per artifact[/term]
    (``image``, ``image_tt1``, ``psf``, ``sumwt``, ...). With
    ``outfile`` the rows land in the parquet image store (partitioned
    by ``chan``, the ``image_io.write_image`` convention) and the
    store path is returned in the info dict; without it the assembled
    DataFrame is returned under ``'df'`` (test/small-image path).

    Returns ``{'shape': (n_l, n_m, n_chan, n_pol), 'columns': [...],
    'attrs': {...}, 'rows': n, 'outfile' | 'df': ...}``.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    images = _images()
    paths = _discover_artifacts(infile, artifacts)
    if not paths:
        raise FileNotFoundError(f"no image artifacts matching {infile}")

    opened: dict[str, Any] = {}
    try:
        for col, f in paths.items():
            opened[col] = images.image(f)
        main_col = min(opened, key=lambda c: (c != "image", c))
        main = opened[main_col]
        maxes = _canon_axes(main)
        n_l = _axis_size(main, maxes, "l")
        n_m = _axis_size(main, maxes, "m")
        n_chan = _axis_size(main, maxes, "chan")
        n_pol = _axis_size(main, maxes, "pol")

        # per-(chan, pol) scalar artifacts (sumwt) attach as constant
        # plane columns; full-cube artifacts must match the main grid
        kinds: dict[str, str] = {}
        for col, im in opened.items():
            axes = _canon_axes(im)
            il, im_ = _axis_size(im, axes, "l"), _axis_size(im, axes, "m")
            if il == 1 and im_ == 1 and (n_l, n_m) != (1, 1):
                kinds[col] = "scalar"
            elif (il, im_) == (n_l, n_m):
                kinds[col] = "cube"
            else:
                raise ValueError(
                    f"{paths[col]}: plane shape ({il}, {im_}) "
                    f"incompatible with main grid ({n_l}, {n_m})")

        attrs: dict[str, Any] = {}
        for name, getter in (("unit", "unit"), ("info", "info")):
            g = getattr(main, getter, None)
            if callable(g):
                try:
                    attrs[name] = g()
                except Exception:
                    pass

        li = np.tile(np.arange(n_l, dtype=np.int32), n_m)
        mi = np.repeat(np.arange(n_m, dtype=np.int32), n_l)
        cols_order = sorted(opened)

        def plane_frames() -> Iterator["pd.DataFrame"]:
            for pol in range(n_pol):
                for chan in range(n_chan):
                    d = {"chan": np.full(n_l * n_m, chan, np.int32),
                         "pol": np.full(n_l * n_m, pol, np.int32),
                         "l_idx": li, "m_idx": mi}
                    for col in cols_order:
                        plane = _read_plane(opened[col],
                                            _canon_axes(opened[col]),
                                            chan, pol)
                        if kinds[col] == "scalar":
                            d[col] = np.full(n_l * n_m,
                                             float(plane.reshape(-1)[0]))
                        else:
                            d[col] = plane.reshape(-1)
                    yield pd.DataFrame(d)

        n_rows = 0
        first = True
        batch: list = []

        def flush(batch: list) -> None:
            nonlocal first
            if not batch:
                return
            df = spark.createDataFrame(pd.concat(batch,
                                                 ignore_index=True))
            if outfile is not None:
                (df.write.mode("overwrite" if first else "append")
                 .option("compression", "zstd").partitionBy("chan")
                 .parquet(outfile))
            else:
                collected.append(df)
            first = False

        collected: list[DataFrame] = []
        for pdf in plane_frames():
            n_rows += len(pdf)
            batch.append(pdf)
            if len(batch) >= batch_planes:
                flush(batch)
                batch = []
        flush(batch)

        info: dict[str, Any] = {
            "shape": (n_l, n_m, n_chan, n_pol),
            "columns": cols_order,
            "attrs": attrs,
            "rows": n_rows,
        }
        if outfile is not None:
            info["outfile"] = outfile
        else:
            out = collected[0]
            for d in collected[1:]:
                out = out.unionByName(d)
            info["df"] = out
        return info
    finally:
        for im in opened.values():
            done = getattr(im, "done", None) or getattr(im, "close", None)
            if callable(done):
                try:
                    done()
                except Exception:
                    pass
