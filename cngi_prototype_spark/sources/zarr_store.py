"""Minimal pure-Python zarr v2 store (read + write, directory layout).

Reference parity: the cngi_prototype native on-disk format is zarr —
every ``convert_*`` writes it and every ``read_*`` opens it
(``/root/reference/cngi/dio/read_vis.py:21-203``,
``/root/reference/cngi/_utils/_table_conversion.py:25`` uses
``numcodecs.Blosc(cname='zstd', clevel=2, shuffle=0)`` as the default
encoding). This sandbox has neither ``zarr`` nor ``numcodecs``, so this
module implements the zarr **v2 spec** (the published format:
https://zarr.readthedocs.io/en/stable/spec/v2.html) directly:

- directory store: one directory per group, one per array; JSON
  metadata files ``.zgroup`` / ``.zarray`` / ``.zattrs``; chunk files
  named ``i.j.k`` (``dimension_separator`` "." or "/");
- consolidated metadata ``.zmetadata`` (``zarr_consolidated_format``
  1), written by default and preferred on read — one metadata read per
  store open, the property the reference relies on for S3 stores
  (``read_vis.py`` ``consolidated=True`` default);
- codecs: ``null`` (raw), ``zlib``, ``gzip``, ``bz2``, ``lzma`` from
  the stdlib. Anything else (``blosc``, ``zstd``, ``lz4``) is
  delegated to ``numcodecs`` when importable — on a real cluster
  ``pip install numcodecs`` makes Blosc-zstd reference stores open
  unmodified; here a clear error names the missing codec.

Everything is plain picklable functions/metadata, so Spark executors
decode/encode chunks in parallel (sources/zarr_io.py builds the chunk
manifest and fans out).

xarray conventions (what cngi stores actually look like) live one layer
up: arrays carry an ``_ARRAY_DIMENSIONS`` attr; a dataset is a group of
same-dimensioned arrays plus 1-D coordinate arrays named after dims.
"""

from __future__ import annotations

import json
import math
import os
import re
from dataclasses import dataclass, field
from typing import Any, Iterator

import numpy as np

ZARR_FORMAT = 2
_STDLIB_CODECS = ("zlib", "gzip", "bz2", "lzma")


# --------------------------------------------------------------------------
# filesystems
#
# The reference opens vis.zarr stores directly from S3 (anon or keyed,
# /root/reference/cngi/dio/read_vis.py:70-179 via s3fs); this layer
# gives the store the same reach. Paths with a URL scheme
# ("s3://bucket/store", "gs://...", "hdfs://...") dispatch to an
# fsspec-backed filesystem; plain paths (and file://) stay on the
# direct-os hot path. The FS object rides INSIDE each ZarrArray (and
# in zarr_io task closures), so Spark executors — separate Python
# processes with no shared registry — get a working client by
# unpickling: FsspecFS pickles as (protocol, options) and rebuilds its
# client lazily per process.


class LocalFS:
    """Direct-os filesystem (default). Accepts plain paths and
    ``file://`` URLs."""

    @staticmethod
    def _p(path: str) -> str:
        return path[7:] if path.startswith("file://") else path

    def open(self, path: str, mode: str = "rb"):
        return open(self._p(path), mode)

    def exists(self, path: str) -> bool:
        return os.path.exists(self._p(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(self._p(path), exist_ok=True)

    def listdir(self, path: str) -> list[str]:
        p = self._p(path)
        return sorted(os.listdir(p)) if os.path.isdir(p) else []

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._p(path))


LOCAL = LocalFS()


class PrefixMappedFS(LocalFS):
    """Maps ``scheme://...`` URLs onto a local directory — the
    filesystem-mocked object store used by the S3 round-trip tests, and
    a ready adapter for fuse mounts (``s3fs-fuse``/``gcsfuse``:
    register the scheme against the mount point and remote stores open
    with zero code changes). Picklable, so executor tasks resolve the
    same mapping."""

    def __init__(self, scheme: str, root: str):
        self.scheme = scheme
        self.root = root

    def _p(self, path: str) -> str:
        pre = f"{self.scheme}://"
        if path.startswith(pre):
            return os.path.join(self.root, path[len(pre):])
        return path


class FsspecFS:
    """fsspec/s3fs-backed filesystem for object stores. The client is
    built lazily in each process and dropped on pickle (fsspec clients
    hold sockets/locks); ``storage_options`` carry credentials/anon
    exactly like the reference's ``read_vis(..., s3_anon=...)``."""

    def __init__(self, protocol: str, storage_options: dict | None = None):
        self.protocol = protocol
        self.storage_options = dict(storage_options or {})
        self._client = None

    def __getstate__(self):
        return {"protocol": self.protocol,
                "storage_options": self.storage_options}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._client = None

    def _c(self):
        if self._client is None:
            try:
                import fsspec
            except ImportError as e:
                raise NotImplementedError(
                    f"{self.protocol}:// stores need fsspec (plus the "
                    f"protocol package, e.g. s3fs for s3://); install "
                    f"them on driver and executors, or mount the bucket "
                    f"(s3fs-fuse/gcsfuse) and register a PrefixMappedFS"
                ) from e
            self._client = fsspec.filesystem(self.protocol,
                                             **self.storage_options)
        return self._client

    def open(self, path: str, mode: str = "rb"):
        return self._c().open(path, mode)

    def exists(self, path: str) -> bool:
        return self._c().exists(path)

    def makedirs(self, path: str) -> None:
        # object stores have no directories; best-effort for buckets
        try:
            self._c().makedirs(path, exist_ok=True)
        except Exception:
            pass

    def listdir(self, path: str) -> list[str]:
        c = self._c()
        if not c.exists(path):
            return []
        return sorted(p.rstrip("/").rsplit("/", 1)[-1]
                      for p in c.ls(path, detail=False))

    def isdir(self, path: str) -> bool:
        return self._c().isdir(path)


_FS_FACTORIES: dict[str, Any] = {}
_SCHEME_RE = re.compile(r"^([a-z0-9+.-]+)://", re.IGNORECASE)


def register_filesystem(scheme: str, fs_or_factory: Any) -> None:
    """Bind a URL scheme to a filesystem instance or a
    ``factory(path) -> fs`` callable (overrides the fsspec default —
    e.g. credentials: ``register_filesystem('s3',
    FsspecFS('s3', {'anon': True}))``, or a fuse mount via
    :class:`PrefixMappedFS`)."""
    _FS_FACTORIES[scheme] = fs_or_factory


def filesystem_for(path: str):
    """Resolve the filesystem for a store path (driver-side, once per
    store open/write; the result travels to executors by pickle)."""
    m = _SCHEME_RE.match(path)
    if not m or m.group(1).lower() == "file":
        return LOCAL
    scheme = m.group(1).lower()
    bound = _FS_FACTORIES.get(scheme)
    if bound is not None:
        return bound(path) if callable(bound) else bound
    return FsspecFS(scheme)


# --------------------------------------------------------------------------
# codecs


def _compress(buf: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    level = int(compressor.get("level", 5))
    if cid == "zlib":
        import zlib
        return zlib.compress(buf, level)
    if cid == "gzip":
        import gzip
        return gzip.compress(buf, compresslevel=level)
    if cid == "bz2":
        import bz2
        return bz2.compress(buf, level)
    if cid == "lzma":
        import lzma
        return lzma.compress(buf)
    try:  # e.g. blosc/zstd/lz4 on clusters that have numcodecs
        import numcodecs
        return bytes(numcodecs.get_codec(compressor).encode(buf))
    except ImportError:
        raise NotImplementedError(
            f"zarr codec {cid!r} needs numcodecs (stdlib codecs: "
            f"{', '.join(_STDLIB_CODECS)}, or compressor=None)")


def _decompress(buf: bytes, compressor: dict | None) -> bytes:
    if compressor is None:
        return buf
    cid = compressor.get("id")
    if cid == "zlib":
        import zlib
        return zlib.decompress(buf)
    if cid == "gzip":
        import gzip
        return gzip.decompress(buf)
    if cid == "bz2":
        import bz2
        return bz2.decompress(buf)
    if cid == "lzma":
        import lzma
        return lzma.decompress(buf)
    try:
        import numcodecs
        return bytes(numcodecs.get_codec(compressor).decode(buf))
    except ImportError:
        raise NotImplementedError(
            f"zarr codec {cid!r} needs numcodecs (this store was likely "
            "written by zarr-python with the Blosc default; re-encode "
            "with zlib or install numcodecs)")


# --------------------------------------------------------------------------
# fill values (v2 JSON encoding: NaN/Infinity as strings, complex,
# bytes as base64)


def _encode_fill(fill: Any, dtype: np.dtype) -> Any:
    if fill is None:
        return None
    if dtype.kind == "f":
        f = float(fill)
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        return f
    if dtype.kind == "c":
        c = complex(fill)
        return [_encode_fill(c.real, np.dtype("f8")),
                _encode_fill(c.imag, np.dtype("f8"))]
    if dtype.kind in "iu":
        return int(fill)
    if dtype.kind == "b":
        return bool(fill)
    if dtype.kind in "mM":
        return int(np.asarray(fill).view("i8"))
    return fill


def _decode_fill(fill: Any, dtype: np.dtype) -> Any:
    if fill is None:
        return None
    if dtype.kind == "f":
        if fill == "NaN":
            return math.nan
        if fill == "Infinity":
            return math.inf
        if fill == "-Infinity":
            return -math.inf
        return float(fill)
    if dtype.kind == "c":
        return complex(_decode_fill(fill[0], np.dtype("f8")),
                       _decode_fill(fill[1], np.dtype("f8")))
    if dtype.kind in "mM":
        return np.int64(fill).view(dtype)
    return fill


def _json_dump(path: str, obj: dict, fs: Any = LOCAL) -> None:
    with fs.open(path, "w") as f:
        json.dump(obj, f, indent=2, sort_keys=True)


def _json_load(path: str, fs: Any = LOCAL) -> dict:
    with fs.open(path, "r") as f:
        return json.load(f)


# --------------------------------------------------------------------------
# arrays


@dataclass
class ZarrArray:
    """One zarr v2 array in a directory store. Plain data + module
    functions only, so instances pickle into Spark tasks."""

    path: str
    shape: tuple[int, ...]
    chunks: tuple[int, ...]
    dtype: np.dtype
    compressor: dict | None
    fill_value: Any
    order: str = "C"
    dimension_separator: str = "."
    attrs: dict = field(default_factory=dict)
    fs: Any = field(default=None, repr=False, compare=False)

    def _fs(self):
        return self.fs if self.fs is not None else LOCAL

    # -- open / create ----------------------------------------------------

    @classmethod
    def open(cls, path: str, *, meta: dict | None = None,
             attrs: dict | None = None, fs: Any = None) -> "ZarrArray":
        """Open an existing array; ``meta``/``attrs`` may be passed from
        consolidated metadata to skip the per-array JSON reads."""
        if fs is None:
            fs = filesystem_for(path)
        if meta is None:
            meta = _json_load(os.path.join(path, ".zarray"), fs)
        if attrs is None:
            zattrs = os.path.join(path, ".zattrs")
            attrs = _json_load(zattrs, fs) if fs.exists(zattrs) else {}
        if meta.get("zarr_format") != ZARR_FORMAT:
            raise ValueError(f"not a zarr v2 array: {path}")
        if meta.get("order", "C") != "C":
            raise NotImplementedError("Fortran chunk order not supported")
        if meta.get("filters"):
            raise NotImplementedError(
                "zarr filters not supported (store was written with a "
                "filter chain; re-encode without filters)")
        dtype = np.dtype(meta["dtype"])
        return cls(
            path=path,
            shape=tuple(meta["shape"]),
            chunks=tuple(meta["chunks"]),
            dtype=dtype,
            compressor=meta.get("compressor"),
            fill_value=_decode_fill(meta.get("fill_value"), dtype),
            order=meta.get("order", "C"),
            dimension_separator=meta.get("dimension_separator", "."),
            attrs=attrs,
            fs=fs,
        )

    @classmethod
    def create(
        cls,
        path: str,
        shape: tuple[int, ...],
        chunks: tuple[int, ...],
        dtype: Any,
        *,
        compressor: dict | None = {"id": "zlib", "level": 4},
        fill_value: Any = None,
        attrs: dict | None = None,
        dimension_separator: str = ".",
        fs: Any = None,
    ) -> "ZarrArray":
        dtype = np.dtype(dtype)
        if len(chunks) != len(shape):
            raise ValueError("chunks rank != shape rank")
        if fs is None:
            fs = filesystem_for(path)
        fs.makedirs(path)
        arr = cls(path=path, shape=tuple(int(s) for s in shape),
                  chunks=tuple(int(c) for c in chunks), dtype=dtype,
                  compressor=compressor, fill_value=fill_value,
                  dimension_separator=dimension_separator,
                  attrs=dict(attrs or {}), fs=fs)
        _json_dump(os.path.join(path, ".zarray"), arr.zarray_meta(), fs)
        if arr.attrs:
            _json_dump(os.path.join(path, ".zattrs"), arr.attrs, fs)
        return arr

    def zarray_meta(self) -> dict:
        return {
            "zarr_format": ZARR_FORMAT,
            "shape": list(self.shape),
            "chunks": list(self.chunks),
            "dtype": self.dtype.str,
            "compressor": self.compressor,
            "fill_value": _encode_fill(self.fill_value, self.dtype),
            "order": "C",
            "filters": None,
            "dimension_separator": self.dimension_separator,
        }

    # -- chunk addressing -------------------------------------------------

    @property
    def cdata_shape(self) -> tuple[int, ...]:
        """Chunk-grid shape: chunks per dimension."""
        return tuple(-(-s // c) for s, c in zip(self.shape, self.chunks))

    def chunk_ids(self) -> Iterator[tuple[int, ...]]:
        return iter(np.ndindex(*self.cdata_shape))

    def _chunk_file(self, idx: tuple[int, ...]) -> str:
        key = self.dimension_separator.join(str(i) for i in idx)
        if not idx:  # 0-d array
            key = "0"
        return os.path.join(self.path, key)

    def chunk_slices(self, idx: tuple[int, ...]) -> tuple[slice, ...]:
        """Array-coordinate region this chunk covers (edge-trimmed)."""
        return tuple(slice(i * c, min((i + 1) * c, s))
                     for i, c, s in zip(idx, self.chunks, self.shape))

    # -- chunk IO ---------------------------------------------------------

    def read_chunk(self, idx: tuple[int, ...]) -> np.ndarray:
        """Full-chunk-shape array (v2 pads edge chunks to chunk shape);
        missing chunk file → fill_value."""
        f = self._chunk_file(idx)
        if not self._fs().exists(f):
            fill = self.fill_value
            if fill is None:
                fill = 0
            return np.full(self.chunks, fill, dtype=self.dtype)
        with self._fs().open(f, "rb") as fh:
            raw = _decompress(fh.read(), self.compressor)
        return np.frombuffer(raw, dtype=self.dtype).reshape(self.chunks)

    def write_chunk(self, idx: tuple[int, ...], data: np.ndarray) -> None:
        """Write one chunk; ``data`` may be the edge-trimmed region
        shape (padded with fill_value to chunk shape here)."""
        data = np.asarray(data, dtype=self.dtype)
        if data.shape != self.chunks:
            fill = self.fill_value if self.fill_value is not None else 0
            full = np.full(self.chunks, fill, dtype=self.dtype)
            full[tuple(slice(0, n) for n in data.shape)] = data
            data = full
        buf = _compress(np.ascontiguousarray(data).tobytes(),
                        self.compressor)
        with self._fs().open(self._chunk_file(idx), "wb") as fh:
            fh.write(buf)

    # -- region / full IO -------------------------------------------------

    def read_region(self, region: tuple[slice, ...]) -> np.ndarray:
        """Assemble an arbitrary (start/stop) hyper-rectangle from the
        chunks that overlap it."""
        starts = [r.start or 0 for r in region]
        stops = [r.stop if r.stop is not None else s
                 for r, s in zip(region, self.shape)]
        out = np.empty([b - a for a, b in zip(starts, stops)],
                       dtype=self.dtype)
        first = [a // c for a, c in zip(starts, self.chunks)]
        last = [(b - 1) // c if b > a else a // c
                for a, b, c in zip(starts, stops, self.chunks)]
        for idx in np.ndindex(*[hi - lo + 1 for lo, hi in zip(first, last)]):
            cid = tuple(lo + i for lo, i in zip(first, idx))
            chunk = self.read_chunk(cid)
            src, dst = [], []
            for d, (ci, a, b, c) in enumerate(
                    zip(cid, starts, stops, self.chunks)):
                c0 = ci * c
                lo = max(a, c0)
                hi = min(b, c0 + c)
                src.append(slice(lo - c0, hi - c0))
                dst.append(slice(lo - a, hi - a))
            out[tuple(dst)] = chunk[tuple(src)]
        return out

    def read_full(self) -> np.ndarray:
        return self.read_region(tuple(slice(0, s) for s in self.shape))

    def write_full(self, data: np.ndarray) -> None:
        data = np.asarray(data, dtype=self.dtype)
        if data.shape != self.shape:
            raise ValueError(f"shape {data.shape} != array {self.shape}")
        for idx in self.chunk_ids():
            self.write_chunk(idx, data[self.chunk_slices(idx)])


# --------------------------------------------------------------------------
# groups + consolidated metadata


def create_group(path: str, attrs: dict | None = None,
                 fs: Any = None) -> None:
    fs = filesystem_for(path) if fs is None else fs
    fs.makedirs(path)
    _json_dump(os.path.join(path, ".zgroup"), {"zarr_format": ZARR_FORMAT},
               fs)
    if attrs:
        _json_dump(os.path.join(path, ".zattrs"), attrs, fs)


def group_attrs(path: str, fs: Any = None) -> dict:
    fs = filesystem_for(path) if fs is None else fs
    zattrs = os.path.join(path, ".zattrs")
    return _json_load(zattrs, fs) if fs.exists(zattrs) else {}


def is_array(path: str, fs: Any = None) -> bool:
    fs = filesystem_for(path) if fs is None else fs
    return fs.exists(os.path.join(path, ".zarray"))


def is_group(path: str, fs: Any = None) -> bool:
    fs = filesystem_for(path) if fs is None else fs
    return fs.exists(os.path.join(path, ".zgroup"))


def list_children(path: str, fs: Any = None) -> list[str]:
    """Immediate child array/group names, sorted."""
    fs = filesystem_for(path) if fs is None else fs
    out = []
    if not fs.isdir(path):
        return out
    for name in fs.listdir(path):
        sub = os.path.join(path, name)
        if is_array(sub, fs) or is_group(sub, fs):
            out.append(name)
    return out


def consolidate_metadata(root: str, fs: Any = None) -> dict:
    """Walk the store and write ``.zmetadata`` (v2 consolidated format:
    every .zgroup/.zarray/.zattrs keyed by relative path). One metadata
    read per store open afterwards — the S3/object-store essential."""
    fs = filesystem_for(root) if fs is None else fs
    metadata: dict[str, Any] = {}

    def walk(path: str, prefix: str) -> None:
        for fname in (".zgroup", ".zarray", ".zattrs"):
            f = os.path.join(path, fname)
            if fs.exists(f):
                metadata[prefix + fname] = _json_load(f, fs)
        if is_array(path, fs):
            return
        for name in fs.listdir(path):
            sub = os.path.join(path, name)
            if fs.isdir(sub):
                walk(sub, f"{prefix}{name}/")

    walk(root, "")
    doc = {"zarr_consolidated_format": 1, "metadata": metadata}
    _json_dump(os.path.join(root, ".zmetadata"), doc, fs)
    return doc


def read_consolidated(root: str, fs: Any = None) -> dict | None:
    fs = filesystem_for(root) if fs is None else fs
    f = os.path.join(root, ".zmetadata")
    if not fs.exists(f):
        return None
    doc = _json_load(f, fs)
    if doc.get("zarr_consolidated_format") != 1:
        return None
    return doc["metadata"]


def open_array(root: str, name: str,
               consolidated: dict | None = None,
               fs: Any = None) -> ZarrArray:
    """Open ``root/name`` (name may be nested "grp/arr"); consolidated
    metadata (from :func:`read_consolidated`) skips the JSON reads."""
    fs = filesystem_for(root) if fs is None else fs
    path = os.path.join(root, name) if name else root
    if consolidated is not None:
        key = f"{name}/" if name else ""
        meta = consolidated.get(key + ".zarray")
        if meta is None:
            raise KeyError(f"no array {name!r} in consolidated metadata")
        return ZarrArray.open(path, meta=meta,
                              attrs=consolidated.get(key + ".zattrs", {}),
                              fs=fs)
    return ZarrArray.open(path, fs=fs)
