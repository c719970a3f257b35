"""MS ingestion adapter against a fake casacore backend.

The sandbox has no casacore; the adapter's conversion logic (chunked
getcol → chan/pol unroll → long form → baseline assignment → store) is
what can go wrong, and it is fully exercised here by injecting a fake
``casacore.tables`` that serves deterministic numpy arrays with the
real MS column shapes/conventions (DATA (row, chan, pol) complex,
WEIGHT (row, pol), TIME in MJD seconds, subtables as ``Table:``
keywords)."""

import sys
import types

import numpy as np
import pytest

from cngi_prototype_spark.sources.ingest import MJD_UNIX_OFFSET_S

NROW, NCHAN, NPOL = 7, 3, 2


class FakeTable:
    def __init__(self, cols, keywords=None):
        self._cols = cols
        self._kw = keywords or {}

    def nrows(self):
        return len(next(iter(self._cols.values())))

    def getcol(self, name, startrow=0, nrow=None):
        col = self._cols[name]
        if nrow is None:
            nrow = len(col) - startrow
        return np.asarray(col[startrow:startrow + nrow])

    def colnames(self):
        return list(self._cols)

    def keywordnames(self):
        return list(self._kw)

    def getkeyword(self, k):
        return self._kw[k]

    def close(self):
        pass


def _main_cols(rng):
    t = np.repeat(np.arange(4), 2)[:NROW]  # a few distinct times
    a1 = np.array([0, 0, 1, 0, 0, 1, 2])
    a2 = np.array([1, 2, 2, 1, 2, 2, 2])
    data = (rng.normal(size=(NROW, NCHAN, NPOL))
            + 1j * rng.normal(size=(NROW, NCHAN, NPOL)))
    return {
        "DATA_DESC_ID": np.array([0, 0, 0, 1, 1, 1, 1]),
        "TIME": MJD_UNIX_OFFSET_S + 1_600_000_000.0 + t * 10.0,
        "ANTENNA1": a1, "ANTENNA2": a2,
        "DATA": data,
        "FLAG": rng.random((NROW, NCHAN, NPOL)) > 0.8,
        "WEIGHT": 1.0 + rng.random((NROW, NPOL)),
        "SCAN_NUMBER": np.arange(NROW) % 3,
        "STATE_ID": np.zeros(NROW, int),
        "FIELD_ID": np.ones(NROW, int),
        "UVW": rng.normal(size=(NROW, 3)),
    }


@pytest.fixture
def fake_casacore(monkeypatch):
    rng = np.random.default_rng(21)
    cols = _main_cols(rng)
    ant = FakeTable({"NAME": np.array(["a0", "a1", "a2"]),
                     "POSITION": rng.normal(size=(3, 3))})
    main = FakeTable(cols, keywords={
        "ANTENNA": "Table: /fake/ms/ANTENNA",
        "MS_VERSION": 2.0,
    })

    def taql(q, tables=None):
        ddi = int(q.rsplit("=", 1)[1])
        mask = cols["DATA_DESC_ID"] == ddi
        return FakeTable({k: np.asarray(v)[mask]
                          for k, v in cols.items()})

    mod = types.ModuleType("casacore")
    tmod = types.ModuleType("casacore.tables")

    def table(path, ack=False):
        return ant if path.endswith("ANTENNA") else main

    tmod.table = table
    tmod.taql = taql
    mod.tables = tmod
    monkeypatch.setitem(sys.modules, "casacore", mod)
    monkeypatch.setitem(sys.modules, "casacore.tables", tmod)
    return cols


def test_convert_ms_long_form(spark, tmp_path, fake_casacore):
    from cngi_prototype_spark.operators.data_groups import (
        read_data_groups)
    from cngi_prototype_spark.sources.ms_adapter import convert_ms

    out = str(tmp_path / "vis.store")
    info = convert_ms(spark, "/fake/ms", out, chunk_rows=2)
    assert info["ddis"] == [0, 1]
    assert info["rows"] == {0: 3 * NCHAN * NPOL, 1: 4 * NCHAN * NPOL}
    assert info["subtables"] == ["antenna"]

    df = spark.read.parquet(out)
    cols = fake_casacore
    # spot-check one cell end-to-end: MS row 2 (ddi 0), chan 1, pol 1
    row = df.filter("ddi = 0 AND ant1 = 1 AND ant2 = 2 AND chan = 1 "
                    "AND pol = 1").collect()
    assert len(row) == 1
    r = row[0]
    assert r["data_re"] == pytest.approx(cols["DATA"][2, 1, 1].real)
    assert r["data_im"] == pytest.approx(cols["DATA"][2, 1, 1].imag)
    # weight broadcasts along chan from (row, pol)
    assert r["data_weight"] == pytest.approx(cols["WEIGHT"][2, 1])
    assert r["flag"] == bool(cols["FLAG"][2, 1, 1])
    # MJD -> unix epoch seconds
    assert r["time"] == pytest.approx(1_600_000_000.0 + 10.0)
    # dense baseline ids from distinct (ant1, ant2), ordered
    bl = {(x["ant1"], x["ant2"]): x["baseline"]
          for x in df.select("ant1", "ant2", "baseline")
          .distinct().collect()}
    assert bl == {(0, 1): 0, (0, 2): 1, (1, 2): 2, (2, 2): 3}
    # data_groups sidecar written
    assert "0" in read_data_groups(out)

    sub = spark.read.parquet(out + "__subtables/antenna.parquet")
    assert sub.count() == 3 and "position" in sub.columns


def test_convert_ms_without_casacore_raises(spark, tmp_path):
    from cngi_prototype_spark.sources.ms_adapter import convert_ms
    with pytest.raises(ImportError, match="python-casacore"):
        convert_ms(spark, "/none/ms", str(tmp_path / "x"))


def test_out_of_sandbox_recipe_references_current_surfaces():
    """tools/verify_ms_adapter.py is the only real-casacore evidence
    path (the sandbox has no python-casacore), so it must never go
    stale: every cngi_prototype_spark import inside it has to resolve
    against the current package."""
    import ast
    import importlib
    import os

    recipe = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "verify_ms_adapter.py")
    tree = ast.parse(open(recipe).read())
    stale = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.ImportFrom) and node.module
                and node.module.startswith("cngi_prototype_spark")):
            mod = importlib.import_module(node.module)
            stale += [f"{node.module}.{a.name}" for a in node.names
                      if not hasattr(mod, a.name)]
    assert not stale, f"recipe references stale names: {stale}"


def test_out_of_sandbox_recipe_call_signatures_current():
    """Deeper pin than name existence (round 11): every CALL the recipe
    makes to an imported cngi_prototype_spark function must bind
    against the function's CURRENT signature — a renamed kwarg or a
    tightened positional list in the adapters (ms_adapter,
    casa_image_adapter — both the --ms and --image modes) breaks this
    test in-sandbox instead of breaking the recipe out of it."""
    import ast
    import importlib
    import inspect
    import os

    recipe = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "verify_ms_adapter.py")
    tree = ast.parse(open(recipe).read())
    funcs = {}
    for node in ast.walk(tree):
        if (isinstance(node, ast.ImportFrom) and node.module
                and node.module.startswith("cngi_prototype_spark")):
            mod = importlib.import_module(node.module)
            for a in node.names:
                obj = getattr(mod, a.name, None)
                if callable(obj):
                    funcs[a.asname or a.name] = obj
    assert funcs, "recipe imports no cngi callables — pin is vacuous"
    checked, bad = 0, []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                and node.func.id in funcs):
            fn = funcs[node.func.id]
            try:
                sig = inspect.signature(fn)
            except (TypeError, ValueError):
                continue
            args = [None] * sum(isinstance(a, ast.Starred) is False
                                for a in node.args)
            kwargs = {k.arg: None for k in node.keywords
                      if k.arg is not None}
            try:
                sig.bind_partial(*args, **kwargs)
                checked += 1
            except TypeError as e:
                bad.append(f"{node.func.id} line {node.lineno}: {e}")
    assert checked >= 2, "expected calls to both adapter surfaces"
    assert not bad, f"recipe calls no longer bind: {bad}"
