"""CASA image-table adapter against a fake casacore.images backend.

The sandbox has no casacore; what can go wrong in the adapter — axis
canonicalization (casacore images store ``(chan, pol, m, l)``-ish
orders that vary), plane slicing via blc/trc, artifact-set assembly,
Taylor terms, sumwt broadcast — is exercised here by injecting a fake
``casacore.images`` module serving deterministic numpy arrays with the
real API's conventions (``shape()``, ``coordinates().get_axes()``,
``getdata(blc, trc)``, ``unit()``, ``info()``)."""

import os
import sys
import types

import numpy as np
import pytest

N_L, N_M, N_CHAN, N_POL = 5, 4, 3, 2


class FakeCoordSys:
    def __init__(self, axes_groups):
        self._axes = axes_groups

    def get_axes(self):
        return self._axes


class FakeImage:
    """Axis order (chan, pol, m, l) — the common casacore layout —
    unless constructed with another ``axes_groups``."""

    def __init__(self, data, axes_groups):
        self._d = np.asarray(data, dtype=np.float64)
        self._axes = axes_groups
        self.closed = False

    def shape(self):
        return list(self._d.shape)

    def coordinates(self):
        return FakeCoordSys(self._axes)

    def getdata(self, blc=None, trc=None):
        if blc is None:
            return self._d
        sl = tuple(slice(b, t + 1) for b, t in zip(blc, trc))
        return self._d[sl]

    def unit(self):
        return "Jy/beam"

    def info(self):
        return {"imageinfo": {"restoringbeam": {
            "major": {"value": 2.0, "unit": "arcsec"},
            "minor": {"value": 1.0, "unit": "arcsec"},
            "positionangle": {"value": 10.0, "unit": "deg"}}}}

    def done(self):
        self.closed = True


AXES_CPML = [["Frequency"], ["Stokes"], ["Declination", "Right Ascension"]]


def _cube(rng):
    return rng.normal(size=(N_CHAN, N_POL, N_M, N_L))


@pytest.fixture
def fake_images(monkeypatch, tmp_path):
    rng = np.random.default_rng(5)
    files = {}

    def add(name, data, axes=AXES_CPML):
        p = str(tmp_path / name)
        os.makedirs(p, exist_ok=True)  # casa image tables are dirs
        files[p] = (data, axes)
        return p

    main = add("t.image", _cube(rng))
    add("t.psf", _cube(rng))
    # sumwt: (chan, pol, 1, 1)
    add("t.sumwt", rng.normal(size=(N_CHAN, N_POL, 1, 1)))
    # taylor-term residuals
    add("t.residual.tt0", _cube(rng))
    add("t.residual.tt1", _cube(rng))

    imod = types.ModuleType("casacore.images")
    imod.image = lambda path: FakeImage(*files[os.path.normpath(path)])
    mod = types.ModuleType("casacore")
    mod.images = imod
    monkeypatch.setitem(sys.modules, "casacore", mod)
    monkeypatch.setitem(sys.modules, "casacore.images", imod)
    return main, files


def test_convert_casa_image_artifact_set(spark, fake_images):
    from cngi_prototype_spark.sources.casa_image_adapter import (
        convert_casa_image)
    main, files = fake_images
    info = convert_casa_image(spark, main, artifacts=None)
    assert info["shape"] == (N_L, N_M, N_CHAN, N_POL)
    # tt0 is the base column, like the FITS artifact path
    assert info["columns"] == ["image", "psf", "residual",
                               "residual_tt1", "sumwt"]
    assert info["rows"] == N_L * N_M * N_CHAN * N_POL
    assert info["attrs"]["unit"] == "Jy/beam"
    pdf = info["df"].toPandas()
    assert len(pdf) == info["rows"]
    # value parity per cell against the source cubes, all artifacts
    cube_img = files[main][0]
    cube_sw = files[main.replace(".image", ".sumwt")][0]
    for r in pdf.sample(n=64, random_state=0).itertuples():
        assert r.image == cube_img[r.chan, r.pol, r.m_idx, r.l_idx]
        assert r.sumwt == cube_sw[r.chan, r.pol, 0, 0]
    # taylor terms are distinct columns with the right values
    c0 = files[main.replace(".image", ".residual.tt0")][0]
    r0 = pdf.iloc[0]
    assert r0.residual == c0[int(r0.chan), int(r0.pol),
                             int(r0.m_idx), int(r0.l_idx)]


def test_convert_casa_image_axis_orders(spark, fake_images, tmp_path,
                                        monkeypatch):
    """(m, l, chan, pol) and (l, m)-transposed layouts canonicalize to
    the same long form as the (chan, pol, m, l) default."""
    from cngi_prototype_spark.sources.casa_image_adapter import (
        convert_casa_image)
    rng = np.random.default_rng(9)
    cube = rng.normal(size=(N_CHAN, N_POL, N_M, N_L))

    files = {}

    def add(name, data, axes):
        p = str(tmp_path / "alt" / name)
        os.makedirs(p, exist_ok=True)
        files[os.path.normpath(p)] = (data, axes)
        return p

    # same logical cube stored (m, l, chan, pol)
    p1 = add("a.image", cube.transpose(2, 3, 0, 1),
             [["Declination", "Right Ascension"], ["Frequency"],
              ["Stokes"]])
    # and stored (l, m, chan, pol) — RA before Dec
    add("b.image", cube.transpose(3, 2, 0, 1),
        [["Right Ascension", "Declination"], ["Frequency"], ["Stokes"]])

    import casacore.images as imod
    monkeypatch.setattr(
        imod, "image",
        lambda path: FakeImage(*files[os.path.normpath(path)]))

    for name in ("a.image", "b.image"):
        info = convert_casa_image(spark, str(tmp_path / "alt" / name),
                                  artifacts=[name.split(".")[1]])
        pdf = info["df"].toPandas()
        assert info["shape"] == (N_L, N_M, N_CHAN, N_POL)
        for r in pdf.sample(n=32, random_state=1).itertuples():
            assert r.image == cube[r.chan, r.pol, r.m_idx, r.l_idx], name


def test_convert_casa_image_to_store(spark, fake_images, tmp_path):
    from cngi_prototype_spark.sources.casa_image_adapter import (
        convert_casa_image)
    from cngi_prototype_spark.sources.image_io import (
        describe_image, read_image)
    main, files = fake_images
    out = str(tmp_path / "img.store")
    info = convert_casa_image(spark, main, out, batch_planes=2)
    assert info["outfile"] == out
    back = read_image(spark, out)
    assert back.count() == info["rows"]
    assert describe_image(spark, out).count() == N_CHAN
    # chan partition pruning survives the store round-trip
    assert read_image(spark, out, chans=[1]).count() == \
        N_L * N_M * N_POL


def test_convert_casa_image_shape_mismatch_raises(spark, fake_images,
                                                  monkeypatch):
    from cngi_prototype_spark.sources import casa_image_adapter as cia
    main, files = fake_images
    bad = np.zeros((N_CHAN, N_POL, N_M + 1, N_L))
    files[main.replace(".image", ".psf")] = (bad, AXES_CPML)
    with pytest.raises(ValueError, match="incompatible with main grid"):
        cia.convert_casa_image(spark, main, artifacts=["image", "psf"])


def test_missing_casacore_names_dependency(monkeypatch):
    from cngi_prototype_spark.sources import casa_image_adapter as cia
    for m in ("casacore", "casacore.images"):
        monkeypatch.setitem(sys.modules, m, None)
    with pytest.raises(ImportError, match="python-casacore"):
        cia._images()
