"""Visibility degridding + model-vis prediction (beyond-reference).

The reference only implements the 1-tap imaging-weight degrid
(``_standard_grid.py:443-518``; see weights.py) and leaves visibility
degridding / ``predict_modelvis_image`` as stubs
(``predict_modelvis_image.py:20-40``; SG:433 "still needs to be
implemented"). This module completes the major-cycle loop Spark-first:

- :func:`degrid_visibilities` — the adjoint of the explode-taps gridder:
  each visibility reads back ``Σ_taps conv·G[cell] / Σ_taps conv`` via a
  tap explosion + equi-join against the sparse grid + one per-row
  aggregation. Shuffle = taps × rows joined against grid cells on the
  cell key (broadcast when the grid is small); no UDF.
- :func:`predict_modelvis_image` — model image planes → forward FFT
  (exact inverse of ``image_from_grid``'s normalization) → degrid at the
  given uv samples. CLEAN model images are sparse, so the plane UDF
  emits only nonzero grid cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cngi_prototype_spark.imaging.grid import (
    GridParms,
    _cgk_at,
    _flit_arr,
    _scaled_pos,
    _tap_explode,
    _tap_iu_iv,
)
from cngi_prototype_spark.imaging.kernels import pswf

_BROADCAST_CELLS = 4_000_000


def degrid_visibilities(
    vis_df: DataFrame,
    grid_df: DataFrame,
    gp: GridParms,
    *,
    row_id: str = "row_id",
    u: str = "u",
    v: str = "v",
    freq: str = "freq",
    chan: str = "chan",
    pol: str = "pol",
    out: tuple[str, str] = ("model_re", "model_im"),
    precise: bool = False,
    variant: str = "kernel",
    slab_w: int = 64,
    salt_probe: bool = True,
) -> DataFrame:
    """Append interpolated model visibilities read from a sparse uv grid.

    Out-of-bounds samples (or empty kernel footprints) yield NULL model
    columns, mirroring the gridder's bounds skip. ``precise`` switches
    the per-row tap sums to the 1e-9-quantized BIGINT form (see
    grid.py) so the DuckDB twin hash-matches — that form is defined on
    the explode path only, so ``precise=True`` forces
    ``variant="explode"``.

    ``variant="kernel"`` (the DEFAULT — it is the path you'd run at
    100×, measured ~1.9× faster with the hot-slab valve handling the
    skew the explode join cannot) is the dense-slab production path
    (the gridder's Arrow-kernel twin run in the adjoint direction):
    vis rows and the grid cells they read cogroup per (chan, pol,
    u-slab), the slab densifies once, and every row's support² taps
    gather in one vectorized LUT pass — no taps×rows explosion, no
    cell equi-join. Values match the explode path to float addition
    order (parity-tested); the explode path remains the oracle form.
    """
    if precise:
        variant = "explode"
    if variant == "kernel":
        return _degrid_kernel(vis_df, grid_df, gp, row_id=row_id, u=u,
                              v=v, freq=freq, chan=chan, pol=pol,
                              out=out, slab_w=slab_w,
                              salt_probe=salt_probe)
    u_pos, v_pos = _scaled_pos(gp, F.col(u), F.col(v), F.col(freq))
    geom = (vis_df
            .withColumn("_u_c", F.floor(u_pos + F.lit(0.5)).cast("int"))
            .withColumn("_v_c", F.floor(v_pos + F.lit(0.5)).cast("int"))
            .withColumn("_du", F.floor((F.col("_u_c") - u_pos) * F.lit(float(gp.oversampling)) + F.lit(0.5)).cast("int"))
            .withColumn("_dv", F.floor((F.col("_v_c") - v_pos) * F.lit(float(gp.oversampling)) + F.lit(0.5)).cast("int")))
    half = gp.half
    in_bounds = ((F.col("_u_c") + half < gp.n_u) & (F.col("_u_c") - half >= 0)
                 & (F.col("_v_c") + half < gp.n_v) & (F.col("_v_c") - half >= 0))
    geom = geom.withColumn("_ok", in_bounds)

    # kernel LUT + tap indices built driver-cheap (r15): one expr-string
    # array literal and one exploded sequence instead of ~900 py4j
    # round trips per build — see grid.py _flit_arr/_tap_explode
    cgk_lit = _flit_arr(gp.kernel_1d())
    sup, lo = gp.support, -gp.half
    tiu, tiv = _tap_iu_iv(sup, lo)
    sel = [row_id, chan, pol, "_u_c", "_v_c", "_du", "_dv"]
    e = (geom.filter("_ok")
         .select(*sel, _tap_explode(sup, lo))
         .select(*sel, tiu.alias("_tiu"), tiv.alias("_tiv")))
    conv = (_cgk_at(cgk_lit, gp.oversampling, 0, F.col("_tiu") * gp.oversampling + F.col("_du"))
            * _cgk_at(cgk_lit, gp.oversampling, 0, F.col("_tiv") * gp.oversampling + F.col("_dv")))
    e = e.select(row_id, chan, pol,
                 (F.col("_u_c") + F.col("_tiu")).alias("u_idx"),
                 (F.col("_v_c") + F.col("_tiv")).alias("v_idx"),
                 conv.alias("_conv"))

    g = grid_df
    if gp.n_u * gp.n_v <= _BROADCAST_CELLS:
        g = F.broadcast(g)
    joined = e.join(g, on=[chan, pol, "u_idx", "v_idx"], how="left")

    def agg(c: Column) -> Column:
        if not precise:
            return F.sum(c)
        return F.sum(F.floor(c * F.lit(1.0e9)).cast("long")) / F.lit(1.0e9)

    sums = joined.groupBy(row_id).agg(
        agg(F.col("_conv") * F.coalesce(F.col("grid_re"), F.lit(0.0))).alias("_sre"),
        agg(F.col("_conv") * F.coalesce(F.col("grid_im"), F.lit(0.0))).alias("_sim"),
        agg(F.col("_conv")).alias("_norm"))
    model_re = F.when(F.col("_norm") > 0, F.col("_sre") / F.col("_norm"))
    model_im = F.when(F.col("_norm") > 0, F.col("_sim") / F.col("_norm"))
    keyed = sums.select(row_id, model_re.alias(out[0]), model_im.alias(out[1]))
    # `keyed` has one row PER VISIBILITY (grouped by row_id) — it scales
    # with the fact table, so it must NEVER be broadcast (a hint here
    # OOMs the driver at real row counts). Both sides hash-partition on
    # row_id; Spark plans a shuffle join and AQE may still localize it
    # at runtime when the *actual* size is small, which is the only safe
    # place for that decision.
    return geom.drop("_u_c", "_v_c", "_du", "_dv", "_ok").join(
        keyed, on=row_id, how="left")


def _degrid_kernel(
    vis_df: DataFrame,
    grid_df: DataFrame,
    gp: GridParms,
    *,
    row_id: str,
    u: str,
    v: str,
    freq: str,
    chan: str,
    pol: str,
    out: tuple[str, str],
    slab_w: int,
    salt_probe: bool = False,
) -> DataFrame:
    """Dense-slab degrid (see :func:`degrid_visibilities`
    ``variant="kernel"``).

    Scale shape: one cogroup shuffle keyed by (chan, pol, u-slab).
    The vis side partitions exactly (each row reads one slab ± the
    half-kernel halo, which the GRID side replicates into adjacent
    slabs — ≤ 1+⌈2·half/slab_w⌉ copies per cell, the halo-exchange
    pattern); task memory is one (slab_w+2·half, n_v) complex slab
    plus a bounded row chunk. Parallelism = planes × n_u/slab_w
    groups, the same knob the gridder's fat-row path uses.

    ``salt_probe=True`` adds the hot-slab valve (the gridder's
    ``salt_probe``, mirrored): centrally-condensed uv coverage piles
    most rows into the central slabs, and a cogroup group is both one
    task's serial unit AND one ``applyInPandas`` in-memory frame —
    unvalved, one hot slab is an unbounded straggler. One counting
    pass probes per-(chan, pol, slab) vis counts; groups past a core's
    fair share (or past the ~64 MB frame budget) sub-bucket by a row
    hash, with the GRID side replicated once per sub-bucket — grid
    replication is cheap because a slab holds at most
    (slab_w + 2·half) · n_v cells regardless of vis count.

    The payload rides THROUGH the cogroup (r14): the slab kernel
    receives every vis column and emits them back next to the model
    columns, and out-of-bounds rows bypass the cogroup via a
    shuffle-free union with NULL models. The corpus is therefore
    SHUFFLED once (the cogroup exchange); the remaining scans are
    cheap column-pruned re-reads (the out-of-bounds union branch
    re-reads the vis source). The old shape re-scanned the vis side
    and sort-merge-joined the model columns back on ``row_id`` — two
    more corpus-sized exchanges + sorts that only existed to re-attach
    two doubles. Per-row model values are unchanged (same gather, same
    NULL rules); the only semantic difference is under DUPLICATE
    ``row_id`` values, where the old join multiplied rows and this
    form stays strictly one-output-row-per-input-row (the documented
    contract).

    The cogroup runs ``applyInArrow`` (r15; was ``applyInPandas``):
    payload columns cross the boundary as raw Arrow arrays and are
    sliced back into the result untouched — the pandas round-trip
    coerced a nullable integer column to float64 (NULL forces the
    dtype), silently corrupting int64 payloads past 2^53. Only the
    four geometry columns are ever materialized to numpy; every other
    column is type-preserving end to end (nullable ints, timestamps,
    decimals, nested types included).
    """
    W = int(slab_w)
    half, support, ov = gp.half, gp.support, gp.oversampling
    n_v = gp.n_v
    cgk = gp.kernel_1d()
    ius = np.arange(-half, support - half)
    didx = np.arange(256)
    raw = np.abs(ov * ius[None, :] + (didx[:, None] - 128))
    lut = np.where(raw < len(cgk), cgk[np.minimum(raw, len(cgk) - 1)],
                   0.0)

    u_pos, v_pos = _scaled_pos(gp, F.col(u), F.col(v), F.col(freq))
    geom = (vis_df
            .withColumn("_u_c", F.floor(u_pos + F.lit(0.5)).cast("int"))
            .withColumn("_v_c", F.floor(v_pos + F.lit(0.5)).cast("int"))
            .withColumn("_du", F.floor(
                (F.col("_u_c") - u_pos) * F.lit(float(ov))
                + F.lit(0.5)).cast("int"))
            .withColumn("_dv", F.floor(
                (F.col("_v_c") - v_pos) * F.lit(float(ov))
                + F.lit(0.5)).cast("int")))
    in_bounds = ((F.col("_u_c") + half < gp.n_u)
                 & (F.col("_u_c") - half >= 0)
                 & (F.col("_v_c") + half < gp.n_v)
                 & (F.col("_v_c") - half >= 0))
    geom = geom.withColumn("_ok", in_bounds)

    vis_cols = list(vis_df.columns)
    vsel = (geom.filter("_ok").drop("_ok")
            .withColumn("_s", (F.col("_u_c") / W).cast("int")))
    gsel = (grid_df
            .select(chan, pol, "u_idx", "v_idx", "grid_re", "grid_im",
                    F.explode(F.sequence(
                        F.floor((F.col("u_idx") - half) / W).cast("int"),
                        F.floor((F.col("u_idx") + half) / W).cast("int")))
                    .alias("_s"))
            .filter(F.col("_s") >= 0))

    schema = T.StructType(
        [vis_df.schema[c] for c in vis_cols]
        + [T.StructField(out[0], T.DoubleType()),
           T.StructField(out[1], T.DoubleType())])

    def _np(col, dtype):
        # ChunkedArray -> numpy; the geometry columns are non-null by
        # construction (in-bounds filter), so this never sees a mask
        return col.to_numpy(zero_copy_only=False).astype(dtype,
                                                         copy=False)

    def slab_fn(key: tuple, vtab, gtab):
        import pyarrow as pa

        f64 = pa.float64()
        if not vtab.num_rows:
            res = vtab.select(vis_cols)
            return (res.append_column(out[0], pa.array([], type=f64))
                    .append_column(out[1], pa.array([], type=f64)))
        s = key[2].as_py() if hasattr(key[2], "as_py") else int(key[2])
        base = int(s) * W - half
        h = W + 2 * half
        plane = np.zeros((h, n_v), np.complex128)
        if gtab.num_rows:
            ui = _np(gtab.column("u_idx"), np.int64) - base
            keep = (ui >= 0) & (ui < h)
            plane[ui[keep],
                  _np(gtab.column("v_idx"), np.int64)[keep]] = (
                _np(gtab.column("grid_re"), np.float64)[keep]
                + 1j * _np(gtab.column("grid_im"), np.float64)[keep])
        uc = _np(vtab.column("_u_c"), np.int64)
        vc = _np(vtab.column("_v_c"), np.int64)
        fu = lut[_np(vtab.column("_du"), np.int64) + 128]  # (n, support)
        fv = lut[_np(vtab.column("_dv"), np.int64) + 128]
        n = len(uc)
        acc = np.empty(n, np.complex128)
        norm = np.empty(n, np.float64)
        B = 32768  # bounds the (B, support, support) gather temporaries
        for a in range(0, n, B):
            b = min(n, a + B)
            U = (uc[a:b, None] - base) + ius[None, :]
            V = vc[a:b, None] + ius[None, :]
            G = plane[U[:, :, None], V[:, None, :]]
            Wt = fu[a:b][:, :, None] * fv[a:b][:, None, :]
            norm[a:b] = Wt.sum((1, 2))
            acc[a:b] = (Wt * G).sum((1, 2))
        with np.errstate(invalid="ignore"):
            model = np.where(norm > 0, acc / np.where(norm > 0, norm, 1),
                             np.nan + 0j)
        bad = norm <= 0  # NULL, not NaN — the explode-path convention
        res = vtab.select(vis_cols)
        return (res.append_column(
                    out[0], pa.array(model.real, type=f64, mask=bad))
                .append_column(
                    out[1], pa.array(model.imag, type=f64, mask=bad)))

    keys = [chan, pol, "_s"]
    if salt_probe:
        spark = vis_df.sparkSession
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
        cnts = [((int(r[chan]), int(r[pol]), int(r["_s"])), int(r["count"]))
                for r in vsel.groupBy(chan, pol, "_s").count().collect()]
        # the cogroup frame carries the payload columns too, so the
        # ~64 MB byte budget must use the actual row width — estimated
        # per field TYPE (variable-width string/binary columns are
        # charged 48 B, not the 8 B a fixed per-column constant assumed,
        # so a fat text payload can't silently blow the frame budget)
        hot = _slab_salt_map(
            cnts, npart,
            cap_rows=(64 << 20) // max(56, _est_row_bytes(vsel.schema)))
        if hot:
            hot_df = spark.createDataFrame(
                [(c, p, s, n) for (c, p, s), n in hot.items()],
                schema=f"{chan} int, {pol} int, _s int, _hsub int")
            # vis: rows of a hot group spread over _hsub sub-buckets by
            # a row-id hash; cold groups skip the hash (lazy branch).
            # Broadcast join, never an inline CASE chain (grid.py's
            # codegen-cliff finding).
            vsel = (vsel.join(F.broadcast(hot_df), on=keys, how="left")
                    .withColumn("_sub", F.when(
                        F.col("_hsub").isNotNull(),
                        F.pmod(F.xxhash64(row_id), F.col("_hsub"))
                        .cast("int")).otherwise(F.lit(0)))
                    .drop("_hsub"))
            # grid: one slab copy per sub-bucket (halo-bounded, cheap)
            gsel = (gsel.join(F.broadcast(hot_df), on=keys, how="left")
                    .withColumn("_sub", F.explode(F.sequence(
                        F.lit(0),
                        F.coalesce(F.col("_hsub"), F.lit(1)) - 1)))
                    .drop("_hsub"))
            keys = keys + ["_sub"]
    keyed = (vsel.groupBy(*keys)
             .cogroup(gsel.groupBy(*keys))
             .applyInArrow(slab_fn, schema))
    # out-of-bounds rows (incl. NULL geometry) never reach the cogroup;
    # they rejoin the result through a shuffle-free union with NULL
    # models — the left-join NULL semantics of the old shape, without
    # the row_id re-shuffle of the whole payload
    oob = (geom.filter(F.col("_ok").isNull() | ~F.col("_ok"))
           .select(*vis_cols)
           .withColumn(out[0], F.lit(None).cast("double"))
           .withColumn(out[1], F.lit(None).cast("double")))
    return keyed.unionByName(oob)


def _est_row_bytes(schema: T.StructType) -> int:
    """Conservative in-memory row-width estimate for the cogroup frame
    budget: fixed-width types at their natural width, variable-width
    (string/binary) charged 48 B each, anything exotic (nested/decimal)
    32 B — errs HIGH so the ~64 MB frame cap errs toward more
    sub-buckets, never an oversized in-memory frame."""
    width = 8  # frame/offset overhead per row
    fixed = {"double": 8, "long": 8, "timestamp": 8, "integer": 4,
             "float": 4, "date": 4, "short": 2, "byte": 1, "boolean": 1}
    for f in schema.fields:
        t = f.dataType.typeName()
        width += fixed.get(t, 48 if t in ("string", "binary") else 32)
    return width


def _slab_salt_map(cnts: list[tuple[tuple, int]], npart: int,
                   cap_rows: int = (64 << 20) // 56,
                   ) -> dict[tuple, int]:
    """Sub-bucket factors for hot degrid slabs, from probed per-group
    vis counts. A group splits when it exceeds a core's fair share
    (wall-clock: the stage runs at ~max(total/npart, max_group), so
    splitting smaller groups buys nothing — grid.py's fair-share
    trigger) or when its Arrow frame would outgrow ~64 MB at the
    schema-estimated row width (memory: the cogroup materializes the
    whole group). The fairness factor is npart-bounded; the byte
    factor is not — memory correctness beats scheduling granularity."""
    if not cnts:
        return {}
    total = sum(n for _, n in cnts)
    fair = max(1.0, total / max(1, npart))
    out: dict[tuple, int] = {}
    for key, n in cnts:
        sub_f = (min(npart, -(-n // max(1, int(fair / 2.0))))
                 if n > 0.75 * fair else 1)
        sub_b = -(-n // cap_rows)
        sub = max(sub_f, sub_b)
        if sub > 1:
            out[key] = int(sub)
    return out


def model_image_to_grid(
    image_df: DataFrame,
    gp: GridParms,
    *,
    chan: str = "chan",
    pol: str = "pol",
    value: str = "model",
    correct_pswf: bool = True,
) -> DataFrame:
    """Forward transform of a model image into sparse uv-grid cells,
    physical DFT convention: a point source of flux f at the phase
    center produces model visibilities of amplitude f (no 1/Npad — the
    inverse of ``image_from_grid`` at ``sum_weight = n_u·n_v``)."""
    n_u, n_v = gp.n_u, gp.n_v
    schema = T.StructType([
        T.StructField(chan, T.IntegerType()),
        T.StructField(pol, T.IntegerType()),
        T.StructField("u_idx", T.IntegerType()),
        T.StructField("v_idx", T.IntegerType()),
        T.StructField("grid_re", T.DoubleType()),
        T.StructField("grid_im", T.DoubleType()),
    ])

    def plane(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        img = np.zeros((n_u, n_v))
        li = pdf["l_idx"].to_numpy(int)
        mi = pdf["m_idx"].to_numpy(int)
        img[li, mi] = pdf[value].to_numpy(float)
        if correct_pswf:
            cu = pswf((np.arange(n_u) - n_u // 2) / (n_u // 2))[0]
            cv = pswf((np.arange(n_v) - n_v // 2) / (n_v // 2))[0]
            img = img * np.outer(cu, cv)
        g = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(img)))
        ui, vi = np.nonzero(np.abs(g) > 0)
        return pd.DataFrame({
            chan: np.full(len(ui), key[0], np.int32),
            pol: np.full(len(ui), key[1], np.int32),
            "u_idx": ui.astype(np.int32), "v_idx": vi.astype(np.int32),
            "grid_re": g[ui, vi].real, "grid_im": g[ui, vi].imag,
        })

    return (image_df.select(chan, pol, "l_idx", "m_idx", value)
            .groupBy(chan, pol).applyInPandas(plane, schema))


def predict_modelvis_image(
    image_df: DataFrame,
    vis_df: DataFrame,
    gp: GridParms,
    **degrid_kwargs,
) -> DataFrame:
    """Model image → model visibilities at the input uv samples
    (predict_modelvis_image.py surface, here actually implemented)."""
    grid = model_image_to_grid(image_df, gp,
                               chan=degrid_kwargs.get("chan", "chan"),
                               pol=degrid_kwargs.get("pol", "pol"))
    return degrid_visibilities(vis_df, grid, gp, **degrid_kwargs)


def sql_degrid(gp: GridParms, vis_sql: str, grid_sql: str,
               *, key: str = "row_id") -> str:
    """DuckDB twin of the precise degrid: same geometry, tap explosion,
    grid join and quantized sums (grid_sql must itself be the precise
    grid twin so cell values are bit-equal inputs)."""
    from cngi_prototype_spark.imaging.grid import C_M_S

    from cngi_prototype_spark.imaging.grid import _sql_flit

    cgk = ", ".join(_sql_flit(x) for x in gp.kernel_1d())
    taps = ", ".join(f"({iu}, {iv})" for iu, iv in gp.taps())
    ov, half = gp.oversampling, gp.half

    def pos(axis: str, cell: float, n: int) -> str:
        return (f"{axis} * (-(freq * {cell!r} * {float(n)!r}) / {C_M_S!r})"
                f" + {float(n // 2)!r}")

    u_pos, v_pos = pos("u", gp.cell_u, gp.n_u), pos("v", gp.cell_v, gp.n_v)
    qsum = "(SUM(CAST(floor(({e}) * 1.0e9) AS BIGINT)) / 1.0e9)"
    conv = (f"(t[abs({ov} * tap.iu + g.du) + 1]"
            f" * t[abs({ov} * tap.iv + g.dv) + 1])")
    return f"""
    WITH cgk AS (SELECT [{cgk}] AS t),
    vis AS ({vis_sql}),
    grid AS ({grid_sql}),
    geom AS (
      SELECT {key}, chan, pol,
             CAST(floor(({u_pos}) + 0.5) AS INT) AS u_c,
             CAST(floor(({v_pos}) + 0.5) AS INT) AS v_c,
             CAST(floor((CAST(floor(({u_pos}) + 0.5) AS INT) - ({u_pos})) * {float(ov)!r} + 0.5) AS INT) AS du,
             CAST(floor((CAST(floor(({v_pos}) + 0.5) AS INT) - ({v_pos})) * {float(ov)!r} + 0.5) AS INT) AS dv
      FROM vis
      WHERE u_c + {half} < {gp.n_u} AND u_c - {half} >= 0
        AND v_c + {half} < {gp.n_v} AND v_c - {half} >= 0
    ),
    sums AS (
      SELECT g.{key},
             {qsum.format(e=f'{conv} * COALESCE(gr.grid_re, 0.0)')} AS sre,
             {qsum.format(e=f'{conv} * COALESCE(gr.grid_im, 0.0)')} AS sim,
             {qsum.format(e=conv)} AS nrm
      FROM geom g
      CROSS JOIN (VALUES {taps}) AS tap(iu, iv)
      CROSS JOIN cgk
      LEFT JOIN grid gr ON gr.chan = g.chan AND gr.pol = g.pol
                       AND gr.u_idx = g.u_c + tap.iu AND gr.v_idx = g.v_c + tap.iv
      GROUP BY g.{key}
    )
    SELECT {key}, CASE WHEN nrm > 0 THEN sre / nrm END AS model_re,
                  CASE WHEN nrm > 0 THEN sim / nrm END AS model_im
    FROM sums
    """


def predict_modelvis_component(
    vis_df: DataFrame,
    components: list[tuple[float, float, float]],
    *,
    u: str = "u", v: str = "v", freq: str = "freq",
    out: tuple[str, str] = ("model_re", "model_im"),
) -> DataFrame:
    """Analytic model visibilities from a (flux, l, m) component list —
    the reference's declared-but-stubbed ``predict_modelvis_component``:
    ``V(u,v) = Σ_c flux_c · exp(-2πi·(u_λ·l_c + v_λ·m_c))`` unrolled as
    cos/sin column expressions (component lists are small)."""
    u_l = F.col(u) * F.col(freq) / F.lit(299792458.0)
    v_l = F.col(v) * F.col(freq) / F.lit(299792458.0)
    re_expr = F.lit(0.0)
    im_expr = F.lit(0.0)
    for flux, l_c, m_c in components:
        arg = F.lit(-2.0 * float(np.pi)) * (u_l * F.lit(float(l_c)) + v_l * F.lit(float(m_c)))
        re_expr = re_expr + F.lit(float(flux)) * F.cos(arg)
        im_expr = im_expr + F.lit(float(flux)) * F.sin(arg)
    return vis_df.withColumn(out[0], re_expr).withColumn(out[1], im_expr)


def sql_predict_component(components: list[tuple[float, float, float]],
                          vis_sql: str, *, select_cols: str = "") -> str:
    terms_re, terms_im = [], []
    for flux, l_c, m_c in components:
        arg = (f"(-2.0 * CAST({float(np.pi)!r} AS DOUBLE))"
               f" * ((u * freq / 299792458.0) * CAST({float(l_c)!r} AS DOUBLE)"
               f" + (v * freq / 299792458.0) * CAST({float(m_c)!r} AS DOUBLE))")
        terms_re.append(f"CAST({float(flux)!r} AS DOUBLE) * cos({arg})")
        terms_im.append(f"CAST({float(flux)!r} AS DOUBLE) * sin({arg})")
    re_expr = " + ".join(["0.0"] + terms_re)
    im_expr = " + ".join(["0.0"] + terms_im)
    return f"""
    SELECT {select_cols} {re_expr} AS model_re, {im_expr} AS model_im
    FROM ({vis_sql})
    """
