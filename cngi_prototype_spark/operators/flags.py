"""Flagging operators.

Reference parity:
- ``apply_flags``  — cngi/vis/apply_flags.py:21-55 (``da.where(flag==0)``)
- ``auto_clip``    — ngcasa/flagging/auto_clip.py:22-51
- ``manual_flag``/``manual_unflag`` — ngcasa/flagging/manual_flag.py:26-88,
  manual_unflag.py:26-70
- flag-version manager — cngi/vis/manager_add.py (FLAG_* naming)

All are pure column expressions — no shuffle, no UDF; Catalyst fuses them
into the enclosing stage, and the clip/selection predicates push down to
the Parquet scan when applied directly after read. At 100 TB these
operators are free (scan-rate bound).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.functions.complex import c_abs
from cngi_prototype_spark.schema import DEFAULT_VIS, VisSchema


def apply_flags(
    df: DataFrame,
    vs: VisSchema = DEFAULT_VIS,
    cols: Iterable[str] | None = None,
    drop: bool = False,
) -> DataFrame:
    """NULL-out data columns where the flag is set.

    Reference sets flagged cells to NaN for every variable sharing the
    flag's dims (apply_flags.py:39-53). In long form the same effect is
    ``when(~flag, col)``; ``drop=True`` instead removes the rows, which
    is the cheaper plan when downstream ops ignore NULLs anyway (the
    filter pushes into the scan).
    """
    if drop:
        return df.filter(~F.col(vs.flag) | F.col(vs.flag).isNull())
    targets = list(cols) if cols is not None else list(vs.flat_data_cols())
    flagged = F.col(vs.flag)
    out = df
    for c in targets:
        out = out.withColumn(c, F.when(~flagged | flagged.isNull(), F.col(c)))
    return out


def auto_clip(
    df: DataFrame,
    clip_min: float,
    clip_max: float,
    vs: VisSchema = DEFAULT_VIS,
) -> DataFrame:
    """flag |= |DATA| outside [clip_min, clip_max].

    Reference: auto_clip.py:45-46 computes abs of the complex DATA and
    ORs the range test into FLAG.
    """
    re, im = vs.data_cols[0]
    amp = c_abs(F.col(re), F.col(im))
    clip = (amp < F.lit(clip_min)) | (amp > F.lit(clip_max))
    return df.withColumn(
        vs.flag, F.coalesce(F.col(vs.flag), F.lit(False)) | F.coalesce(clip, F.lit(False))
    )


def manual_flag(
    df: DataFrame,
    predicate: Column,
    vs: VisSchema = DEFAULT_VIS,
) -> DataFrame:
    """OR a selection predicate into FLAG (manual_flag.py:84-86: the
    selection slab is reindexed over the cube and OR-ed; in long form the
    predicate IS the slab)."""
    return df.withColumn(
        vs.flag,
        F.coalesce(F.col(vs.flag), F.lit(False)) | F.coalesce(predicate, F.lit(False)),
    )


def manual_unflag(
    df: DataFrame,
    predicate: Column | None = None,
    vs: VisSchema = DEFAULT_VIS,
) -> DataFrame:
    """AND-NOT a selection out of FLAG; ``predicate=None`` unflags all
    (manual_unflag.py: empty commands -> clear)."""
    if predicate is None:
        return df.withColumn(vs.flag, F.lit(False))
    return df.withColumn(
        vs.flag,
        F.coalesce(F.col(vs.flag), F.lit(False)) & ~F.coalesce(predicate, F.lit(False)),
    )


# --- flag-version manager (cngi/vis/manager_add.py etc.) -----------------

FLAG_PREFIX = "FLAG_"


def manager_add(df: DataFrame, name: str, source_col: str | None = None,
                vs: VisSchema = DEFAULT_VIS,
                descr: str | None = None) -> DataFrame:
    """Save the current FLAG column as a named version ``FLAG_<name>``
    (ngcasa/flagging/manager_add.py:24-66 naming convention). ``descr``
    is the reference's text description ('backup_beginning', ...) —
    there it lives in the xds ``flag_variables`` attr
    (``_flag_attributes.py:19-36``); the Spark-native home is COLUMN
    METADATA, which rides the schema through projections and parquet
    round trips with no sidecar."""
    col = F.col(source_col or vs.flag)
    if descr is not None:
        col = col.alias(FLAG_PREFIX + name, metadata={"descr": descr})
    return df.withColumn(FLAG_PREFIX + name, col)


def manager_list(df: DataFrame, with_descr: bool = False):
    """Names of saved flag versions; ``with_descr=True`` returns
    ``(name, description)`` pairs from column metadata — the
    reference's ``manager_list`` table (manager_list.py:24-47)."""
    names = [c for c in df.columns if c.startswith(FLAG_PREFIX)]
    if not with_descr:
        return names
    meta = {f.name: (f.metadata or {}).get("descr", "")
            for f in df.schema.fields}
    return [(n, meta.get(n, "")) for n in names]


def manager_remove(df: DataFrame, name: str) -> DataFrame:
    """Drop a saved flag version (ngcasa/flagging/manager_remove.py:23-49;
    there, deleting the active FLAG is refused — here the FLAG_ prefix
    convention makes that impossible by construction)."""
    return df.drop(FLAG_PREFIX + name)


def manager_apply(df: DataFrame, name: str, vs: VisSchema = DEFAULT_VIS) -> DataFrame:
    """Restore a saved flag version into the active FLAG column."""
    return df.withColumn(vs.flag, F.col(FLAG_PREFIX + name))


def quack(df: DataFrame, width: float, *, mode: str = "beg",
          scan: str = "scan_number", time: str = "time",
          flag: str = "flag") -> DataFrame:
    """Flag scan edges (slew settling) — implements the reference's
    declared-but-stubbed ``ngcasa/flagging/quack.py:20-60`` surface:
    rows within ``width`` seconds of each scan's start (``beg``), end
    (``end``) or both get flagged. One window min/max per scan
    partition, pure exprs."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(scan)
    t = F.col(time).cast("double")
    lo = t - F.min(t).over(w)
    hi = F.max(t).over(w) - t
    if mode == "beg":
        hit = lo < width
    elif mode == "end":
        hit = hi < width
    elif mode == "both":
        hit = (lo < width) | (hi < width)
    else:
        raise ValueError(f"unknown quack mode: {mode}")
    return df.withColumn(flag, F.col(flag) | hit)


def extend_flags(df: DataFrame, *, grow_chan: int = 0, grow_time: int = 0,
                 keys: tuple[str, ...] = ("baseline", "pol"),
                 chan: str = "chan", time: str = "time",
                 flag: str = "flag") -> DataFrame:
    """Grow flags along chan and/or time — the reference's stubbed
    ``ngcasa/flagging/extend.py`` semantics: a sample is flagged if any
    sample within ±grow of it (same baseline/pol spectrum or time
    series) is flagged. Range windows with bool_or; no shuffle beyond
    the window partitioning."""
    from pyspark.sql.window import Window

    out = df
    if grow_chan:
        w = (Window.partitionBy(*keys, time).orderBy(chan)
             .rowsBetween(-grow_chan, grow_chan))
        out = out.withColumn(flag, F.max(F.col(flag).cast("int")).over(w) == 1)
    if grow_time:
        w = (Window.partitionBy(*keys, chan).orderBy(time)
             .rowsBetween(-grow_time, grow_time))
        out = out.withColumn(flag, F.max(F.col(flag).cast("int")).over(w) == 1)
    return out


def shadow(df: DataFrame, *, dish_diameter: float, u: str = "u", v: str = "v",
           w: str = "w", flag: str = "flag") -> DataFrame:
    """Geometric antenna shadowing (stubbed ``shadow.py``): a baseline
    whose projected separation is under one dish diameter with positive
    w (the second antenna behind the first) is shadowed."""
    proj = F.sqrt(F.col(u) * F.col(u) + F.col(v) * F.col(v))
    return df.withColumn(flag, F.col(flag)
                         | ((proj < dish_diameter) & (F.col(w) > 0)))


def elevation_flag(df: DataFrame, *, min_elevation_rad: float,
                   elevation: str = "elevation", flag: str = "flag") -> DataFrame:
    """Low-elevation flagging (stubbed ``elevation.py``) given a
    per-sample elevation column."""
    return df.withColumn(flag, F.col(flag) | (F.col(elevation) < min_elevation_rad))


def _window_moments(df: DataFrame, value: str, w) -> tuple[Column, Column, Column]:
    x = F.col(value)
    n = F.count(x).over(w).cast("double")
    sx = F.sum(x).over(w)
    sxx = F.sum(x * x).over(w)
    return n, sx, sxx


def auto_rflag(df: DataFrame, *, nsigma: float = 5.0, time_window: int = 9,
               keys: tuple[str, ...] = ("baseline", "chan", "pol"),
               time: str = "time", value: str = "data_re",
               flag: str = "flag", order_tiebreak: tuple[str, ...] = ()) -> DataFrame:
    """Sliding-window outlier flagging along time — implements the
    reference's declared-but-stubbed ``ngcasa/flagging/auto_rflag.py``:
    a sample is flagged when it deviates from its local time-window mean
    by more than ``nsigma`` local standard deviations. Variance is the
    explicit (n·Σx² − (Σx)²)/(n·(n−1)) form over the ordered frame, so
    the SQL twin is bit-identical."""
    from pyspark.sql.window import Window

    k = time_window // 2
    w = (Window.partitionBy(*keys).orderBy(time, *order_tiebreak)
         .rowsBetween(-k, k))
    n, sx, sxx = _window_moments(df, value, w)
    var = (n * sxx - sx * sx) / (n * (n - 1.0))
    mean = sx / n
    dev = F.col(value) - mean
    hit = (n > 2) & (dev * dev > F.lit(float(nsigma) ** 2) * var)
    return df.withColumn(flag, F.col(flag) | hit)


def auto_tfcrop(df: DataFrame, *, nsigma: float = 4.0, chan_window: int = 11,
                keys: tuple[str, ...] = ("baseline", "time", "pol"),
                chan: str = "chan", value: str = "data_re",
                flag: str = "flag", order_tiebreak: tuple[str, ...] = ()) -> DataFrame:
    """Spectral-background outlier flagging — the stubbed
    ``auto_tfcrop.py`` semantics: per spectrum, flag samples deviating
    from the local chan-window background by ``nsigma`` local sigmas."""
    from pyspark.sql.window import Window

    k = chan_window // 2
    w = (Window.partitionBy(*keys).orderBy(chan, *order_tiebreak)
         .rowsBetween(-k, k))
    n, sx, sxx = _window_moments(df, value, w)
    var = (n * sxx - sx * sx) / (n * (n - 1.0))
    mean = sx / n
    dev = F.col(value) - mean
    hit = (n > 2) & (dev * dev > F.lit(float(nsigma) ** 2) * var)
    return df.withColumn(flag, F.col(flag) | hit)


def auto_uvbin(df: DataFrame, *, nsigma: float = 5.0, cell_size: float = 100.0,
               u: str = "u", v: str = "v", value: str = "data_re",
               chan: str = "chan", pol: str = "pol",
               flag: str = "flag") -> DataFrame:
    """Gridded-uv-plane outlier flagging — the reference's stubbed
    ``ngcasa/flagging/auto_uvbin.py`` ("detects outliers on the gridded
    spatial frequency plane"): bin samples into uv cells, compute each
    cell's mean/variance in one aggregation (explicit moments), flag
    samples deviating by more than ``nsigma`` cell sigmas. Grid stats
    join back broadcast (cell count is bounded by the uv plane)."""
    cu = F.floor(F.col(u) / F.lit(float(cell_size))).cast("long")
    cv = F.floor(F.col(v) / F.lit(float(cell_size))).cast("long")
    binned = df.withColumn("_bu", cu).withColumn("_bv", cv)
    x = F.col(value)
    stats = (binned.groupBy(chan, pol, "_bu", "_bv")
             .agg(F.count(x).cast("double").alias("_n"),
                  F.sum(x).alias("_sx"),
                  F.sum(x * x).alias("_sxx")))
    j = binned.join(F.broadcast(stats), [chan, pol, "_bu", "_bv"], "left")
    n, sx, sxx = F.col("_n"), F.col("_sx"), F.col("_sxx")
    var = (n * sxx - sx * sx) / (n * (n - 1.0))
    dev = x - sx / n
    hit = (n > 2) & (dev * dev > F.lit(float(nsigma) ** 2) * var)
    return (j.withColumn(flag, F.col(flag) | hit)
            .drop("_bu", "_bv", "_n", "_sx", "_sxx"))


# --- selection-command parsing (manual_flag commands / flagonline.txt) ---

def parse_sel_cmd(
    cmd: dict,
    *,
    antenna_names: dict[str, int] | None = None,
    vs: VisSchema = DEFAULT_VIS,
    ant1: str = "ant1",
    ant2: str = "ant2",
) -> Column:
    """Selection dict -> Column predicate — the long-form twin of
    ``_parse_sel_cmd`` (ngcasa/flagging/_flagging_utils/_parse_sel_cmd.py:
    20-57): keys 'time' ((start, stop) tuple, strings or timestamps),
    'antenna' (name via ``antenna_names``, id, or list — matches either
    antenna of the baseline like ``_antenna_to_baseline.py:18-44``),
    'chan' and 'pol' (scalar or list). In long form the reference's
    ``sel + reindex_like`` slab IS the predicate, ready for
    :func:`manual_flag` / :func:`manual_unflag`."""
    pred = F.lit(True)
    if "time" in cmd:
        start, stop = cmd["time"]
        t = F.col(vs.time)
        if start is not None:
            pred = pred & (t >= F.lit(start).cast("timestamp"))
        if stop is not None:
            pred = pred & (t <= F.lit(stop).cast("timestamp"))
    if "antenna" in cmd:
        ants = cmd["antenna"]
        if not isinstance(ants, (list, tuple)):
            ants = [ants]
        ids = []
        for a in ants:
            if isinstance(a, str):
                if not antenna_names or a not in antenna_names:
                    raise ValueError(f"unknown antenna name: {a!r}")
                ids.append(int(antenna_names[a]))
            else:
                ids.append(int(a))
        pred = pred & (F.col(ant1).isin(ids) | F.col(ant2).isin(ids))
    if "chan" in cmd:
        chans = cmd["chan"]
        chans = chans if isinstance(chans, (list, tuple)) else [chans]
        pred = pred & F.col(vs.chan).isin([int(c) for c in chans])
    if "pol" in cmd:
        pols = cmd["pol"]
        pols = pols if isinstance(pols, (list, tuple)) else [pols]
        pred = pred & F.col(vs.pol).isin([int(p) for p in pols])
    return pred


def merge_timerange_cmds(cmds: list[dict]) -> list[dict]:
    """Reduce timerange flagging commands before predicate building —
    ``_merge_timerange_cmds`` parity
    (``/root/reference/ngcasa/flagging/_flagging_utils/_merge_timerange_cmds.py:20-67``):
    pipeline flagcmd lists carry enough overlapping/adjacent timeranges
    that merging shrinks them one-to-two orders of magnitude ("from
    1072 down to 38"), so a thousand-command file builds ~40 Column
    predicates instead of a thousand.

    Commands with a valid time range (start < stop) group by the
    compound key of all their OTHER key/values; each group's closed
    intervals sort and coalesce (next.start <= current.stop merges —
    overlap or touch), emitting one command per disjoint merged range.
    Since every command's predicate ORs into FLAG (:func:`manual_flag`)
    and coalescing is exact set union over closed intervals, the
    resulting FLAG column is identical to applying the unmerged list
    (unit-tested). Divergence note: the reference's own loop flushes on
    the second duplicate key (``slice.append`` raises into its bare
    ``except``, see its "TODO: further cleaning"); this implements the
    CASA flaghelper semantics its docstring targets. Ordering parity:
    a non-mergeable command (no/invalid timerange, unhashable values)
    flushes the buffer first, preserving agent-group order
    (summary,manual,manual,summary → summary,merged-manual,summary).
    """
    out: list[dict] = []
    groups: dict[tuple, dict] = {}  # compound key -> {"base", "ivals"}

    def flush() -> None:
        for g in groups.values():
            ivals = sorted(g["ivals"])
            merged = [list(ivals[0])]
            for start, stop in ivals[1:]:
                if start <= merged[-1][1]:
                    merged[-1][1] = max(merged[-1][1], stop)
                else:
                    merged.append([start, stop])
            for start, stop in merged:
                out.append({**g["base"], "time": (start, stop)})
        groups.clear()

    for cmd in cmds:
        t = cmd.get("time")
        ok = (isinstance(t, (tuple, list)) and len(t) == 2
              and t[0] is not None and t[1] is not None and t[0] < t[1])
        key = None
        if ok:
            try:
                key = tuple(sorted(
                    (k, tuple(v) if isinstance(v, list) else v)
                    for k, v in cmd.items() if k != "time"))
                hash(key)  # unhashable value (dict, set, ...) inside
            except TypeError:  # unhashable value: not mergeable
                key = None
        if key is None:
            flush()
            out.append(dict(cmd))
            continue
        g = groups.setdefault(key, {
            "base": {k: v for k, v in cmd.items() if k != "time"},
            "ivals": []})
        g["ivals"].append((t[0], t[1]))
    flush()
    return out


def read_flagcmds(filename: str, merge: bool = True) -> list[dict]:
    """Parse CASA pipeline ``*flagonline.txt`` / ``*flagcmds.txt`` lines
    into selection dicts (``_read_flagcmds.py:21-70`` semantics):
    ``key='value'`` tokens; ``antenna='name&...'`` keeps the first
    antenna, ``timerange='Y/M/D/h:m:s~Y/M/D/h:m:s'`` becomes a
    ('time': (start, stop)) pair in ISO form. ``merge=True`` reduces
    the parsed list through :func:`merge_timerange_cmds` before
    returning, matching the reference's ``_read_flagcmds.py:83``."""
    cmds: list[dict] = []
    with open(filename) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            out: dict = {}
            for tok in line.split(" "):
                if "=" not in tok:
                    continue
                key, value = tok.split("=", 1)
                value = value.strip("'")
                if key == "antenna":
                    out["antenna"] = value.split("&")[0]
                elif key == "timerange":
                    value = value.replace("/", "-")
                    start, end = value.split("~")
                    start = start[0:10] + "T" + start[11:]
                    end = end[0:10] + "T" + end[11:]
                    out["time"] = (start, end)
            if out:
                cmds.append(out)
    return merge_timerange_cmds(cmds) if merge else cmds


# casacore StokesTypes enum (measures/Measures/Stokes.h), the table the
# reference's flag summaries use to label correlation products —
# ``_pol_id_to_corr_type_name``
# (ngcasa/flagging/_flagging_utils/_summary_utils.py:53-110)
CASACORE_STOKES_NAMES = (
    "Undef", "I", "Q", "U", "V", "RR", "RL", "LR", "LL",
    "XX", "XY", "YX", "YY",
    "RX", "RY", "LX", "LY", "XR", "XL", "YR", "YL",
    "PP", "PQ", "QP", "QQ",
    "RCircular", "LCircular", "Linear", "Ptotal",
    "Plinear", "PFtotal", "PFlinear", "Pangle",
)


def pol_id_to_corr_type_name(idx: int) -> str:
    """Human-readable stokes / correlation-product name for an MS
    CORR_TYPE integer id (``_summary_utils.py:53-110`` parity: same
    enum sequence, same [1, 32] validity range)."""
    if idx < 1 or idx > len(CASACORE_STOKES_NAMES) - 1:
        raise ValueError(
            f"Invalid corr type index: {idx}, should be in "
            f"[1,{len(CASACORE_STOKES_NAMES) - 1}]")
    return CASACORE_STOKES_NAMES[idx]


def corr_type_name_col(corr_id: Column) -> Column:
    """Column form of :func:`pol_id_to_corr_type_name` — label a
    CORR_TYPE id column for per-correlation summaries; out-of-range
    ids yield NULL (Spark convention) rather than raising."""
    names = F.array(*[F.lit(n) for n in CASACORE_STOKES_NAMES[1:]])
    n = len(CASACORE_STOKES_NAMES) - 1
    # range-guarded: element_at is 1-based and RAISES on index 0
    return F.when((corr_id >= 1) & (corr_id <= n),
                  F.element_at(names, corr_id.cast("int")))
