"""Statistics / moments / flag-summary aggregations.

Reference parity:
- ``statistics``  — cngi/image/statistics.py:20-183: global aggregates
  over one data variable (sum, sumsq, mean, sigma, rms, min, max, median,
  MAD-median, q1/q3, npts, arg-positions of the extrema).
- ``moments``     — cngi/image/moments.py:25-149: 12 per-pixel reductions
  along the chan axis (mean, integrated, intensity-weighted velocity and
  dispersion, median, quantile coord, stddev, rms, abs mean dev, max/min
  and their coordinates).
- flag ``summary`` — ngcasa/flagging/summary.py:60-181: flagged/total
  counts per grouping key.

Spark-first shape:
- statistics: ONE ``agg()`` pass (plus a second tiny pass only when the
  MAD-median is requested — it needs the median first). argmin/argmax
  positions via ``min_by``/``max_by`` on a packed position struct, which
  the reference does with ``np.unravel_index(argmax)``.
- moments: one hash agg grouped by the per-pixel keys; every moment is a
  built-in aggregate, so all 12 compute in a single shuffle.
- summary: GROUPING SETS — every grouping key in ONE pass over the data
  (the reference loops one xarray groupby per key: summary.py:60-181).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.functions import exact
from cngi_prototype_spark.schema import DEFAULT_VIS, VisSchema


def statistics(
    df: DataFrame,
    value_col: str,
    pos_cols: list[str] | None = None,
    compute_madmedian: bool = False,
    precise: bool = True,
) -> DataFrame:
    """One-row DataFrame of the reference's statistics dict.

    Columns: npts, sum, sumsq, mean, sigma, rms, min, max, median, q1,
    q3, plus ``min_pos_<k>``/``max_pos_<k>`` for each position column.
    Lazy like the reference's ``compute=False`` default
    (statistics.py:34-36) — nothing runs until an action.
    """
    # precise -> exact percentile (single-reducer sort: gate/small-data only);
    # fast path -> percentile_approx (distributed t-digest mergeable sketch,
    # the only sane plan at 100 TB)
    pctl = "percentile" if precise else "percentile_approx"
    v = F.col(value_col)
    aggs = [
        F.count(v).alias("npts"),
        (exact.dsum(v) if precise else F.sum(v)).alias("sum"),
        (exact.dsum(v * v) if precise else F.sum(v * v)).alias("sumsq"),
        exact.mean(v, precise).alias("mean"),
        exact.stddev(v, precise).alias("sigma"),
        exact.rms(v, precise).alias("rms"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
        F.expr(f"{pctl}({value_col}, 0.5)").alias("median"),
        F.expr(f"{pctl}({value_col}, 0.25)").alias("q1"),
        F.expr(f"{pctl}({value_col}, 0.75)").alias("q3"),
    ]
    for p in pos_cols or []:
        aggs.append(F.expr(f"min_by({p}, {value_col})").alias(f"min_pos_{p}"))
        aggs.append(F.expr(f"max_by({p}, {value_col})").alias(f"max_pos_{p}"))
    out = df.agg(*aggs)
    if compute_madmedian:
        # second pass: median of |x - median| (statistics.py medabsdevmed)
        med = out.select("median").first()["median"]
        mad = df.agg(
            F.expr(f"{pctl}(abs({value_col} - {med!r}), 0.5)").alias("medabsdevmed")
        )
        out = out.crossJoin(mad)
    return out


def moments(
    df: DataFrame,
    group_cols: list[str],
    axis_col: str,
    value_col: str,
    delta: float = 1.0,
    which: list[int] | None = None,
    precise: bool = True,
) -> DataFrame:
    """Collapse ``axis_col`` (chan) computing CASA-style moments -1..11
    (moments.py:85-143). ``delta`` is the channel width (the integrated
    moment multiplies by it). ``which`` selects moment codes; default all.

    Moment map (column name -> CASA code):
      mom_mean(-1), mom_integrated(0), mom_weighted_coord(1),
      mom_weighted_dispersion(2), mom_median(3), mom_median_coord(4*),
      mom_stddev(5), mom_rms(6), mom_abs_mean_dev(7), mom_max(8),
      mom_max_coord(9), mom_min(10), mom_min_coord(11)
    (*) the reference computes moment 4 as quantile .25 of the intensity
    (moments.py:104) — reproduced as-is.
    """
    which = which if which is not None else list(range(-1, 12))
    pctl = "percentile" if precise else "percentile_approx"
    v, ax = F.col(value_col), F.col(axis_col)
    n = F.count(v).cast("double")
    mdefs: dict[int, tuple[str, Column]] = {
        -1: ("mom_mean", exact.mean(v, precise)),
        0: ("mom_integrated", (exact.dsum(v) if precise else F.sum(v)) * F.lit(delta)),
        1: ("mom_weighted_coord", exact.wmean(ax.cast("double"), v, precise)),
        3: ("mom_median", F.expr(f"{pctl}({value_col}, 0.5)")),
        4: ("mom_median_coord", F.expr(f"{pctl}({value_col}, 0.25)")),
        5: ("mom_stddev", exact.stddev(v, precise)),
        6: ("mom_rms", exact.rms(v, precise)),
        8: ("mom_max", F.max(v)),
        9: ("mom_max_coord", F.expr(f"max_by({axis_col}, {value_col})").cast("double")),
        10: ("mom_min", F.min(v)),
        11: ("mom_min_coord", F.expr(f"min_by({axis_col}, {value_col})").cast("double")),
    }
    aggs = [expr.alias(name) for code, (name, expr) in mdefs.items() if code in which]
    # moments needing a first-pass mean over the same groups:
    need_disp = 2 in which
    need_amd = 7 in which
    out = df.groupBy(*group_cols).agg(*aggs)
    if need_disp:
        # intensity-weighted velocity dispersion:
        # sqrt( sum(I*(v - vbar)^2)/sum(I) ) with vbar = sum(I*v)/sum(I)
        # expand: sqrt( sum(I*v^2)/sum(I) - vbar^2 ) — single pass
        ivv = exact.wmean(ax.cast("double") * ax.cast("double"), v, precise)
        ivbar = exact.wmean(ax.cast("double"), v, precise)
        disp = df.groupBy(*group_cols).agg(
            F.sqrt(ivv - ivbar * ivbar).alias("mom_weighted_dispersion")
        )
        out = out.join(disp, group_cols)
    if need_amd:
        mean_df = df.groupBy(*group_cols).agg(exact.mean(v, precise).alias("__mu"))
        amd = (
            df.join(F.broadcast(mean_df), group_cols)
            .groupBy(*group_cols)
            .agg(exact.mean(F.abs(v - F.col("__mu")), precise).alias("mom_abs_mean_dev"))
        )
        out = out.join(amd, group_cols)
    return out


def flag_summary(
    df: DataFrame,
    group_cols: list[str],
    vs: VisSchema = DEFAULT_VIS,
) -> DataFrame:
    """Flagged/total counts for every grouping key in ONE scan via
    GROUPING SETS (summary.py:60-181 does one groupby per key).

    Output: (group_key, group_value, flagged, total) — group_value is
    stringified so heterogeneous key types union cleanly, exactly like
    the reference's nested dict-of-str keys.
    """
    flag_int = F.coalesce(F.col(vs.flag), F.lit(False)).cast("long")
    sets = ", ".join(f"({c})" for c in group_cols)
    exprs = ", ".join(group_cols)
    df.select(*group_cols, flag_int.alias("__f")).createOrReplaceTempView("__fs_in")
    spark = df.sparkSession
    out = spark.sql(
        f"""
        SELECT {exprs}, SUM(__f) AS flagged, COUNT(*) AS total
        FROM __fs_in
        GROUP BY GROUPING SETS ({sets})
        """
    )
    # melt to (key, value, flagged, total)
    stack_expr = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in group_cols)
    out = out.select(
        F.expr(f"stack({len(group_cols)}, {stack_expr}) AS (group_key, group_value)"),
        "flagged",
        "total",
    ).filter(F.col("group_value").isNotNull())
    return out
