"""Spectral smoothing operators.

Reference parity: ``chan_smooth`` — cngi/vis/chan_smooth.py:21-79:
centered rolling window of size k along chan, dot-product with
boxcar/triangular/hann window weights, gain-normalized.

Spark-first shape: the convolution is a fixed linear combination of k
lag/lead terms inside ONE window spec — no UDF, no row explosion, stays
in whole-stage codegen. The window sort is per (time, baseline, pol)
partition, which is exactly the axis order the data is already stored in
(sortWithinPartitions at write), so at scale the sort is cheap or free.

Window weights are generated here (numpy formulas for the scipy.signal
windows the reference uses; scipy itself is not a dependency).

Divergence note: the reference's min_periods=1 rolling edge behavior
produces NaN-contaminated dots at the spectrum edges; we renormalize by
the sum of weights over *present* neighbors instead (NaN-skip
discipline, SURVEY.md §7.4), which is also what CASA hanningsmooth does.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cngi_prototype_spark.schema import DEFAULT_VIS, VisSchema


def window_weights(kind: str, size: int) -> list[float]:
    """Symmetric window weights (scipy.signal.get_window equivalents)."""
    if kind == "boxcar":
        return [1.0] * size
    if kind == "triang":
        h = (size + 1) / 2.0
        return [1.0 - abs(j - (size - 1) / 2.0) / h for j in range(size)]
    if kind == "hann":
        if size == 1:
            return [1.0]
        return [0.5 - 0.5 * math.cos(2.0 * math.pi * j / (size - 1)) for j in range(size)]
    raise ValueError(f"unknown window kind: {kind}")


def _shift(col: Column, offset: int, w: Window) -> Column:
    if offset == 0:
        return col
    return F.lag(col, -offset).over(w) if offset < 0 else F.lead(col, offset).over(w)


def chan_smooth(
    df: DataFrame,
    window: str | list[float] = "hann",
    size: int = 3,
    vs: VisSchema = DEFAULT_VIS,
    cols: list[str] | None = None,
) -> DataFrame:
    """Weighted centered rolling smooth along chan (chan_smooth.py:66-73).

    ``window`` is a window name or an explicit weight list (the
    reference's custom-window escape hatch). Assumes dense integer chan
    within each (time, baseline, pol) group, as the reference's cube
    layout guarantees.
    """
    weights = window_weights(window, size) if isinstance(window, str) else list(window)
    size = len(weights)
    half = (size - 1) // 2
    targets = cols if cols is not None else list(vs.flat_data_cols())
    wspec = Window.partitionBy(vs.time, vs.baseline, vs.pol).orderBy(vs.chan)

    out = df
    for c in targets:
        num = F.lit(0.0)
        den = F.lit(0.0)
        for j, wj in enumerate(weights):
            off = j - half
            neighbor = _shift(F.col(c), off, wspec)
            num = num + F.lit(wj) * F.coalesce(neighbor, F.lit(0.0))
            den = den + F.lit(wj) * neighbor.isNotNull().cast("double")
        out = out.withColumn(c, F.when(den > 0, num / den))
    return out


def sql_chan_smooth(
    value: str,
    weights: list[float],
    partition: str,
    order: str,
) -> str:
    """DuckDB twin of one smoothed column — identical expression tree
    (same literal weights, same left-assoc sum) for bit-identical output."""
    half = (len(weights) - 1) // 2
    over = f"OVER (PARTITION BY {partition} ORDER BY {order})"

    def shift(off: int) -> str:
        if off == 0:
            return value
        if off < 0:
            return f"LAG({value}, {-off}) {over}"
        return f"LEAD({value}, {off}) {over}"

    num = "0.0"
    den = "0.0"
    for j, wj in enumerate(weights):
        s = shift(j - half)
        num = f"({num} + {wj!r} * COALESCE({s}, 0.0))"
        den = f"({den} + {wj!r} * CAST({s} IS NOT NULL AS DOUBLE))"
    return f"CASE WHEN {den} > 0 THEN {num} / {den} END"
