"""Apply antenna gain solutions to visibilities.

Reference parity: ``apply_calibration``
(``/root/reference/ngcasa/calibration/apply_calibration.py:20-49`` — a
reference *stub* with fully specified semantics):

    V_ij(corrected) = V_ij(observed) / (g_i · conj(g_j))

plus the standard weight propagation ``w' = w · |g_i·conj(g_j)|²``
(the same convention ``self_cal``'s inline corrected output uses,
``/root/reference/ngcasa/calibration/self_cal.py:500-543``).

Spark shape: the gains table is tiny (n_ant × n_interval × n_pol rows)
— broadcast-join it twice onto the visibility fact (once per antenna
leg) and evaluate the complex divide as pure Catalyst column
expressions. Nothing leaves the JVM; the plan stays inside whole-stage
codegen, so applying calibration at 100 TB is a map-only stage with two
broadcast hash joins — no shuffle of the visibility table at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_calibration(
    vis_df: DataFrame,
    gains_df: DataFrame,
    *,
    join_keys: list[str] | None = None,
    ant1: str = "ant1",
    ant2: str = "ant2",
    ant: str = "ant",
    data: tuple[str, str] = ("data_re", "data_im"),
    out: tuple[str, str] = ("corrected_re", "corrected_im"),
    weight: str | None = "weight",
    out_weight: str = "corrected_weight",
) -> DataFrame:
    """Apply per-antenna complex gains to a visibility DataFrame.

    ``gains_df`` carries ``(join_keys..., ant, gain_re, gain_im)`` —
    the shape ``self_cal`` emits. ``join_keys`` (default
    ``["interval", "pol"]`` intersected with the gains schema) select
    the solution that applies to each visibility row; each antenna leg
    joins on ``join_keys + [ant]``.

    Rows whose gain is missing (antenna absent from the solution) keep
    null corrected columns — the caller decides whether to flag or
    drop them, mirroring the reference's TBD interpolation semantics.
    """
    if join_keys is None:
        gcols = set(gains_df.columns)
        join_keys = [k for k in ("interval", "pol") if k in gcols]
    dre, dim = data
    ore, oim = out

    g1 = F.broadcast(gains_df.select(
        *join_keys, F.col(ant).alias(ant1),
        F.col("gain_re").alias("_g1r"), F.col("gain_im").alias("_g1i")))
    g2 = F.broadcast(gains_df.select(
        *join_keys, F.col(ant).alias(ant2),
        F.col("gain_re").alias("_g2r"), F.col("gain_im").alias("_g2i")))
    j = (vis_df.join(g1, [*join_keys, ant1], "left")
               .join(g2, [*join_keys, ant2], "left"))
    # G = g1 · conj(g2); corrected = V / G = V·conj(G)/|G|²
    gr = F.col("_g1r") * F.col("_g2r") + F.col("_g1i") * F.col("_g2i")
    gi = F.col("_g1i") * F.col("_g2r") - F.col("_g1r") * F.col("_g2i")
    g2abs = gr * gr + gi * gi
    out_df = (j.withColumn(ore, (F.col(dre) * gr + F.col(dim) * gi) / g2abs)
               .withColumn(oim, (F.col(dim) * gr - F.col(dre) * gi) / g2abs))
    if weight is not None:
        out_df = out_df.withColumn(out_weight, F.col(weight) * g2abs)
    return out_df.drop("_g1r", "_g1i", "_g2r", "_g2i")
