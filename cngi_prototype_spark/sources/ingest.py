"""Row-form → long-form visibility ingest (convert_ms parity).

Reference parity: ``convert_ms``
(``/root/reference/cngi/conversion/convert_ms.py:21-252``) pivots
casacore row tables into dense (time, baseline, chan, pol) cubes. The
Spark-native long form makes the pivot a *relabeling*: rows stay rows;
what ingest adds is

- :func:`assign_baseline` — the dense baseline index the reference
  derives from unique (ANTENNA1, ANTENNA2) pairs
  (``convert_ms.py:142-147``): distinct + ``row_number`` + broadcast
  join back (dimension-table sized, never a wide shuffle).
- :func:`split_auto_cross` — the TaQL auto/cross split
  (``convert_ms.py:101-120``): pure filters.
- :func:`convert_time_mjd` — MJD seconds → timestamp with the 1858-11-17
  epoch offset (``_table_conversion.py:42-44``).
- :func:`describe_ms` — per-DDI shape/size summary
  (``describe_ms.py:21-73``).

At 100 TB the facts are written ``partitionBy(ddi)`` and sorted by
(time, baseline) within files so chan/pol predicates prune row groups —
the zarr chunk-shape tuning knob (``convert_ms.py:46-48``) maps to
``maxRecordsPerFile`` + partition sizing, exposed by ``write_vis``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# seconds between the MJD epoch (1858-11-17) and the unix epoch, minus
# the 40587-day integer part is 3506716800 exactly (TBC:38-44)
MJD_UNIX_OFFSET_S = 3506716800.0


def assign_baseline(df: DataFrame, *, ant1: str = "ant1", ant2: str = "ant2",
                    out: str = "baseline") -> DataFrame:
    """Dense 0-based baseline index over distinct (ant1, ant2), ordered
    like the reference's TaQL sort (antenna1, antenna2)."""
    pairs = (df.select(ant1, ant2).distinct()
             .withColumn(out, F.row_number().over(
                 Window.orderBy(F.col(ant1), F.col(ant2))) - 1))
    return df.join(F.broadcast(pairs), [ant1, ant2])


def split_auto_cross(df: DataFrame, *, ant1: str = "ant1", ant2: str = "ant2",
                     feed1: str | None = None, feed2: str | None = None
                     ) -> tuple[DataFrame, DataFrame]:
    """(cross, auto) — the reference keeps them as separate xds
    partitions (xds vs xdsa)."""
    same_feed = (F.col(feed1) == F.col(feed2)) if feed1 and feed2 else F.lit(True)
    auto = (F.col(ant1) == F.col(ant2)) & same_feed
    return df.filter(~auto), df.filter(auto)


def convert_time_mjd(mjd_seconds: Column) -> Column:
    """MJD seconds → timestamp (microsecond precision)."""
    return F.timestamp_micros(
        ((mjd_seconds - F.lit(MJD_UNIX_OFFSET_S)) * F.lit(1_000_000.0))
        .cast("long"))


def describe_ms(df: DataFrame, *, ddi: str = "ddi", time: str = "time",
                baseline: str = "baseline", chan: str = "chan",
                pol: str = "pol") -> DataFrame:
    """Per-DDI summary (describe_ms.py:50-73): row counts and dimension
    cardinalities in one grouped pass."""
    return (df.groupBy(ddi).agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct(time).alias("times"),
        F.countDistinct(baseline).alias("baselines"),
        F.countDistinct(chan).alias("chans"),
        F.countDistinct(pol).alias("pols"))
        .orderBy(ddi))
