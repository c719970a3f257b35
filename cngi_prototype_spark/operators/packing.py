"""Long-form ↔ packed-spectra layout conversion (SURVEY.md §1.5).

The long form (one row per (time, baseline, chan, pol)) is the engine's
canonical layout — relational operators stay pure Catalyst. The packed
form (one row per (time, baseline, pol) with chan-ordered array columns)
mirrors the reference's chunk layout (``convert_ms.py:21,46-48`` chunk
shape (time, baseline, chan, pol)) and is the fast substrate for
per-spectrum Arrow UDFs: one row = one whole spectrum, so grouped-map
kernels see contiguous arrays without a groupBy.

Packing is ``sort_array(collect_list(struct(chan, v)))`` — order is
carried inside the collected structs, so the result is deterministic
regardless of partitioning (collect_list alone is not). Missing chans
stay missing (sparse semantics are preserved through the chan array).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_spectra(
    df: DataFrame,
    *,
    keys: tuple[str, ...] = ("time", "baseline", "pol"),
    chan: str = "chan",
    values: tuple[str, ...] = ("data_re", "data_im"),
) -> DataFrame:
    """Long → packed: per key row, ``chans`` array plus one aligned
    array per value column."""
    packed = (df.select(*keys, F.struct(F.col(chan).alias("_c"),
                                        *[F.col(v) for v in values]).alias("_s"))
              .groupBy(*keys)
              .agg(F.array_sort(F.collect_list("_s")).alias("_ss")))
    def field(name):
        # NB: a `lambda s, v=v:` default-arg closure would change the
        # lambda's arity, which pyspark interprets as (element, index)
        return lambda s: s.getField(name)

    cols = [F.transform("_ss", field("_c")).alias("chans")]
    cols += [F.transform("_ss", field(v)).alias(v) for v in values]
    return packed.select(*keys, *cols)


def unpack_spectra(
    df: DataFrame,
    *,
    keys: tuple[str, ...] = ("time", "baseline", "pol"),
    chan: str = "chan",
    values: tuple[str, ...] = ("data_re", "data_im"),
) -> DataFrame:
    """Packed → long (inverse of :func:`pack_spectra`)."""
    n = F.size("chans")
    idx = F.explode(F.sequence(F.lit(0), n - 1)).alias("_i")
    out = df.select(*keys, "chans", *values, idx)
    cols = [F.element_at(F.col("chans"), F.col("_i") + 1).alias(chan)]
    cols += [F.element_at(F.col(v), F.col("_i") + 1).alias(v) for v in values]
    return out.select(*keys, *cols)
