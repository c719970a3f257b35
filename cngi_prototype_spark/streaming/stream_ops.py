"""Structured-Streaming surface.

The reference is batch-only (SURVEY.md §2.9) — its closest analogs are
``time_average``'s uniform resampling (``cngi/vis/time_average.py:63-74``)
and incremental appends (``convert_ms(append=True)``, ``append_xds``).
This module lifts those semantics onto live sources:

- :func:`stream_time_average` — the tumbling-window weighted
  time-average of the batch operator, incrementally maintained with a
  watermark for late data. State per (window × baseline × chan × pol)
  key; partial aggregation keeps shuffle volume bounded by the key
  cardinality per trigger, identical to the batch plan.
- :func:`stream_append_vis` — append-mode parquet sink (the streaming
  twin of ``write_vis``'s incremental store).

Both return handles the caller starts with ``.trigger(...)``; tests use
``availableNow`` so the stream drains deterministically and must equal
the batch operator on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_time_average(
    stream_df: DataFrame,
    *,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    time: str = "ts",
    keys: tuple[str, ...] = ("bl", "chan", "pol"),
    data: tuple[str, ...] = ("data_re", "data_im"),
    weight: str = "w",
) -> DataFrame:
    """Watermarked tumbling-window weighted mean — streaming twin of
    ``operators.averaging.time_average(width=...)``: per window,
    ``sum(data·w)/sum(w)`` for data columns and ``sum(w)`` carried."""
    aggs = [
        (F.sum(F.col(c) * F.col(weight)) / F.sum(F.when(F.col(c).isNotNull(), F.col(weight))))
        .alias(c) for c in data
    ] + [F.sum(weight).alias(weight), F.count(F.lit(1)).alias("n_samples")]
    return (stream_df
            .withWatermark(time, watermark)
            .groupBy(F.window(F.col(time), window).alias("win"), *keys)
            .agg(*aggs)
            .select(F.col("win.start").alias("win_start"), *keys, *data,
                    weight, "n_samples"))


def stream_append_vis(stream_df: DataFrame, outfile: str, checkpoint: str,
                      partition_by: tuple[str, ...] = ()):
    """Incremental parquet sink (write_vis append twin)."""
    w = stream_df.writeStream.format("parquet") \
        .option("path", outfile).option("checkpointLocation", checkpoint) \
        .outputMode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w
