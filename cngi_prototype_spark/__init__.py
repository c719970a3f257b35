"""cngi_prototype_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of casangi/cngi_prototype.

The reference (``/root/reference``, cngi_prototype v1.0.1) is an
xarray+dask+zarr engine over dense labeled N-D visibility/image cubes.
This package re-expresses that operator surface Spark-first:

- dense ``(time, baseline, chan, pol)`` cubes -> **long-form DataFrames**
  (one row per sample; NaN padding becomes row absence, see SURVEY.md §1.5)
- dask lazy graphs -> Spark lazy logical plans optimized by Catalyst
- numba chunk kernels -> built-in ``pyspark.sql.functions`` where the
  semantics are relational, Arrow-batched pandas UDFs where they are not
- the mxds "dataset of datasets" -> a catalog of fact + dimension tables
  (:mod:`cngi_prototype_spark.catalog`)

Subpackages
-----------
operators   vis/image operators (averaging, flagging, joins, stats, fits)
sources     read/write/describe over Parquet (zarr-store analog)
functions   column-expression libraries (complex pairs, exact aggs, text)
plans       plan-inspection and scale-audit helpers
streaming   Structured-Streaming variants of batch operators
"""

__version__ = "0.1.0"

from cngi_prototype_spark.session import initialize_framework  # noqa: F401
from cngi_prototype_spark.schema import VisSchema  # noqa: F401
