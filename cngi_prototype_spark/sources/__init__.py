"""Sources & sinks (the zarr-store analog, on Parquet)."""

from cngi_prototype_spark.sources.vis_io import (  # noqa: F401
    describe_vis,
    read_vis,
    write_vis,
)
