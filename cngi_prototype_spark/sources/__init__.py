"""Sources & sinks: Parquet vis/image stores plus native zarr interop
(the reference's on-disk format — pure-Python zarr v2 reader/writer,
distributed by chunk)."""

from cngi_prototype_spark.sources.vis_io import (  # noqa: F401
    describe_vis,
    read_vis,
    write_vis,
)
from cngi_prototype_spark.sources.zarr_io import (  # noqa: F401
    describe_zarr_store,
    read_image_zarr,
    read_vis_zarr,
    read_zarr_xds,
    write_image_zarr,
    write_vis_zarr,
    write_zarr_xds,
)
