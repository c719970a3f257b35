"""visplot / implot figure rendering.

Reference parity: ``cngi/vis/visplot.py:21-120`` (thin → scatter/line
of one vis axis against another) and ``cngi/image/implot.py`` (one
image plane as a colormapped raster). The reference opens a matplotlib
window; here the figure goes to a PNG file — matplotlib when the
cluster has it, else the zero-dependency raster backend
(functions/png.py).

Scale contract (same as the reference): the DISTRIBUTED part is the
thinning/selection — ``thin`` stride-decimates on the executors
(visplot.py:56-58's np.ceil(shape/tsize) strides), and only the
decimated points (bounded by ``tsize``) or the ONE selected plane ever
reach the driver for rasterization. Plotting a 100-TB table collects
only the thinned quicklook, never the data.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cngi_prototype_spark.imaging.image_ops import thin


def _have_matplotlib() -> bool:
    try:
        import matplotlib  # noqa: F401
        return True
    except ImportError:
        return False


def visplot(
    df: DataFrame,
    x: str,
    y: str,
    outfile: str,
    *,
    tsize: int = 10_000,
    width: int = 800,
    height: int = 500,
    backend: str | None = None,
) -> dict:
    """Scatter plot of column ``y`` against column ``x`` → PNG.

    ``tsize`` bounds the points collected (visplot.py's thinning
    target): rows are stride-decimated by ``ceil(n / tsize)`` on a
    stable row index before anything leaves the executors. Complex
    pairs: pass the magnitude expression as a column first. Returns
    ``{'points': n, 'backend': ...}``.
    """
    n = df.count()
    stride = max(1, -(-n // int(tsize)))
    pts = df.select(F.col(x).cast("double").alias("x"),
                    F.col(y).cast("double").alias("y"))
    if stride > 1:
        pts = thin(
            pts.withColumn(
                "_i", F.monotonically_increasing_id()), {"_i": stride}
        ).drop("_i")
    pdf = pts.toPandas()
    xs = pdf["x"].to_numpy(np.float64)
    ys = pdf["y"].to_numpy(np.float64)
    ok = np.isfinite(xs) & np.isfinite(ys)
    xs, ys = xs[ok], ys[ok]

    use_mpl = (backend == "matplotlib"
               or (backend is None and _have_matplotlib()))
    if use_mpl:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(width / 100, height / 100))
        ax.plot(xs, ys, ".", markersize=2)
        ax.set_xlabel(x)
        ax.set_ylabel(y)
        fig.savefig(outfile, dpi=100)
        plt.close(fig)
        return {"points": int(xs.size), "backend": "matplotlib"}

    from cngi_prototype_spark.functions.png import (
        draw_text, fmt_tick, write_png)

    canvas = np.full((height, width, 3), 255, np.uint8)
    ml, mr, mt, mb = 60, 15, 15, 30  # margins
    pw, ph = width - ml - mr, height - mt - mb
    if xs.size:
        x0, x1 = float(xs.min()), float(xs.max())
        y0, y1 = float(ys.min()), float(ys.max())
        xr = (x1 - x0) or 1.0
        yr = (y1 - y0) or 1.0
        px = (ml + (xs - x0) / xr * (pw - 1)).astype(int)
        py = (mt + (1.0 - (ys - y0) / yr) * (ph - 1)).astype(int)
        for dx in (0, 1):
            for dy in (0, 1):
                canvas[np.clip(py + dy, 0, height - 1),
                       np.clip(px + dx, 0, width - 1)] = (31, 119, 180)
        # axes + ticks + numeric labels
        canvas[mt + ph, ml:ml + pw] = 0
        canvas[mt:mt + ph, ml - 1] = 0
        for i in range(5):
            fx = x0 + xr * i / 4
            cx = ml + int(i / 4 * (pw - 1))
            canvas[mt + ph:mt + ph + 4, cx] = 0
            draw_text(canvas, cx - 12, mt + ph + 8, fmt_tick(fx))
            fy = y0 + yr * i / 4
            cy = mt + int((1 - i / 4) * (ph - 1))
            canvas[cy, ml - 5:ml] = 0
            draw_text(canvas, 2, cy - 3, fmt_tick(fy))
    write_png(outfile, canvas)
    return {"points": int(xs.size), "backend": "png"}


def implot(
    image_df: DataFrame,
    outfile: str,
    *,
    value: str = "image",
    chan: int = 0,
    pol: int = 0,
    scale: int = 1,
    backend: str | None = None,
) -> dict:
    """Render ONE (chan, pol) image plane as a colormapped raster →
    PNG (implot parity). Only that plane's rows are collected — the
    plane filter prunes at the scan. ``scale`` integer-zooms small
    planes. Returns ``{'shape': (n_m, n_l), 'vmin':, 'vmax':, ...}``.
    """
    pdf = (image_df.filter((F.col("chan") == chan)
                           & (F.col("pol") == pol))
           .select("l_idx", "m_idx", F.col(value).cast("double"))
           .toPandas())
    if not len(pdf):
        raise ValueError(f"no pixels for chan={chan} pol={pol}")
    n_l = int(pdf["l_idx"].max()) + 1
    n_m = int(pdf["m_idx"].max()) + 1
    plane = np.full((n_m, n_l), np.nan)
    plane[pdf["m_idx"].to_numpy(int), pdf["l_idx"].to_numpy(int)] = \
        pdf[value].to_numpy(np.float64)
    finite = plane[np.isfinite(plane)]
    vmin = float(finite.min()) if finite.size else 0.0
    vmax = float(finite.max()) if finite.size else 1.0

    use_mpl = (backend == "matplotlib"
               or (backend is None and _have_matplotlib()))
    if use_mpl:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        im = ax.imshow(plane, origin="lower", cmap="viridis")
        fig.colorbar(im)
        fig.savefig(outfile, dpi=100)
        plt.close(fig)
        return {"shape": (n_m, n_l), "vmin": vmin, "vmax": vmax,
                "backend": "matplotlib"}

    from cngi_prototype_spark.functions.png import colormap, write_png

    norm = (plane - vmin) / ((vmax - vmin) or 1.0)
    rgb = colormap(norm.reshape(-1)).reshape(n_m, n_l, 3)
    rgb = rgb[::-1]  # origin='lower'
    if scale > 1:
        rgb = np.repeat(np.repeat(rgb, scale, 0), scale, 1)
    write_png(outfile, rgb)
    return {"shape": (n_m, n_l), "vmin": vmin, "vmax": vmax,
            "backend": "png"}
