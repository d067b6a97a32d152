"""`gdal_merge.py` parity — georeferenced raster mosaic (reference
checkout absent, SURVEY.md §0.1; capability follows the GDAL-utility
mandate, BASELINE.json:6).

gdal_merge composites N georeferenced rasters into one output whose
extent is the union of the inputs, later files overwriting earlier ones
and nodata transparent. This engine's contract (documented deviations,
all fail-loud):

* all inputs must share one gsd and sit on ONE aligned pixel lattice
  (offsets integer multiples of gsd) — gdal_merge silently resamples;
  we raise, because silent resampling inside a mosaic is exactly the
  kind of georef bug the NaN-row convention exists to surface;
* nodata is NaN (the Float32 convention used across the zonal family);
* overwrite order is the explicit ``seq`` column, ascending (gdal_merge
  uses command-line file order — an explicit column is the distributed
  equivalent).

Scale shape (the 100 TB design): the output grid is computed from a
narrow tags-only metadata pass (4 aggregate scalars to the driver — no
pixels); the target distributes as horizontal BANDS like rasterize/
grid_idw; each raster's bytes join to just the bands its y-extent
overlaps (broadcast band table, pure Column range predicate), so a
raster's blob ships to O(overlapping bands) tasks and pixels never
shuffle again; each band composites its rasters in seq order inside one
`applyInPandas` group and emits a narrow quantized summary row.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .zonal import GRID_SENT

_EPS = 1e-6


def mosaic(
    images: DataFrame,
    n_bands: int = 4,
    quant: float = 1e-3,
    id_col: str = "image_id",
    seq_col: str = "seq",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Composite georeferenced single-band rasters into one union-extent
    grid, later ``seq`` overwriting earlier on valid (non-NaN) pixels.

    Returns one row per output band: (band, y0, band_h, out_w, out_h,
    n_rasters, n_valid, n_nodata, q_sum, q_min, q_max, band_md5) — q_*
    over the band's VALID pixels quantized to ``quant``; the md5 covers
    the full quantized band with never-written cells as GRID_SENT.
    """
    import hashlib

    from ..functions.georef_parsers import parse_georef_udf

    spark = images.sparkSession
    u = parse_georef_udf("geotiff")
    meta = (
        images.withColumn("_g", u(F.col(bytes_col), F.lit(0), F.lit(0)))
        .select(
            id_col,
            seq_col,
            F.col("_g.gsd").alias("_gsd"),
            F.col("_g.mx0").alias("_mx0"),
            F.col("_g.my0").alias("_my0"),
            F.col("_g.mx1").alias("_mx1"),
            F.col("_g.my1").alias("_my1"),
        )
    )
    mrows = meta.collect()  # narrow: one georef row per raster
    if not mrows:
        raise ValueError("mosaic: no input rasters")
    bad = [
        str(r[id_col])
        for r in mrows
        if r["_mx0"] is None or not np.isfinite(float(r["_mx0"]))
    ]
    if bad:
        raise ValueError(f"mosaic: rasters without EPSG:3857 georef: {bad}")
    gsd = float(mrows[0]["_gsd"])
    for r in mrows:
        if abs(float(r["_gsd"]) - gsd) > _EPS:
            raise ValueError(
                f"mosaic: raster {r[id_col]!r} gsd {r['_gsd']} != {gsd} "
                "(resampling is out of scope — warp first)"
            )
    mx0 = min(float(r["_mx0"]) for r in mrows)
    my1 = max(float(r["_my1"]) for r in mrows)
    out_w = int(round((max(float(r["_mx1"]) for r in mrows) - mx0) / gsd))
    out_h = int(round((my1 - min(float(r["_my0"]) for r in mrows)) / gsd))
    for r in mrows:
        for off in (
            (float(r["_mx0"]) - mx0) / gsd,
            (my1 - float(r["_my1"])) / gsd,
        ):
            if abs(off - round(off)) > _EPS:
                raise ValueError(
                    f"mosaic: raster {r[id_col]!r} is not on the shared "
                    f"pixel lattice (fractional offset {off})"
                )

    band_h = (out_h + n_bands - 1) // n_bands
    bands = [
        (b, b * band_h, min(band_h, out_h - b * band_h))
        for b in range(n_bands)
        if min(band_h, out_h - b * band_h) > 0
    ]
    bdf = spark.createDataFrame(bands, "band int, y0 int, band_h int")

    # route each raster to the bands its row-extent overlaps: row range
    # of raster r is [row0, row0 + h) in output coordinates
    routed = (
        images.select(id_col, seq_col, bytes_col)
        .join(meta.select(id_col, "_my0", "_my1"), id_col)
        .withColumn("_row0", F.round((F.lit(my1) - F.col("_my1")) / F.lit(gsd)).cast("long"))
        .withColumn("_row1", F.round((F.lit(my1) - F.col("_my0")) / F.lit(gsd)).cast("long"))
        .join(
            F.broadcast(bdf),
            (F.col("_row0") < F.col("y0") + F.col("band_h"))
            & (F.col("_row1") > F.col("y0")),
        )
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions import tiffcodec

        band = int(pdf["band"].iloc[0])
        y0 = int(pdf["y0"].iloc[0])
        bh = int(pdf["band_h"].iloc[0])
        canvas = np.full((bh, out_w), np.nan)
        for _, row in pdf.sort_values("seq").iterrows():
            a, geo = tiffcodec.decode_tiff(bytes(row[bytes_col]), scale_16bit=False)
            if a.ndim != 2:
                raise ValueError(f"mosaic: raster {row[id_col]!r} is not single-band")
            a = a.astype(np.float64)
            h, w = a.shape
            row0 = int(round((my1 - float(geo["my1"])) / gsd))
            col0 = int(round((float(geo["mx0"]) - mx0) / gsd))
            sy0 = max(0, y0 - row0)
            sy1 = min(h, y0 + bh - row0)
            if sy1 <= sy0:
                continue
            ty0 = row0 + sy0 - y0
            src = a[sy0:sy1, :]
            dst = canvas[ty0 : ty0 + (sy1 - sy0), col0 : col0 + w]
            ok = ~np.isnan(src)
            dst[ok] = src[ok]
        valid = ~np.isnan(canvas)
        q = np.where(
            valid, np.round(np.where(valid, canvas, 0.0) / quant), GRID_SENT
        ).astype(np.int64)
        ok = q[valid]
        return pd.DataFrame(
            [
                (
                    band, y0, bh, out_w, out_h, int(pdf[id_col].nunique()),
                    int(valid.sum()), int((~valid).sum()),
                    int(ok.sum()) if ok.size else 0,
                    int(ok.min()) if ok.size else 0,
                    int(ok.max()) if ok.size else 0,
                    hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                )
            ],
            columns=[
                "band", "y0", "band_h", "out_w", "out_h", "n_rasters",
                "n_valid", "n_nodata", "q_sum", "q_min", "q_max", "band_md5",
            ],
        )

    return routed.groupBy("band").applyInPandas(
        fn,
        schema="band int, y0 int, band_h int, out_w int, out_h int, "
        "n_rasters int, n_valid long, n_nodata long, "
        "q_sum long, q_min long, q_max long, band_md5 string",
    )
