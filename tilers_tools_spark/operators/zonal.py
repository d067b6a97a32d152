"""Zonal statistics — per-polygon raster aggregation (the gdal-adjacent
zonal-analysis op: rasterstats / `gdal_rasterize`+stats parity; reference
checkout absent, SURVEY.md §0.1 — the capability follows the cutline
raster<->vector mandate, BASELINE.json:6).

For each zone polygon, aggregate the DEM values of every pixel whose
CENTER falls inside the polygon (even-odd rule, identical boundary
semantics to the cutline mask — `cutline.grid_mask` is the shared
kernel) across all rasters that overlap it.

Scale shape (the 100 TB design):
* zones are SMALL by contract (same contract as cutline polygons) —
  collected once and shipped in the UDF closure (broadcast);
* each raster is decoded ONCE in an Arrow-batched `mapInPandas` pass and
  reduced to per-(zone, raster) PARTIALS (count/sum/min/max) — the
  classic map-side combine: raster bytes never shuffle, only the tiny
  partial rows do;
* a zone's polygon is only rasterized against images whose georef bbox
  intersects its bbox (cheap reject before any mask work);
* the final `groupBy(poly_id)` merges partials — a shuffle of
  O(zones x rasters) narrow rows, nothing pixel-sized.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cutline import grid_mask, ring_to_merc


def zonal_stats(
    images: DataFrame,
    zones: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Per-zone DEM statistics over GeoTIFF rasters.

    `images`: (id, bytes) rows where each blob is a single-band GeoTIFF
    DEM (any layout tiffcodec reads — Float32/Int16/uint8, tiled/strip,
    raw values via scale_16bit=False). Rasters without a GeoTIFF georef
    or with >1 band are skipped (they contribute no pixels — auditable
    via the per-zone pixel counts).

    `zones`: (poly_id string, ring array<struct<lon:double,lat:double>>)
    — multiple rows with one poly_id union their rings (even-odd within
    each ring, so a keyhole ring cuts holes).

    Returns (poly_id, n_pixels, min_elev, max_elev, sum_elev, mean_elev)
    for every zone covering at least one pixel center.
    """
    polys = zones.select("poly_id", "ring").collect()  # small by contract
    by_zone: dict[str, list[np.ndarray]] = {}
    for p in polys:
        by_zone.setdefault(str(p["poly_id"]), []).append(ring_to_merc(p["ring"]))
    zone_list = [
        (
            pid,
            rings,
            (
                min(r[:, 0].min() for r in rings),
                min(r[:, 1].min() for r in rings),
                max(r[:, 0].max() for r in rings),
                max(r[:, 1].max() for r in rings),
            ),
        )
        for pid, rings in sorted(by_zone.items())
    ]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in batches:
            out: list[tuple] = []
            for blob in pdf[bytes_col]:
                try:
                    dem, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                    if geo is None or dem.ndim != 2:
                        continue
                except Exception:
                    continue
                h, w = dem.shape
                res = float(geo["gsd"])
                gx0, gy1 = float(geo["mx0"]), float(geo["my1"])
                ix1, iy0 = gx0 + w * res, gy1 - h * res
                for pid, rings, (bx0, by0, bx1, by1) in zone_list:
                    if bx0 > ix1 or bx1 < gx0 or by0 > gy1 or by1 < iy0:
                        continue
                    m = grid_mask(rings, gx0, gy1, res, h, w)
                    if not m.any():
                        continue
                    vals = dem[m].astype(np.float64)
                    out.append(
                        (pid, int(vals.size), float(np.sum(vals)),
                         float(vals.min()), float(vals.max()))
                    )
            yield pd.DataFrame(out, columns=["poly_id", "n", "s", "mn", "mx"])

    partials = images.select(bytes_col).mapInPandas(
        fn, schema="poly_id string, n long, s double, mn double, mx double"
    )
    return (
        partials.groupBy("poly_id")
        .agg(
            F.sum("n").alias("n_pixels"),
            F.min("mn").alias("min_elev"),
            F.max("mx").alias("max_elev"),
            F.sum("s").alias("sum_elev"),
        )
        .withColumn("mean_elev", F.col("sum_elev") / F.col("n_pixels"))
    )
