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


def point_sample(
    images: DataFrame,
    points: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    point_id_col: str = "point_id",
) -> DataFrame:
    """Sample raster values at point locations (`gdallocationinfo`
    parity): for every (point, raster-that-covers-it) pair, the value of
    the nearest pixel AND the bilinear interpolation at the point
    (edge-replicate clamp, GDAL convention), as
    (point_id, image_id, value_nearest, value_bilinear).

    Scale shape — points AND rasters can both be large:
    1. a tags-only Arrow pass extracts each raster's georef bbox
       (one narrow row per raster; never decompresses pixels);
    2. points join the broadcast bbox table on half-open containment
       [mx0, mx1) x (my0, my1] (pure Column predicates — a point on a
       shared edge of adjacent rasters lands in exactly one);
    3. a cogroup on image_id decodes each covering raster ONCE and
       samples all its points — bytes never duplicate per point, only
       the narrow point rows shuffle.
    Rasters without EPSG:3857 GeoTIFF georef drop out at stage 1 (the
    NaN-row convention of parse_georef_udf); a blob that fails decode at
    stage 3 yields NaN values for its points (auditable, never silent).
    """
    from ..functions import tilemath as tm
    from ..functions.georef_parsers import parse_georef_udf

    u = parse_georef_udf("geotiff")
    meta = (
        images.withColumn("_g", u(F.col(bytes_col), F.lit(0), F.lit(0)))
        .select(
            F.col(id_col),
            F.col("_g.mx0").alias("_mx0"),
            F.col("_g.my0").alias("_my0"),
            F.col("_g.mx1").alias("_mx1"),
            F.col("_g.my1").alias("_my1"),
        )
        .filter(~F.isnan(F.col("_mx0")))
    )
    pts = points.select(
        F.col(point_id_col),
        tm.merc_x(F.col("lon")).alias("_mx"),
        tm.merc_y(F.col("lat")).alias("_my"),
    )
    cand = pts.join(
        F.broadcast(meta),
        (F.col("_mx") >= F.col("_mx0"))
        & (F.col("_mx") < F.col("_mx1"))
        & (F.col("_my") > F.col("_my0"))
        & (F.col("_my") <= F.col("_my1")),
    ).select(F.col(id_col).alias("_img"), point_id_col, "_mx", "_my")

    def fn(img_pdf: pd.DataFrame, pts_pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions import tiffcodec

        if len(img_pdf) == 0 or len(pts_pdf) == 0:
            return pd.DataFrame(
                columns=[point_id_col, id_col, "value_nearest", "value_bilinear"]
            )
        iid = img_pdf[id_col].iloc[0]
        nan = float("nan")
        try:
            dem, geo = tiffcodec.decode_tiff(
                bytes(img_pdf[bytes_col].iloc[0]), scale_16bit=False
            )
            if geo is None or dem.ndim != 2:
                raise ValueError("not a single-band georeferenced raster")
        except Exception:
            return pd.DataFrame(
                {
                    point_id_col: pts_pdf[point_id_col],
                    id_col: iid,
                    "value_nearest": nan,
                    "value_bilinear": nan,
                }
            )
        h, w = dem.shape
        res = float(geo["gsd"])
        gx0, gy1 = float(geo["mx0"]), float(geo["my1"])
        d = dem.astype(np.float64)
        px = (pts_pdf["_mx"].to_numpy(np.float64) - gx0) / res
        py = (gy1 - pts_pdf["_my"].to_numpy(np.float64)) / res
        cn = np.clip(np.floor(px).astype(np.int64), 0, w - 1)
        rn = np.clip(np.floor(py).astype(np.int64), 0, h - 1)
        nearest = d[rn, cn]
        uu = px - 0.5
        vv = py - 0.5
        c0 = np.floor(uu).astype(np.int64)
        r0 = np.floor(vv).astype(np.int64)
        fc = uu - c0
        fr = vv - r0
        c0c = np.clip(c0, 0, w - 1)
        c1c = np.clip(c0 + 1, 0, w - 1)
        r0c = np.clip(r0, 0, h - 1)
        r1c = np.clip(r0 + 1, 0, h - 1)
        top = d[r0c, c0c] * (1.0 - fc) + d[r0c, c1c] * fc
        bot = d[r1c, c0c] * (1.0 - fc) + d[r1c, c1c] * fc
        bilinear = top * (1.0 - fr) + bot * fr
        return pd.DataFrame(
            {
                point_id_col: pts_pdf[point_id_col],
                id_col: iid,
                "value_nearest": nearest,
                "value_bilinear": bilinear,
            }
        )

    return (
        images.select(id_col, bytes_col)
        .groupBy(id_col)
        .cogroup(cand.groupBy("_img"))
        .applyInPandas(
            fn,
            schema=f"{point_id_col} long, {id_col} string, "
            "value_nearest double, value_bilinear double",
        )
    )


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
