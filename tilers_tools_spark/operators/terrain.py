"""Terrain derivatives over DEM rasters — gdaldem-family parity
(hillshade / slope / aspect), pure NumPy kernels + an Arrow-batched
DataFrame operator.

The reference toolchain tiles charts; its sibling workflow shades DEMs
(gdaldem hillshade) before tiling. With Float32/Int16 GeoTIFF ingestion
in functions/tiffcodec.py this engine can run that step distributed: one
mapInPandas-style pass per DEM blob, no shuffle (every raster is
independent), shaded uint8 output feeding the ordinary tile pipeline.

Math (documented first-principles form of Horn's method; equivalent to
the gdaldem formulation):

* gradients by Horn's 3x3 weighted differences with edge replication,
  `p = dz/dx` toward EAST, `qn = dz/dy` toward NORTH (row index grows
  southward, so the north gradient is top-minus-bottom), both divided
  by 8 * gsd;
* surface normal n ∝ (-p, -qn, 1); light unit vector from azimuth
  (degrees clockwise from north) and altitude (degrees above horizon)
  l = (sin(az)cos(alt), cos(az)cos(alt), sin(alt));
* hillshade = clip(round(255 * max(0, n·l)), 0, 255) as uint8
  (round half up);
* hillshade -combined (gdaldem -combined analogue, documented engine
  form): shade = clip(1 - acos(clip(n·l, -1, 1)) * atan(hypot(p, qn))
  / (pi/2)^2, 0, 1) — oblique shading damped by slope steepness — then
  the same 255 scaling. (gdaldem remaps non-positive shade to gray 1;
  this engine keeps the plain clip — deliberate documented deviation.)
* hillshade -multidirectional (Mark 1992, USGS OFR 92-422 analogue):
  azimuths {225, 270, 315, 360} at the given altitude, weighted by
  w_i = sin^2(aspect_rad - az_i_rad); since the four azimuths are 45
  degrees apart, sum(w_i) = 2 identically, so
  shade = sum(w_i * max(0, n·l_i)) / 2 (flat cells: every shade equals
  sin(alt) and the weights still sum to 2, so the output is the flat
  standard value — no special case);
* slope = atan(z_factor * hypot(p, qn)) in DEGREES (float64);
* aspect = degrees(atan2(-p, -qn)) mod 360 — the compass direction the
  slope FACES (downhill): 0 = north, 90 = east; flat cells -> NaN.

Correctness: hand-derived integer pins on analytic surfaces (flat
plane, uniform east/north ramps) in tests/test_terrain.py; the driver
gate (dem_hillshade query) recomputes the analytic DEM surface directly
— independent of the TIFF codec — and reuses this kernel per the
documented golden scope (tools/make_golden_sql.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _horn_gradients(dem: np.ndarray, gsd: float) -> tuple[np.ndarray, np.ndarray]:
    """Horn 3x3 weighted gradients with edge replication ->
    (p = dz/dx eastward, qn = dz/dy northward), float64."""
    z = np.pad(np.asarray(dem, dtype=np.float64), 1, mode="edge")
    # z[r, c]: r grows southward, c grows eastward
    left = z[:-2, :-2] + 2.0 * z[1:-1, :-2] + z[2:, :-2]
    right = z[:-2, 2:] + 2.0 * z[1:-1, 2:] + z[2:, 2:]
    top = z[:-2, :-2] + 2.0 * z[:-2, 1:-1] + z[:-2, 2:]
    bottom = z[2:, :-2] + 2.0 * z[2:, 1:-1] + z[2:, 2:]
    p = (right - left) / (8.0 * gsd)
    qn = (top - bottom) / (8.0 * gsd)
    return p, qn


def hillshade_np(
    dem: np.ndarray,
    gsd: float,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    z_factor: float = 1.0,
    mode: str = "standard",
) -> np.ndarray:
    """Horn hillshade -> uint8 (H, W). See module docstring for the
    exact documented formulas (shared verbatim with the golden oracle).
    `mode`: standard | combined | multidirectional (the gdaldem trio;
    multidirectional ignores `azimuth` per the Mark 1992 method)."""
    p, qn = _horn_gradients(dem, gsd)
    p = p * z_factor
    qn = qn * z_factor
    alt = np.deg2rad(altitude)
    norm = np.sqrt(1.0 + p * p + qn * qn)

    def ndotl(az_deg: float) -> np.ndarray:
        az = np.deg2rad(az_deg)
        lx = np.sin(az) * np.cos(alt)
        ly = np.cos(az) * np.cos(alt)
        lz = np.sin(alt)
        return (-p * lx - qn * ly + lz) / norm

    if mode == "standard":
        shade = np.maximum(ndotl(azimuth), 0.0)
    elif mode == "combined":
        nd = np.clip(ndotl(azimuth), -1.0, 1.0)
        shade = 1.0 - np.arccos(nd) * np.arctan(np.hypot(p, qn)) / (
            (np.pi / 2.0) ** 2
        )
        shade = np.clip(shade, 0.0, 1.0)
    elif mode == "multidirectional":
        aspect = np.arctan2(-p, -qn)
        acc = np.zeros_like(p)
        for az_deg in (225.0, 270.0, 315.0, 360.0):
            wgt = np.sin(aspect - np.deg2rad(az_deg)) ** 2
            acc = acc + wgt * np.maximum(ndotl(az_deg), 0.0)
        shade = acc / 2.0  # sum of the four sin^2 weights is exactly 2
    else:
        raise ValueError(
            f"unknown hillshade mode {mode!r} (standard|combined|multidirectional)"
        )
    return np.clip(np.floor(255.0 * shade + 0.5), 0.0, 255.0).astype(np.uint8)


def slope_np(dem: np.ndarray, gsd: float, z_factor: float = 1.0) -> np.ndarray:
    """Slope in degrees, float64 (gdaldem slope equivalent)."""
    p, qn = _horn_gradients(dem, gsd)
    return np.degrees(np.arctan(z_factor * np.hypot(p, qn)))


def aspect_np(dem: np.ndarray, gsd: float, flat_eps: float = 1e-12) -> np.ndarray:
    """Downhill compass direction in degrees (0 = north, 90 = east),
    NaN on flat cells (gradient magnitude < flat_eps)."""
    p, qn = _horn_gradients(dem, gsd)
    a = np.degrees(np.arctan2(-p, -qn)) % 360.0
    a[np.hypot(p, qn) < flat_eps] = np.nan
    return a


def _neighbor_diffs(dem: np.ndarray) -> np.ndarray:
    """(8, H, W) float64 of z_neighbor - z_center for the 8-connected
    neighborhood, edge-replicated (replicated neighbors contribute 0)."""
    z = np.pad(np.asarray(dem, dtype=np.float64), 1, mode="edge")
    h, w = z.shape[0] - 2, z.shape[1] - 2
    c = z[1:-1, 1:-1]
    offs = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    return np.stack([z[1 + dr : 1 + dr + h, 1 + dc : 1 + dc + w] - c for dr, dc in offs])


def tri_np(dem: np.ndarray, algorithm: str = "riley") -> np.ndarray:
    """Terrain Ruggedness Index (gdaldem TRI equivalents, float64):
    'riley' (Riley et al. 1999, the gdaldem default) = sqrt of the sum of
    squared center-to-neighbor elevation differences; 'wilson' (Wilson
    et al. 2007) = mean absolute center-to-neighbor difference. Elevation
    units; gsd-independent by definition."""
    d = _neighbor_diffs(dem)
    if algorithm == "riley":
        return np.sqrt(np.sum(d * d, axis=0))
    if algorithm == "wilson":
        return np.sum(np.abs(d), axis=0) / 8.0
    raise ValueError(f"unknown TRI algorithm {algorithm!r} (riley|wilson)")


def tpi_np(dem: np.ndarray) -> np.ndarray:
    """Topographic Position Index (gdaldem TPI): z_center minus the mean
    of the 8 neighbors — positive on ridges, negative in valleys,
    float64. Equals -mean(neighbor - center)."""
    return -np.mean(_neighbor_diffs(dem), axis=0)


def roughness_np(dem: np.ndarray) -> np.ndarray:
    """Roughness (gdaldem roughness): max - min over the 3x3 window
    INCLUDING the center cell, float64."""
    d = _neighbor_diffs(dem)
    # window extrema relative to center: max(0, max d) - min(0, min d)
    return np.maximum(d.max(axis=0), 0.0) - np.minimum(d.min(axis=0), 0.0)


def dem_hillshade(
    dems: DataFrame,
    azimuth: float = 315.0,
    altitude: float = 45.0,
    z_factor: float = 1.0,
    mode: str = "standard",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Distributed gdaldem-hillshade: each row's blob is a GeoTIFF DEM
    (any layout tiffcodec reads — Float32/Int16, tiled/strip/planar);
    emits (id, w, h, gsd, shade_sum, shade_md5) per raster. One
    Arrow-batched projection, no shuffle (rasters are independent) —
    the 100 TB shape is identical to the image-decode path. Unreadable
    or georef-less rows surface as (-1, -1, NaN, -1, '') (the auditable
    NaN-row convention)."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("gsd", DoubleType()),
            StructField("shade_sum", LongType()),
            StructField("shade_md5", StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.DataFrame:
        import hashlib

        from ..functions import tiffcodec

        rows = []
        for b in blobs:
            try:
                dem, geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                if geo is None:
                    raise ValueError("DEM without GeoTIFF georef")
                if dem.ndim != 2:
                    raise ValueError("DEM must be single-band")
                sh = hillshade_np(
                    dem, float(geo["gsd"]), azimuth, altitude, z_factor, mode
                )
                rows.append(
                    (
                        int(sh.shape[1]),
                        int(sh.shape[0]),
                        float(geo["gsd"]),
                        int(np.sum(sh, dtype=np.int64)),
                        hashlib.md5(sh.tobytes()).hexdigest(),
                    )
                )
            except Exception:
                rows.append((-1, -1, float("nan"), -1, ""))
        return pd.DataFrame(rows, columns=["w", "h", "gsd", "shade_sum", "shade_md5"])

    return dems.withColumn("s", udf(F.col(bytes_col))).select(
        id_col, "s.w", "s.h", "s.gsd", "s.shade_sum", "s.shade_md5"
    )


def dem_terrain_metrics(
    dems: DataFrame,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Distributed gdaldem TRI/TPI/roughness over GeoTIFF DEM blobs —
    the remaining three gdaldem modes, same shuffle-free shape as
    dem_hillshade: one Arrow-batched projection, rasters independent.
    Emits per raster (id, w, h, tri_riley_sum, tri_wilson_sum,
    tpi_abs_sum, rough_sum, metrics_md5) where the sums are float64
    rounded to 6 decimals and metrics_md5 is the md5 of the four metric
    rasters' concatenated float64 bytes (riley | wilson | tpi |
    roughness). Unreadable rows surface as (-1, -1, nan x4, '')."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("tri_riley_sum", DoubleType()),
            StructField("tri_wilson_sum", DoubleType()),
            StructField("tpi_abs_sum", DoubleType()),
            StructField("rough_sum", DoubleType()),
            StructField("metrics_md5", StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.DataFrame:
        import hashlib

        from ..functions import tiffcodec

        nan = float("nan")
        rows = []
        for b in blobs:
            try:
                dem, _geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                if dem.ndim != 2:
                    raise ValueError("DEM must be single-band")
                riley = tri_np(dem, "riley")
                wilson = tri_np(dem, "wilson")
                tpi = tpi_np(dem)
                rough = roughness_np(dem)
                md5 = hashlib.md5(
                    riley.tobytes() + wilson.tobytes() + tpi.tobytes() + rough.tobytes()
                ).hexdigest()
                rows.append(
                    (
                        int(dem.shape[1]),
                        int(dem.shape[0]),
                        round(float(riley.sum()), 6),
                        round(float(wilson.sum()), 6),
                        round(float(np.abs(tpi).sum()), 6),
                        round(float(rough.sum()), 6),
                        md5,
                    )
                )
            except Exception:
                rows.append((-1, -1, nan, nan, nan, nan, ""))
        return pd.DataFrame(
            rows,
            columns=[
                "w", "h", "tri_riley_sum", "tri_wilson_sum",
                "tpi_abs_sum", "rough_sum", "metrics_md5",
            ],
        )

    return dems.withColumn("s", udf(F.col(bytes_col))).select(
        id_col, "s.w", "s.h", "s.tri_riley_sum", "s.tri_wilson_sum",
        "s.tpi_abs_sum", "s.rough_sum", "s.metrics_md5",
    )


def dem_derivatives(
    dems: DataFrame,
    ramp: list[tuple[float, int, int, int]],
    z_factor: float = 1.0,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Distributed gdaldem slope + aspect + color-relief in one
    shuffle-free Arrow pass (rasters independent). Emits per raster
    (id, w, h, slope_sum, slope_md5, aspect_flat_n, aspect_md5,
    relief_md5): slope_sum is the float64 degree sum rounded to 6
    decimals; the md5s hash the float64 slope raster, the float64
    aspect raster (flat cells are NaN — the quiet-NaN payload np.nan
    produces is deterministic), and the uint8 RGB color-relief raster
    for the given ramp. Needs the GeoTIFF gsd (slope/aspect are
    gradient-based); georef-less or unreadable rows surface as
    (-1, -1, nan, '', -1, '', '')."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    ramp_lit = [(float(e), int(r), int(g), int(b)) for e, r, g, b in ramp]
    schema = StructType(
        [
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("slope_sum", DoubleType()),
            StructField("slope_md5", StringType()),
            StructField("aspect_flat_n", IntegerType()),
            StructField("aspect_md5", StringType()),
            StructField("relief_md5", StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.DataFrame:
        import hashlib

        from ..functions import tiffcodec

        rows = []
        for b in blobs:
            try:
                dem, geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                if geo is None:
                    raise ValueError("DEM without GeoTIFF georef")
                if dem.ndim != 2:
                    raise ValueError("DEM must be single-band")
                gsd = float(geo["gsd"])
                sl = slope_np(dem, gsd, z_factor)
                asp = aspect_np(dem, gsd)
                rel = color_relief_np(dem, ramp_lit)
                rows.append(
                    (
                        int(dem.shape[1]),
                        int(dem.shape[0]),
                        round(float(sl.sum()), 6),
                        hashlib.md5(sl.tobytes()).hexdigest(),
                        int(np.isnan(asp).sum()),
                        hashlib.md5(asp.tobytes()).hexdigest(),
                        hashlib.md5(rel.tobytes()).hexdigest(),
                    )
                )
            except Exception:
                rows.append((-1, -1, float("nan"), "", -1, "", ""))
        return pd.DataFrame(
            rows,
            columns=["w", "h", "slope_sum", "slope_md5",
                     "aspect_flat_n", "aspect_md5", "relief_md5"],
        )

    return dems.withColumn("s", udf(F.col(bytes_col))).select(
        id_col, "s.w", "s.h", "s.slope_sum", "s.slope_md5",
        "s.aspect_flat_n", "s.aspect_md5", "s.relief_md5",
    )


# ---------------------------------------------------------------------------
# gdal_contour parity — marching squares
# ---------------------------------------------------------------------------

# case index bits (corner ABOVE level): TL=8, TR=4, BR=2, BL=1.
# Each entry lists the (edge, edge) pairs a cell contributes; T/B/L/R are
# the cell's top/bottom/left/right edges. Saddles (5, 10) are resolved by
# the standard center-average rule and handled separately below.
_MS_CASES: dict[int, list[tuple[str, str]]] = {
    1: [("L", "B")], 14: [("L", "B")],
    2: [("B", "R")], 13: [("B", "R")],
    4: [("T", "R")], 11: [("T", "R")],
    8: [("T", "L")], 7: [("T", "L")],
    3: [("L", "R")], 12: [("L", "R")],
    6: [("T", "B")], 9: [("T", "B")],
}


def contour_segments_np(dem: np.ndarray, level: float) -> np.ndarray:
    """Marching-squares contour of `dem` at `level` -> (N, 4) float64
    segments (x0, y0, x1, y1) in PIXEL coordinates (x = column, y = row;
    grid nodes at integer coords). First-principles form of the
    algorithm gdal_contour implements:

    * a corner is inside iff z > level (strict, so levels off the grid
      values are unambiguous);
    * crossing points interpolate linearly along cell edges,
      t = (level - z0) / (z1 - z0);
    * the 16-case table connects crossings (see _MS_CASES); the two
      saddle cases (5 = TR+BL, 10 = TL+BR) disambiguate on the cell's
      center average: center inside joins the two inside corners.

    Fully vectorized: one boolean classification + one gather per case,
    no Python loop over cells."""
    z = np.asarray(dem, dtype=np.float64)
    if z.ndim != 2 or z.shape[0] < 2 or z.shape[1] < 2:
        return np.zeros((0, 4), dtype=np.float64)
    zt0, zt1 = z[:-1, :-1], z[:-1, 1:]
    zb0, zb1 = z[1:, :-1], z[1:, 1:]
    b = z > level
    idx = (
        (b[:-1, :-1].astype(np.int8) << 3)
        | (b[:-1, 1:].astype(np.int8) << 2)
        | (b[1:, 1:].astype(np.int8) << 1)
        | b[1:, :-1].astype(np.int8)
    )
    h, w = idx.shape
    jj, ii = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    with np.errstate(divide="ignore", invalid="ignore"):
        pts = {
            "T": (jj + (level - zt0) / (zt1 - zt0), ii),
            "B": (jj + (level - zb0) / (zb1 - zb0), ii + 1.0),
            "L": (jj, ii + (level - zt0) / (zb0 - zt0)),
            "R": (jj + 1.0, ii + (level - zt1) / (zb1 - zt1)),
        }
    segs = []

    def gather(mask: np.ndarray, pairs: list[tuple[str, str]]) -> None:
        if not mask.any():
            return
        for ea, eb in pairs:
            xa, ya = pts[ea]
            xb, yb = pts[eb]
            segs.append(
                np.column_stack((xa[mask], ya[mask], xb[mask], yb[mask]))
            )

    for case, pairs in _MS_CASES.items():
        gather(idx == case, pairs)
    center_in = (zt0 + zt1 + zb0 + zb1) / 4.0 > level
    # 5 = TR+BL inside: center in -> (T,L)+(B,R); out -> (T,R)+(L,B)
    gather((idx == 5) & center_in, [("T", "L"), ("B", "R")])
    gather((idx == 5) & ~center_in, [("T", "R"), ("L", "B")])
    # 10 = TL+BR inside: center in -> (T,R)+(L,B); out -> (T,L)+(B,R)
    gather((idx == 10) & center_in, [("T", "R"), ("L", "B")])
    gather((idx == 10) & ~center_in, [("T", "L"), ("B", "R")])
    if not segs:
        return np.zeros((0, 4), dtype=np.float64)
    return np.concatenate(segs, axis=0)


def contour_stats_np(dem: np.ndarray, level: float, gsd: float = 1.0) -> tuple[int, float, str]:
    """(n_segments, total_len, seg_md5) for one raster/level — the
    summary the distributed operator and the golden both emit.
    total_len is in georef units (pixel length x gsd), rounded to 6
    decimals; seg_md5 hashes the canonical segment list (each segment
    oriented so its lexicographically smaller endpoint comes first, rows
    sorted, coords formatted %.9f) so it is order- and
    partitioning-independent."""
    import hashlib

    segs = contour_segments_np(dem, level)
    if len(segs):
        a, bpt = segs[:, :2], segs[:, 2:]
        flip = (a[:, 0] > bpt[:, 0]) | ((a[:, 0] == bpt[:, 0]) & (a[:, 1] > bpt[:, 1]))
        canon = np.where(flip[:, None], np.column_stack((bpt, a)), segs)
        order = np.lexsort((canon[:, 3], canon[:, 2], canon[:, 1], canon[:, 0]))
        canon = canon[order]
        total = float(np.hypot(canon[:, 2] - canon[:, 0], canon[:, 3] - canon[:, 1]).sum() * gsd)
        txt = ";".join("%.9f,%.9f,%.9f,%.9f" % tuple(row) for row in canon)
    else:
        canon, total, txt = segs, 0.0, ""
    return int(len(segs)), round(total, 6), hashlib.md5(txt.encode()).hexdigest()


def dem_contour(
    dems: DataFrame,
    levels: list[float],
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Distributed gdal_contour: each row's blob is a GeoTIFF DEM; emits
    one row per (raster, level) — (id, level, n_segments, total_len,
    seg_md5). Same shuffle-free shape as the other terrain ops: rasters
    are independent, one Arrow-batched projection, the per-level fanout
    is a cheap in-UDF loop (levels is a small driver-side literal).
    Lengths are in georef units when the TIFF carries a GeoTIFF gsd,
    pixel units otherwise. Unreadable rows surface once per level as
    (-1, nan, '')."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    lv = [float(x) for x in levels]
    schema = ArrayType(
        StructType(
            [
                StructField("level", DoubleType()),
                StructField("n_segments", IntegerType()),
                StructField("total_len", DoubleType()),
                StructField("seg_md5", StringType()),
            ]
        )
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.Series:
        from ..functions import tiffcodec

        out = []
        for b in blobs:
            try:
                dem, geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                if dem.ndim != 2:
                    raise ValueError("DEM must be single-band")
                gsd = float(geo["gsd"]) if geo else 1.0
                out.append(
                    [(x, *contour_stats_np(dem, x, gsd)) for x in lv]
                )
            except Exception:
                out.append([(x, -1, float("nan"), "") for x in lv])
        return pd.Series(out)

    return (
        dems.withColumn("c", F.explode(udf(F.col(bytes_col))))
        .select(
            id_col, "c.level", "c.n_segments", "c.total_len", "c.seg_md5"
        )
    )


def contour_lines_np(dem: np.ndarray, level: float) -> list[list[tuple[float, float]]]:
    """Chain the marching-squares segment soup into maximal POLYLINES —
    the LineString geometry gdal_contour actually emits (this closes the
    documented ring-tracing deviation of the region-table ops).

    Canonical-form SPEC (shared with the independent golden tracer in
    tools/make_golden_sql.py — both must emit bit-identical chains):

    * vertices match on EXACT float64 equality (a shared cell edge yields
      the identical crossing arithmetic in both adjacent cells, so no
      rounding is needed); zero-length segments are dropped first;
    * a chain is a maximal path through vertices of degree exactly 2;
      any vertex of degree != 2 (contour through a grid node -> up to 4
      incident segments) is a BREAKPOINT ending chains on all sides —
      maximal paths under this rule are unique regardless of algorithm;
    * components whose every vertex has degree 2 are CLOSED rings: the
      point list starts at the lexicographically smallest (x, y) vertex,
      runs in the direction whose second vertex is lexicographically
      smaller than the last vertex, and repeats the start point at the
      end (WKT closure);
    * open chains are oriented so the lexicographically smaller endpoint
      comes first.

    Returns the list of chains (each a list of (x, y) pixel coords),
    sorted lexicographically by their full point sequence.
    """
    segs = contour_segments_np(dem, level)
    pt = lambda x, y: (float(x), float(y))  # noqa: E731
    edges = []
    for x0, y0, x1, y1 in segs:
        a, b = pt(x0, y0), pt(x1, y1)
        if a != b:
            edges.append((a, b))
    inc: dict = {}
    for i, (a, b) in enumerate(edges):
        inc.setdefault(a, []).append(i)
        inc.setdefault(b, []).append(i)
    used = [False] * len(edges)

    def other(i: int, v):
        a, b = edges[i]
        return b if v == a else a

    def walk(start_edge: int, start_v):
        """Consume the maximal chain leaving start_v over start_edge."""
        chain = [start_v]
        i, v = start_edge, start_v
        while True:
            used[i] = True
            v = other(i, v)
            chain.append(v)
            if len(inc[v]) != 2:
                break
            j = [e for e in inc[v] if not used[e]]
            if not j:
                break
            i = j[0]
        return chain

    chains = []
    # open chains: grow from every breakpoint (degree != 2) vertex
    for v, eids in inc.items():
        if len(eids) == 2:
            continue
        for i in eids:
            if not used[i]:
                chains.append(walk(i, v))
    # what remains is cycles (all-degree-2 components)
    for i in range(len(edges)):
        if not used[i]:
            chains.append(walk(i, edges[i][0]))

    canon = []
    for c in chains:
        if c[0] == c[-1] and len(c) > 2:  # closed ring
            ring = c[:-1]
            k = ring.index(min(ring))
            ring = ring[k:] + ring[:k]
            if len(ring) > 2 and ring[-1] < ring[1]:
                ring = [ring[0]] + ring[:0:-1]
            canon.append(ring + [ring[0]])
        else:
            canon.append(c if c[0] <= c[-1] else c[::-1])
    canon.sort()
    return canon


def contour_lines_stats(
    dem: np.ndarray, level: float, gsd: float = 1.0
) -> tuple[int, int, int, float, str]:
    """(n_lines, n_closed, n_points, total_len, wkt_md5) for one
    raster/level. total_len is in georef units rounded to 6 decimals;
    wkt_md5 hashes '\\n'.join of the canonical LINESTRING texts (%.9f
    coords) — partitioning- and algorithm-independent by the spec above."""
    import hashlib

    chains = contour_lines_np(dem, level)
    wkts = [
        "LINESTRING (" + ", ".join("%.9f %.9f" % p for p in c) + ")" for c in chains
    ]
    n_closed = sum(1 for c in chains if c[0] == c[-1] and len(c) > 2)
    n_points = sum(len(c) for c in chains)
    # LEFT-TO-RIGHT scalar math.hypot accumulation in canonical chain
    # order — the golden tracer sums in exactly this order, so the
    # round(·, 6) comparison is bit-identical by construction (a NumPy
    # pairwise sum could land an ulp away on a rounding boundary)
    import math

    total = 0.0
    for c in chains:
        for (xa, ya), (xb, yb) in zip(c, c[1:]):
            total += math.hypot(xb - xa, yb - ya)
    md5 = hashlib.md5("\n".join(wkts).encode()).hexdigest()
    return len(chains), n_closed, n_points, round(total * gsd, 6), md5


def contour_lines(
    dems: DataFrame,
    levels: list[float],
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    include_wkt: bool = False,
) -> DataFrame:
    """Distributed gdal_contour LineString output: one row per
    (raster, level) with the canonical polyline summary — or, with
    `include_wkt=True`, one row per POLYLINE carrying the WKT text
    (the interop surface; the summary md5 stays the gate contract).
    Same shuffle-free per-raster Arrow shape as dem_contour; unreadable
    rows surface as (-1, ...) / empty-wkt rows, auditable."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    lv = [float(x) for x in levels]
    if include_wkt:
        wschema = ArrayType(
            StructType(
                [
                    StructField("level", DoubleType()),
                    StructField("line_idx", IntegerType()),
                    StructField("closed", IntegerType()),
                    StructField("wkt", StringType()),
                ]
            )
        )

        @F.pandas_udf(wschema)
        def wudf(blobs: pd.Series) -> pd.Series:
            from ..functions import tiffcodec

            out = []
            for b in blobs:
                rows = []
                try:
                    dem, _geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                    if dem.ndim != 2:
                        raise ValueError("DEM must be single-band")
                    for x in lv:
                        for k, c in enumerate(contour_lines_np(dem, x)):
                            closed = int(c[0] == c[-1] and len(c) > 2)
                            wkt = (
                                "LINESTRING ("
                                + ", ".join("%.9f %.9f" % p for p in c)
                                + ")"
                            )
                            rows.append((x, k, closed, wkt))
                except Exception:
                    rows = [(x, -1, -1, "") for x in lv]
                out.append(rows)
            return pd.Series(out)

        return dems.withColumn("c", F.explode(wudf(F.col(bytes_col)))).select(
            id_col, "c.level", "c.line_idx", "c.closed", "c.wkt"
        )

    schema = ArrayType(
        StructType(
            [
                StructField("level", DoubleType()),
                StructField("n_lines", IntegerType()),
                StructField("n_closed", IntegerType()),
                StructField("n_points", IntegerType()),
                StructField("total_len", DoubleType()),
                StructField("wkt_md5", StringType()),
            ]
        )
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.Series:
        from ..functions import tiffcodec

        out = []
        for b in blobs:
            try:
                dem, geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                if dem.ndim != 2:
                    raise ValueError("DEM must be single-band")
                gsd = float(geo["gsd"]) if geo else 1.0
                out.append([(x, *contour_lines_stats(dem, x, gsd)) for x in lv])
            except Exception:
                out.append([(x, -1, -1, -1, float("nan"), "") for x in lv])
        return pd.Series(out)

    return dems.withColumn("c", F.explode(udf(F.col(bytes_col)))).select(
        id_col, "c.level", "c.n_lines", "c.n_closed", "c.n_points",
        "c.total_len", "c.wkt_md5",
    )


def color_relief_np(dem: np.ndarray, ramp: list[tuple[float, int, int, int]]) -> np.ndarray:
    """gdaldem color-relief: elevation -> RGB through a piecewise-LINEAR
    color ramp (the default gdaldem interpolation). `ramp` is a list of
    (elevation, r, g, b) stops sorted ascending; elevations below the
    first stop clamp to it, above the last clamp to that, and between
    stops each channel interpolates linearly with round-half-up
    quantization. Returns uint8 (H, W, 3)."""
    stops = sorted(ramp)
    if len(stops) < 2:
        raise ValueError("color ramp needs at least 2 stops")
    elev = np.array([s[0] for s in stops], dtype=np.float64)
    if len(np.unique(elev)) != len(elev):
        raise ValueError("color ramp stops must have distinct elevations")
    rgb = np.array([s[1:] for s in stops], dtype=np.float64)  # (n, 3)
    z = np.asarray(dem, dtype=np.float64)
    # idx of the UPPER stop for each cell, clamped to [1, n-1]
    hi = np.clip(np.searchsorted(elev, z, side="right"), 1, len(elev) - 1)
    lo = hi - 1
    z0, z1 = elev[lo], elev[hi]
    t = np.clip((z - z0) / (z1 - z0), 0.0, 1.0)[..., None]
    out = rgb[lo] + t * (rgb[hi] - rgb[lo])
    return np.clip(np.floor(out + 0.5), 0.0, 255.0).astype(np.uint8)


# ---------------------------------------------------------------------------
# web-DEM tile encodings: Terrarium (Mapzen) and Mapbox Terrain-RGB
# ---------------------------------------------------------------------------


def terrain_rgb_encode_np(dem: np.ndarray, encoding: str = "terrarium") -> np.ndarray:
    """Elevation grid -> RGBA per the two PUBLISHED web-DEM tile
    encodings (hand-pinned KATs in tests/test_terrain.py):

    * ``terrarium`` (Mapzen): v' = v + 32768; R = floor(v'/256),
      G = floor(v') mod 256, B = floor(frac(v') * 256) — 1/256 m
      quantization, domain clipped to [-32768, 32768 - 1/256].
    * ``mapbox`` Terrain-RGB: q = round((v + 10000) * 10) packed
      big-endian into R<<16 | G<<8 | B — 0.1 m quantization, domain
      clipped to [-10000, (2^24 - 1)/10 - 10000].

    Neither published format has a nodata code: NaN cells emit alpha 0
    (rgb 0), finite cells alpha 255 — the engine's auditable convention,
    inverted exactly by terrain_rgb_decode_np."""
    z = np.asarray(dem, dtype=np.float64)
    nan = np.isnan(z)
    out = np.zeros((*z.shape, 4), np.uint8)
    out[:, :, 3] = np.where(nan, 0, 255)
    zf = np.where(nan, 0.0, z)
    if encoding == "terrarium":
        v = np.clip(zf + 32768.0, 0.0, 65536.0 - 1.0 / 256.0)
        whole = np.floor(v)
        out[:, :, 0] = (whole // 256).astype(np.uint8)
        out[:, :, 1] = (whole % 256).astype(np.uint8)
        out[:, :, 2] = np.floor((v - whole) * 256.0).astype(np.uint8)
    elif encoding == "mapbox":
        q = np.clip(np.floor((zf + 10000.0) * 10.0 + 0.5), 0.0, 2.0**24 - 1.0)
        q = q.astype(np.int64)
        out[:, :, 0] = (q >> 16).astype(np.uint8)
        out[:, :, 1] = ((q >> 8) & 0xFF).astype(np.uint8)
        out[:, :, 2] = (q & 0xFF).astype(np.uint8)
    else:
        raise ValueError(f"unknown terrain encoding {encoding!r} (terrarium|mapbox)")
    out[nan, :3] = 0
    return out


def terrain_rgb_decode_np(rgba: np.ndarray, encoding: str = "terrarium") -> np.ndarray:
    """Inverse of terrain_rgb_encode_np: RGBA (or RGB, treated opaque)
    -> float64 elevations, alpha-0 cells -> NaN."""
    a = np.asarray(rgba)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError(f"terrain tile needs RGB(A), got shape {a.shape}")
    r = a[:, :, 0].astype(np.float64)
    g = a[:, :, 1].astype(np.float64)
    b = a[:, :, 2].astype(np.float64)
    if encoding == "terrarium":
        z = r * 256.0 + g + b / 256.0 - 32768.0
    elif encoding == "mapbox":
        z = -10000.0 + (r * 65536.0 + g * 256.0 + b) * 0.1
    else:
        raise ValueError(f"unknown terrain encoding {encoding!r} (terrarium|mapbox)")
    if a.shape[2] == 4:
        z = np.where(a[:, :, 3] == 0, np.nan, z)
    return z


def dem_terrain_rgb(
    dems: DataFrame,
    encoding: str = "terrarium",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Distributed web-DEM tile encoding: GeoTIFF DEM blobs -> Terrarium
    or Mapbox Terrain-RGB rasters, emitting per-raster (w, h, encoding,
    rgb_md5, n_nodata, err_max) where err_max is the measured
    max |decode(encode(v)) - v| over finite cells — bounded by the
    format's published quantization step (1/256 m or 0.1 m). Same
    shuffle-free Arrow shape as the other per-raster operators;
    unreadable rows carry the -1/NaN sentinels."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("rgb_md5", StringType()),
            StructField("n_nodata", LongType()),
            StructField("err_max", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.DataFrame:
        import hashlib

        from ..functions import tiffcodec

        rows = []
        for b in blobs:
            try:
                dem, _geo = tiffcodec.decode_tiff(bytes(b), scale_16bit=False)
                if dem.ndim != 2:
                    raise ValueError("DEM must be single-band")
                rgba = terrain_rgb_encode_np(dem, encoding)
                back = terrain_rgb_decode_np(rgba, encoding)
                finite = ~np.isnan(dem)
                err = (
                    float(np.max(np.abs(back[finite] - np.asarray(dem, np.float64)[finite])))
                    if finite.any()
                    else 0.0
                )
                rows.append(
                    (
                        int(dem.shape[1]),
                        int(dem.shape[0]),
                        hashlib.md5(rgba.tobytes()).hexdigest(),
                        int((~finite).sum()),
                        err,
                    )
                )
            except Exception:
                rows.append((-1, -1, "", -1, float("nan")))
        return pd.DataFrame(rows, columns=["w", "h", "rgb_md5", "n_nodata", "err_max"])

    return dems.withColumn("t", udf(F.col(bytes_col))).select(
        id_col,
        F.lit(encoding).alias("encoding"),
        "t.w", "t.h", "t.rgb_md5", "t.n_nodata", "t.err_max",
    )


def dem_tile_np(
    dem: np.ndarray,
    geo: dict,
    z: int,
    tx: int,
    ty_tms: int,
    tile: int = 256,
    resample: str = "nearest",
) -> np.ndarray:
    """Sample one TMS tile's elevation grid (float64 [tile, tile], row 0
    = tile top) from a north-up EPSG:3857 DEM. Fully AFFINE mapping (no
    transcendentals): dest pixel center mx = tile_mx0 + (c+0.5)*res,
    my = tile_my1 - (r+0.5)*res; continuous source coords sx =
    (mx - geo.mx0)/gsd, sy = (geo.my1 - my)/gsd — the raster_translate
    conventions. nearest = floor, valid iff the floor cell is inside;
    bilinear samples at (s - 0.5) with edge-replicate clamp and NaN
    OUTSIDE the source footprint (no extrapolation past the edge row).
    Cells off the DEM come back NaN (-> alpha 0 after terrain-RGB)."""
    from ..functions import tilemath as tm

    h, w = dem.shape
    res = float(tm.resolution_np(z)) * (256.0 / tile)
    span = float(tm.resolution_np(z)) * tm.TILE
    tmx0 = tx * span - tm.ORIGIN
    tmy1 = (ty_tms + 1) * span - tm.ORIGIN
    mx = tmx0 + (np.arange(tile, dtype=np.float64) + 0.5) * res
    my = tmy1 - (np.arange(tile, dtype=np.float64) + 0.5) * res
    sx = (mx - float(geo["mx0"])) / float(geo["gsd"])
    sy = (float(geo["my1"]) - my) / float(geo["gsd"])
    zf = np.asarray(dem, dtype=np.float64)
    if resample == "nearest":
        ci = np.floor(sx).astype(np.int64)
        ri = np.floor(sy).astype(np.int64)
        valid = ((ci >= 0) & (ci < w))[None, :] & ((ri >= 0) & (ri < h))[:, None]
        out = zf[np.clip(ri, 0, h - 1)[:, None], np.clip(ci, 0, w - 1)[None, :]]
    elif resample == "bilinear":
        uu = sx - 0.5
        vv = sy - 0.5
        c0 = np.floor(uu).astype(np.int64)
        r0 = np.floor(vv).astype(np.int64)
        fc = (uu - c0)[None, :]
        fr = (vv - r0)[:, None]
        c0c = np.clip(c0, 0, w - 1)[None, :]
        c1c = np.clip(c0 + 1, 0, w - 1)[None, :]
        r0c = np.clip(r0, 0, h - 1)[:, None]
        r1c = np.clip(r0 + 1, 0, h - 1)[:, None]
        top = zf[r0c, c0c] * (1.0 - fc) + zf[r0c, c1c] * fc
        bot = zf[r1c, c0c] * (1.0 - fc) + zf[r1c, c1c] * fc
        out = top * (1.0 - fr) + bot * fr
        valid = ((sx >= 0.0) & (sx < w))[None, :] & ((sy >= 0.0) & (sy < h))[:, None]
    else:
        raise ValueError(f"unknown resample {resample!r} (nearest|bilinear)")
    return np.where(valid, out, np.nan)


def dem_tiles(
    dems: DataFrame,
    zooms: tuple[int, ...],
    encoding: str = "terrarium",
    tile: int = 256,
    resample: str = "nearest",
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Web-DEM tile pyramid (the rio-rgbify / Mapzen-joerd role): each
    EPSG:3857 GeoTIFF DEM -> Terrarium/Mapbox Terrain-RGB PNG tiles at
    the requested zooms, emitting (image_id, z, x, y TMS, n_valid,
    tile_md5, tile). Every zoom resamples the SOURCE raster (gdal2tiles
    'raster profile' behavior, documented deviation from child-averaging
    overviews); all-NaN tiles are elided like the image pyramid's empty
    tiles. One Arrow pass per DEM; tiles of one raster never shuffle —
    the same scale shape as plans/tile_pyramid. Output feeds the
    existing sinks (write_tileset_dir / MBTiles) unchanged."""
    import hashlib

    from ..functions import codecs, tilemath as tm

    zooms = tuple(int(z) for z in zooms)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    dem, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                    if geo is None or geo.get("epsg") != 3857:
                        raise ValueError("dem_tiles needs EPSG:3857 GeoTIFF DEMs")
                    if dem.ndim != 2:
                        raise ValueError("DEM must be single-band")
                except Exception:
                    rows.append((iid, -1, -1, -1, -1, "", b""))
                    continue
                h, w = dem.shape
                gmx1 = geo["mx0"] + w * geo["gsd"]
                gmy0 = geo["my1"] - h * geo["gsd"]
                for zz in zooms:
                    x0, x1, y0, y1 = tm.cover_range_np(
                        geo["mx0"], gmy0, gmx1, geo["my1"], zz
                    )
                    for ty in range(int(y0), int(y1) + 1):
                        for txx in range(int(x0), int(x1) + 1):
                            elev = dem_tile_np(
                                dem, geo, zz, txx, ty, tile=tile, resample=resample
                            )
                            n_valid = int((~np.isnan(elev)).sum())
                            if n_valid == 0:
                                continue  # empty-tile elision
                            rgba = terrain_rgb_encode_np(elev, encoding)
                            png = codecs.encode_tile_png(rgba)
                            rows.append(
                                (
                                    iid, zz, txx, ty, n_valid,
                                    hashlib.md5(png).hexdigest(), png,
                                )
                            )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "z", "x", "y", "n_valid", "tile_md5", "tile"],
            )

    return dems.select(id_col, bytes_col).mapInPandas(
        fn,
        schema="image_id string, z int, x long, y long, n_valid long, "
        "tile_md5 string, tile binary",
    )


# ---------------------------------------------------------------------------
# gdal_viewshed parity: ring-stepped line-of-sight visibility
# ---------------------------------------------------------------------------

VIS_VISIBLE = 255
VIS_HIDDEN = 0
VIS_NODATA = 1


def viewshed_np(
    dem: np.ndarray, obs_rc: tuple[int, int], obs_height: float = 0.0
) -> np.ndarray:
    """Line-of-sight viewshed under an EXACT documented rule (deviation
    from gdal_viewshed's edge-interpolating Wang et al. algorithm —
    interpolation-free sampling keeps the contract cross-implementation
    reproducible):

    * the sight line from observer cell (r0,c0) to target (r,c) is
      sampled at K-1 steps, K = chebyshev(dr,dc): at step k the sample
      cell is (floor(r0 + k*dr/K + 0.5), floor(c0 + k*dc/K + 0.5));
      samples that round to the observer or the target cell are skipped;
    * slope to a cell = (z - z_obs) / d, d = sqrt of the cell's SQUARED
      integer pixel distance (uniform gsd cancels in comparisons);
      z_obs = dem[r0,c0] + obs_height;
    * target visible iff EVERY sample slope <= the target slope
      (non-strict, so grazing flat terrain stays visible — the
      gdal_viewshed convention); a NaN sample (nodata) blocks the ray;
      a NaN target is VIS_NODATA; the observer is visible by definition.

    Vectorized as one masked pass per step index over all pixels
    simultaneously (running max of sample slopes); every operation is
    elementwise IEEE float64, so a scalar per-pixel replay of the same
    formulas is bit-identical.
    """
    h, w = dem.shape
    r0, c0 = int(obs_rc[0]), int(obs_rc[1])
    if not (0 <= r0 < h and 0 <= c0 < w):
        raise ValueError(f"observer {obs_rc} outside raster {dem.shape}")
    z = dem.astype(np.float64)
    z0 = float(z[r0, c0])
    if np.isnan(z0):
        raise ValueError("observer cell is nodata")
    z0 = z0 + float(obs_height)
    rr = np.arange(h, dtype=np.int64)[:, None] + np.zeros((1, w), np.int64)
    cc = np.arange(w, dtype=np.int64)[None, :] + np.zeros((h, 1), np.int64)
    dr = rr - r0
    dc = cc - c0
    K = np.maximum(np.abs(dr), np.abs(dc))
    d_t = np.sqrt((dr * dr + dc * dc).astype(np.float64))
    with np.errstate(invalid="ignore", divide="ignore"):
        slope_t = (z - z0) / np.where(K > 0, d_t, 1.0)
    max_s = np.full((h, w), -np.inf)
    for k in range(1, int(K.max())):
        act = K > k  # pixels with sample index k strictly inside
        if not act.any():
            break
        with np.errstate(invalid="ignore", divide="ignore"):
            fr = r0 + (k * dr) / np.where(act, K, 1)
            fc = c0 + (k * dc) / np.where(act, K, 1)
        ri = np.floor(fr + 0.5).astype(np.int64)
        ci = np.floor(fc + 0.5).astype(np.int64)
        skip = ((ri == r0) & (ci == c0)) | ((ri == rr) & (ci == cc))
        d2 = (ri - r0) ** 2 + (ci - c0) ** 2
        zi = z[np.clip(ri, 0, h - 1), np.clip(ci, 0, w - 1)]
        with np.errstate(invalid="ignore", divide="ignore"):
            s = (zi - z0) / np.sqrt(np.where(d2 > 0, d2, 1).astype(np.float64))
        s = np.where(act & ~skip, s, -np.inf)
        max_s = np.maximum(max_s, s)  # NaN sample propagates -> blocks
    vis = np.where(
        np.isnan(z),
        VIS_NODATA,
        np.where(
            (K == 0) | (~np.isnan(max_s) & (max_s <= slope_t)),
            VIS_VISIBLE,
            VIS_HIDDEN,
        ),
    ).astype(np.uint8)
    return vis


def viewshed(
    images: DataFrame,
    observers: DataFrame,
    obs_height: float = 0.0,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_viewshed` parity over a table of (raster, observer) pairs:
    `observers` carries (image_id, obs_row, obs_col); each pair yields
    one summary row (image_id, obs_row, obs_col, n_visible, n_hidden,
    n_nodata, vis_md5) where the md5 covers the uint8 visibility grid
    (255 visible / 0 hidden / 1 nodata).

    Scale shape: observers broadcast-join to their raster, each (raster,
    observer) is an independent Arrow-batched task; pixels never
    shuffle. Many observers against one raster decode it once per batch
    row (DEM bytes ship once per observer — acceptable while observer
    lists are small; the gdal_viewshed CLI is one-observer-per-run).
    """
    import hashlib

    joined = images.select(id_col, bytes_col).join(
        F.broadcast(observers.select(id_col, "obs_row", "obs_col")), id_col
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob, orow, ocol in zip(
                pdf[id_col], pdf[bytes_col], pdf["obs_row"], pdf["obs_col"]
            ):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("viewshed expects single-band rasters")
                vis = viewshed_np(a.astype(np.float64), (int(orow), int(ocol)), obs_height)
                rows.append(
                    (
                        iid, int(orow), int(ocol),
                        int((vis == VIS_VISIBLE).sum()),
                        int((vis == VIS_HIDDEN).sum()),
                        int((vis == VIS_NODATA).sum()),
                        hashlib.md5(np.ascontiguousarray(vis).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "obs_row", "obs_col", "n_visible", "n_hidden",
                    "n_nodata", "vis_md5",
                ],
            )

    return joined.mapInPandas(
        fn,
        schema=f"{id_col} string, obs_row int, obs_col int, n_visible long, "
        "n_hidden long, n_nodata long, vis_md5 string",
    )


def contour_bands(
    dems: DataFrame,
    levels: tuple[float, ...],
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_contour -p` (polygon/band output) parity as a region table:
    classify every DEM cell into elevation bands — band k = number of
    ``levels`` <= value (so band 0 is below the first level, band
    len(levels) above the last; non-finite cells get band -1, auditable
    not dropped) — then extract 4-connected equal-band regions with the
    shared region kernel (zonal.region_summary_np). One row per region:
    (image_id, region_id, band, n_pixels, bbox, perimeter) — the same
    deterministic canonical-id / 4-edge-perimeter contract as
    polygonize, with `band` standing in for the utility's
    (min_level, max_level] polygon attributes.

    Scale shape: per-raster independent Arrow pass, narrow rows out,
    pixels never shuffle."""
    lv = sorted(float(x) for x in levels)
    if not lv:
        raise ValueError("contour_bands needs at least one level")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec
        from .zonal import region_summary_np

        for pdf in it:
            out: dict[str, list] = {
                id_col: [], "region_id": [], "band": [], "n_pixels": [],
                "min_row": [], "min_col": [], "max_row": [], "max_col": [],
                "perimeter": [],
            }
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                dem, _geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if dem.ndim != 2:
                    raise ValueError("contour_bands expects single-band DEMs")
                d = dem.astype(np.float64)
                finite = np.isfinite(d)
                band = np.full(d.shape, -1, np.int64)
                # band = count of levels <= v (right-continuous bins)
                band[finite] = np.searchsorted(
                    np.asarray(lv, np.float64), d[finite], side="right"
                )
                ids, vals, npix, minr, minc, maxr, maxc, perim = region_summary_np(band)
                out[id_col].extend([iid] * len(ids))
                out["region_id"].extend(ids.tolist())
                out["band"].extend(np.asarray(vals, np.int64).tolist())
                out["n_pixels"].extend(npix.tolist())
                out["min_row"].extend(minr.tolist())
                out["min_col"].extend(minc.tolist())
                out["max_row"].extend(maxr.tolist())
                out["max_col"].extend(maxc.tolist())
                out["perimeter"].extend(perim.tolist())
            yield pd.DataFrame(out)

    return dems.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, region_id long, band long, n_pixels long, "
        "min_row long, min_col long, max_row long, max_col long, perimeter long",
    )


D8_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def flow_accumulation(images, threshold_band: int = 0):
    """D8 flow direction + flow accumulation (O'Callaghan & Mark 1984;
    the ESRI FlowDirection/FlowAccumulation and GRASS r.watershed
    role) over integer DEM rasters, fully deterministic:

    * Flow direction: each cell points at the 8-neighbor with the
      STEEPEST positive drop. Slopes compare EXACTLY via the integer
      key drop² · (3 - dist²) — slope² = drop²/dist² with dist² in
      {1, 2} put over the common denominator 2 — valid because drops
      are filtered positive first (squaring is monotone there). Ties
      break on the fixed neighbor order NW,N,NE,W,E,SW,S,SE
      (documented). Cells with no positive drop are PITS/flats (no
      outflow).
    * Accumulation: the number of cells draining through (upstream
      count, ESRI convention — self excluded). The flow graph is a
      forest (one out-edge, strictly downhill ⇒ acyclic), so the
      count is exact.

    Emits one row per cell: (image_id, r, c, acc, is_pit) — exact
    integers, replayable by a ROW_NUMBER-over-the-integer-key edge
    derivation plus a recursive-CTE reachability count. One Arrow
    mapInPandas pass; per-image Kahn propagation; pixels never
    shuffle.
    """
    from typing import Iterator as _It

    import pandas as _pd

    from ..functions import codecs as _codecs

    def fn(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "r", "c", "acc", "is_pit")}
            for rec in pdf.itertuples():
                arr = _codecs.decode_image(bytes(rec.bytes), rec.fmt)
                dem = arr[:, :, threshold_band].astype(np.int64)
                h, w = dem.shape
                tgt = {}
                for r in range(h):
                    for c in range(w):
                        best = None  # (key, priority, (rr, cc))
                        for pri, (dr, dc) in enumerate(D8_OFFS):
                            rr, cc = r + dr, c + dc
                            if not (0 <= rr < h and 0 <= cc < w):
                                continue
                            drop = int(dem[r, c]) - int(dem[rr, cc])
                            if drop <= 0:
                                continue
                            dist2 = dr * dr + dc * dc
                            key = drop * drop * (3 - dist2)
                            if best is None or key > best[0]:
                                best = (key, pri, (rr, cc))
                        if best is not None:
                            tgt[(r, c)] = best[2]
                indeg = {}
                for s, d in tgt.items():
                    indeg[d] = indeg.get(d, 0) + 1
                acc = {}
                from collections import deque as _dq

                q = _dq(
                    (r, c) for r in range(h) for c in range(w)
                    if (r, c) not in indeg
                )
                indeg2 = dict(indeg)
                while q:
                    cell = q.popleft()
                    a = acc.get(cell, 0)
                    d = tgt.get(cell)
                    if d is not None:
                        acc[d] = acc.get(d, 0) + a + 1
                        indeg2[d] -= 1
                        if indeg2[d] == 0:
                            q.append(d)
                for r in range(h):
                    for c in range(w):
                        out["image_id"].append(rec.image_id)
                        out["r"].append(r)
                        out["c"].append(c)
                        out["acc"].append(acc.get((r, c), 0))
                        out["is_pit"].append((r, c) not in tgt)
            yield _pd.DataFrame(out)

    return images.mapInPandas(
        fn, schema="image_id string, r int, c int, acc long, is_pit boolean")
