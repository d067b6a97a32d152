"""Heatmap density tiles — the datashader / Leaflet-heat / kepler.gl
heatmap-layer role: a point table -> per-pixel counts on the global
mercator pixel grid at a zoom -> sum-preserving overview pyramid ->
colorized PNG tiles.

Scale shape (the whole point): the density grid is ONE groupBy count/sum
with map-side partial aggregation — points collapse to at most
256*2^z x 256*2^z pixel cells long before anything shuffles, so 100 TB
of points becomes a bounded pixel census (a z=10 world grid is at most
~68M occupied pixels; real data occupies far fewer). Overviews halve the
pixel index per level (parent pixel = SUM of its 2x2 children, exactly
like the tile pyramid's quadtree parent rule but additive), each level a
narrow (z, gpx, gpy, w) aggregate a quarter the size of the previous.
Rendering touches only OCCUPIED tiles (groupBy tile key ->
applyInPandas), each tile a 256x256 canvas filled from its own pixel
rows; tile PNG bytes never shuffle (they are born in the final stage and
go straight to the sink).

Grid conventions (shared with functions/tilemath — same clamp, same
floor, same TMS row direction so a density pixel lands in EXACTLY the
tile tile_x/tile_y_tms would assign its point to):
  res_z = RES0 / 2^z meters/pixel
  gpx   = clamp(floor((mx + ORIGIN) / res_z), 0, 256*2^z - 1)
  gpy   = clamp(floor((my + ORIGIN) / res_z), 0, 256*2^z - 1)   # from SOUTH
  tile  = (gpx >> 8, gpy >> 8)  [TMS y]
  image row within tile (PNG top-down) = 255 - (gpy & 255)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import tilemath as tm

TILE = tm.TILE


def _gp(m, res: float, n_px: int):
    idx = F.floor((m + F.lit(tm.ORIGIN)) / F.lit(res))
    return F.greatest(F.lit(0), F.least(F.lit(n_px - 1), idx)).cast("long")


def point_density(
    points: DataFrame,
    z: int,
    x_col: str = "mx",
    y_col: str = "my",
    weight_col: str | None = None,
) -> DataFrame:
    """Points (mercator meters) -> (z, gpx, gpy, w) on the global pixel
    grid at zoom ``z``; ``w`` = point count (or sum of ``weight_col``).
    gpy counts from the south edge (TMS row direction). One shuffle."""
    res = tm.RES0 / float(1 << z)
    n_px = TILE * (1 << z)
    w = F.count("*") if weight_col is None else F.sum(weight_col)
    return (
        points.select(
            _gp(F.col(x_col), res, n_px).alias("gpx"),
            _gp(F.col(y_col), res, n_px).alias("gpy"),
            *( [F.col(weight_col)] if weight_col else [] ),
        )
        .groupBy("gpx", "gpy")
        .agg(w.cast("double").alias("w"))
        .select(F.lit(z).cast("long").alias("z"), "gpx", "gpy", "w")
    )


def density_pyramid(base: DataFrame, z_base: int, z_min: int) -> DataFrame:
    """Base density at ``z_base`` -> union of levels z_base .. z_min.
    Parent pixel = SUM of its 2x2 children (gp >> 1 per level), so every
    level preserves the total weight — the additive twin of the tile
    pyramid's quadtree parent rule. Iterative halving: level k shuffles a
    quarter of level k+1's rows."""
    levels = [base]
    cur = base
    z = int(z_base)
    while z > z_min:
        z -= 1
        cur = (
            cur.groupBy(
                F.shiftright("gpx", 1).alias("gpx"),
                F.shiftright("gpy", 1).alias("gpy"),
            )
            .agg(F.sum("w").alias("w"))
            .select(F.lit(z).cast("long").alias("z"), "gpx", "gpy", "w")
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def density_tiles(density: DataFrame) -> DataFrame:
    """(z, gpx, gpy, w) -> (z, x, y [TMS], px [0..255 col], py [0..255
    image row, top-down], w): the per-tile projection of the global grid."""
    return density.select(
        "z",
        F.shiftright("gpx", 8).alias("x"),
        F.shiftright("gpy", 8).alias("y"),
        (F.col("gpx") % TILE).cast("int").alias("px"),
        (F.lit(TILE - 1) - F.col("gpy") % TILE).cast("int").alias("py"),
        "w",
    )


# thermal ramp anchors at t = 0, .25, .5, .75, 1 (RGBA); linear between —
# transparent where there is no weight at all, opaque red at v_max
_RAMP_T = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
_RAMP_RGBA = np.array(
    [(0, 0, 64, 64), (0, 64, 255, 128), (0, 255, 255, 192),
     (255, 255, 0, 255), (255, 0, 0, 255)],
    dtype=np.float64,
)


def ramp_rgba_np(t: np.ndarray) -> np.ndarray:
    """t in [0,1] -> uint8 RGBA via linear interpolation between the ramp
    anchors, round-half-up quantization (shared by render + tests)."""
    t = np.clip(np.asarray(t, np.float64), 0.0, 1.0)
    out = np.empty(t.shape + (4,), np.uint8)
    for c in range(4):
        out[..., c] = np.floor(
            np.interp(t, _RAMP_T, _RAMP_RGBA[:, c]) + 0.5
        ).astype(np.uint8)
    return out


def render_heatmap_tiles(
    tiles_density: DataFrame,
    v_max: float,
    log_scale: bool = True,
    png_level: int = 3,
) -> DataFrame:
    """(z, x, y, px, py, w) -> (z, x, y, tile) RGBA PNG heatmap tiles.
    Intensity t = log1p(w)/log1p(v_max) (or w/v_max linear), clamped to
    [0,1]; pixels with no weight stay fully transparent. Deterministic
    bytes (fixed ramp, round-half-up quantize, repo PNG encoder). Only
    OCCUPIED tiles are rendered; one shuffle on the tile key."""
    if not (v_max > 0):
        raise ValueError("v_max must be > 0")
    v_max = float(v_max)

    def fn(key, pdf):
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        canvas = np.zeros((TILE, TILE, 4), np.uint8)
        w = pdf["w"].to_numpy(np.float64)
        if log_scale:
            t = np.log1p(np.maximum(w, 0.0)) / np.log1p(v_max)
        else:
            t = w / v_max
        rgba = ramp_rgba_np(t)
        canvas[pdf["py"].to_numpy(np.int64), pdf["px"].to_numpy(np.int64)] = rgba
        blob = codecs.encode_png(canvas, level=png_level)
        return pd.DataFrame([[z, x, y, blob]], columns=["z", "x", "y", "tile"])

    return tiles_density.groupBy("z", "x", "y").applyInPandas(
        fn, schema="z long, x long, y long, tile binary"
    )


def heatmap_pyramid(
    points: DataFrame,
    z_base: int,
    z_min: int,
    x_col: str = "mx",
    y_col: str = "my",
    weight_col: str | None = None,
    log_scale: bool = True,
) -> DataFrame:
    """End-to-end: points -> base density at z_base -> sum-preserving
    pyramid down to z_min -> rendered RGBA PNG tiles for every occupied
    tile at every level. v_max is the pyramid-wide max pixel weight (one
    scalar agg) so one color scale spans all zooms — the usual heatmap
    convention (deeper zooms fade, coarser zooms saturate)."""
    base = point_density(points, z_base, x_col=x_col, y_col=y_col,
                         weight_col=weight_col)
    pyr = density_pyramid(base, z_base, z_min).localCheckpoint()
    v_max = pyr.select(F.max("w")).first()[0]
    return render_heatmap_tiles(density_tiles(pyr), v_max=float(v_max),
                                log_scale=log_scale)
