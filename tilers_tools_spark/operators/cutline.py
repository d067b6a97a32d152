"""Cutline masking — raster<->vector alpha masking (SURVEY.md §2.3 row 18,
BASELINE.json:6 'raster<->vector cutline masking').

The reference applies a map's border polygon as an alpha mask during tile
rendering (gdal_tiler --cut/--cutline [R]; checkout absent, SURVEY.md §0.1).
Engine form: a standalone operator over the tiles DataFrame — polygons are
SMALL by contract (broadcast, BASELINE.json:6), tiles are prefiltered by a
bbox test (Column exprs), and only candidate tiles are decoded; pixels
whose center falls outside every polygon get alpha 0 (even-odd rule);
fully-masked tiles are elided.

Pixel-center containment uses a vectorized even-odd scanline fill in
EPSG:3857 meters: per tile row, edge crossings' x-intersections are sorted
and parity comes from a binary search over the 256 column centers —
O(rows * (E log E + 256 log E)) per tile, pure NumPy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import codecs
from ..functions import tilemath as tm

TILE = tm.TILE


def ring_to_merc(ring) -> np.ndarray:
    """ring = iterable of {lon, lat} -> (E, 2) meters array (closed implicitly)."""
    lon = np.array([v["lon"] for v in ring], dtype=np.float64)
    lat = np.array([v["lat"] for v in ring], dtype=np.float64)
    mx, my = tm.merc_np(lon, lat)
    return np.column_stack([mx, my])


def grid_mask(
    rings_m: list[np.ndarray], gx0: float, gy1: float, res: float, h: int, w: int
) -> np.ndarray:
    """(h, w) bool — pixel center inside ANY ring (even-odd parity per
    ring, union across rings) for a north-up grid whose TOP-left model
    corner is (gx0, gy1) at `res` meters/pixel. The general form of the
    per-tile mask; also the raster side of zonal statistics."""
    cc = np.arange(w, dtype=np.float64)
    mx = gx0 + (cc + 0.5) * res
    mask = np.zeros((h, w), dtype=bool)
    for ring in rings_m:
        x1 = ring[:, 0]
        y1 = ring[:, 1]
        x2 = np.roll(x1, -1)
        y2 = np.roll(y1, -1)
        for r in range(h):
            my = gy1 - (r + 0.5) * res
            crosses = (y1 > my) != (y2 > my)
            if not crosses.any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1[crosses] + (my - y1[crosses]) * (x2[crosses] - x1[crosses]) / (
                    y2[crosses] - y1[crosses]
                )
            xint.sort()
            # parity of #(crossings strictly right of the pixel center)
            n_right = len(xint) - np.searchsorted(xint, mx, side="right")
            mask[r] |= (n_right % 2).astype(bool)
    return mask


def tile_mask(rings_m: list[np.ndarray], z: int, tx: int, ty_tms: int) -> np.ndarray:
    """(256, 256) bool — pixel center inside ANY ring (even-odd), TMS tile."""
    res = tm.RES0 / (2.0**z)
    span = res * TILE
    tmx0 = tx * span - tm.ORIGIN
    tmy1 = (ty_tms + 1) * span - tm.ORIGIN
    return grid_mask(rings_m, tmx0, tmy1, res, TILE, TILE)


def apply_cutline(tiles: DataFrame, polygons: DataFrame, drop_empty: bool = True) -> DataFrame:
    """AND each tile's alpha with the union of cutline polygons.

    Plan shape: bbox prefilter as native Column predicates against the
    broadcast polygon extent list (cheap, prunes the decode), then an
    Arrow-batched mask+re-encode for candidate tiles only. Tiles fully
    outside every polygon are dropped (drop_empty) — the reference's
    empty-tile elision after cutline.
    """
    polys = polygons.select("poly_id", "ring").collect()  # small by contract
    rings_m = [ring_to_merc(p["ring"]) for p in polys]
    boxes = [(r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()) for r in rings_m]

    # tile bbox in meters as Column exprs; keep tiles intersecting any box
    span = tm.resolution(F.col("z")) * F.lit(float(TILE))
    tmx0 = F.col("x").cast("double") * span - F.lit(tm.ORIGIN)
    tmy0 = F.col("y").cast("double") * span - F.lit(tm.ORIGIN)
    tmx1 = tmx0 + span
    tmy1 = tmy0 + span
    cond = F.lit(False)
    for bx0, by0, bx1, by1 in boxes:
        cond = cond | ((tmx0 <= F.lit(bx1)) & (tmx1 >= F.lit(bx0)) & (tmy0 <= F.lit(by1)) & (tmy1 >= F.lit(by0)))
    candidates = tiles.filter(cond)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = []
            new_tiles = []
            for rec in pdf.to_dict("records"):
                blob = bytes(rec["tile"])
                # container sniff: the engine's scale path renders RAW1
                # blobs (render_pyramid(encode='raw')), interop sets PNG —
                # decode whichever arrived, re-encode in the same container
                # (jpeg has no alpha channel, so masked jpeg re-encodes PNG)
                fmt = codecs.sniff_fmt(blob)
                arr = codecs.to_rgba(codecs.decode_image(blob, fmt))
                m = tile_mask(rings_m, int(rec["z"]), int(rec["x"]), int(rec["y"]))
                alpha = arr[:, :, 3] * m
                if drop_empty and not alpha.any():
                    keep.append(False)
                    new_tiles.append(None)
                    continue
                out = arr.copy()
                out[:, :, 3] = alpha
                out[:, :, :3] *= m[:, :, None]
                keep.append(True)
                new_tiles.append(codecs.encode_raw(out) if fmt == "raw" else codecs.encode_tile_png(out))
            res = pdf[np.array(keep, dtype=bool)].copy()
            res["tile"] = [t for t in new_tiles if t is not None]
            yield res

    return candidates.mapInPandas(fn, schema=tiles.schema)
