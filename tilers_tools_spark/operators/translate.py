"""`gdal_translate` parity — windowed crop, resize, linear rescale
(reference checkout absent, SURVEY.md §0.1; capability follows the
GDAL-utility mandate, BASELINE.json:6).

Covers the gdal_translate workhorse flags as one distributed operator:
``-srcwin xoff yoff xsize ysize`` (integer crop, must lie fully inside
the raster — gdal_translate pads partially-outside windows with nodata
and warns; we raise instead, fail-loud), ``-outsize w h`` (nearest or
bilinear resampling under the documented center-mapping rule below) and
``-scale src_min src_max dst_min dst_max`` (linear map + clamp).

Resampling rule (documented, implementation-independent):
* the destination pixel (xd, yd) maps to source coordinate
  xs = (xd + 0.5) * xsize / out_w (same for y);
* nearest takes src index min(size-1, floor(xs)) — GDAL's block rule;
* bilinear samples at (xs - 0.5) with edge-replicate clamp — the same
  convention as point_sample/`gdallocationinfo`.
Every operation is elementwise IEEE float64, so a scalar per-pixel
replay of the formulas is bit-identical; the 1e-3-quantized summary
(NaN -> GRID_SENT sentinel) pins the md5 cross-engine.

Scale shape: per-raster independent Arrow pass (the gdal_translate unit
of work is one file); pixels never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .zonal import GRID_SENT


def translate_np(
    a: np.ndarray,
    srcwin: tuple[int, int, int, int] | None = None,
    outsize: tuple[int, int] | None = None,
    resample: str = "nearest",
    scale: tuple[float, float, float, float] | None = None,
) -> np.ndarray:
    """Apply the gdal_translate pipeline to one float array:
    crop -> resize -> linear rescale (see module docstring)."""
    h, w = a.shape
    if srcwin is not None:
        xoff, yoff, xsize, ysize = (int(v) for v in srcwin)
        if xoff < 0 or yoff < 0 or xsize <= 0 or ysize <= 0 or xoff + xsize > w or yoff + ysize > h:
            raise ValueError(f"srcwin {srcwin} not fully inside raster {a.shape}")
        a = a[yoff : yoff + ysize, xoff : xoff + xsize]
        h, w = a.shape
    a = a.astype(np.float64)
    if outsize is not None:
        out_w, out_h = int(outsize[0]), int(outsize[1])
        if out_w <= 0 or out_h <= 0:
            raise ValueError(f"outsize {outsize} must be positive")
        xd = np.arange(out_w, dtype=np.float64)
        yd = np.arange(out_h, dtype=np.float64)
        xs = (xd + 0.5) * w / out_w
        ys = (yd + 0.5) * h / out_h
        if resample == "nearest":
            ci = np.minimum(w - 1, np.floor(xs).astype(np.int64))
            ri = np.minimum(h - 1, np.floor(ys).astype(np.int64))
            a = a[ri[:, None], ci[None, :]]
        elif resample == "bilinear":
            uu = xs - 0.5
            vv = ys - 0.5
            c0 = np.floor(uu).astype(np.int64)
            r0 = np.floor(vv).astype(np.int64)
            fc = (uu - c0)[None, :]
            fr = (vv - r0)[:, None]
            c0c = np.clip(c0, 0, w - 1)[None, :]
            c1c = np.clip(c0 + 1, 0, w - 1)[None, :]
            r0c = np.clip(r0, 0, h - 1)[:, None]
            r1c = np.clip(r0 + 1, 0, h - 1)[:, None]
            top = a[r0c, c0c] * (1.0 - fc) + a[r0c, c1c] * fc
            bot = a[r1c, c0c] * (1.0 - fc) + a[r1c, c1c] * fc
            a = top * (1.0 - fr) + bot * fr
        else:
            raise ValueError(f"unknown resample {resample!r} (nearest|bilinear)")
    if scale is not None:
        smin, smax, dmin, dmax = (float(v) for v in scale)
        if smax == smin:
            raise ValueError("scale src_min == src_max")
        a = dmin + (a - smin) * ((dmax - dmin) / (smax - smin))
        lo, hi = (dmin, dmax) if dmax >= dmin else (dmax, dmin)
        a = np.minimum(np.maximum(a, lo), hi)  # NaN passes through both
    return a


def raster_translate(
    images: DataFrame,
    srcwin: tuple[int, int, int, int] | None = None,
    outsize: tuple[int, int] | None = None,
    resample: str = "nearest",
    scale: tuple[float, float, float, float] | None = None,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_translate` parity over a table of rasters: one summary row
    per raster — (image_id, out_w, out_h, n_nan, q_sum, q_min, q_max,
    grid_md5) of the translated grid quantized to ``quant`` (non-finite
    cells as GRID_SENT, counted in n_nan)."""
    import hashlib

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("raster_translate expects single-band rasters")
                out = translate_np(a, srcwin, outsize, resample, scale)
                bad = ~np.isfinite(out)
                q = np.where(
                    bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / quant)
                ).astype(np.int64)
                ok = q[~bad]
                rows.append(
                    (
                        iid, out.shape[1], out.shape[0], int(bad.sum()),
                        int(ok.sum()) if ok.size else 0,
                        int(ok.min()) if ok.size else 0,
                        int(ok.max()) if ok.size else 0,
                        hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "out_w", "out_h", "n_nan", "q_sum", "q_min", "q_max", "grid_md5"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, out_w int, out_h int, n_nan long, "
        "q_sum long, q_min long, q_max long, grid_md5 string",
    )


# ---------------------------------------------------------------------------
# gdalwarp EPSG:4326 -> EPSG:3857 parity (north-up lon/lat reprojection)
# ---------------------------------------------------------------------------

_R = 6378137.0


def reproject_4326_np(
    a: np.ndarray,
    lon0: float,
    lat1: float,
    gsd_deg: float,
    out_gsd: float | None = None,
    resample: str = "bilinear",
) -> tuple[np.ndarray, dict]:
    """Reproject a north-up EPSG:4326 raster (top-left corner lon0/lat1,
    square pixel size ``gsd_deg`` degrees) onto a north-up EPSG:3857
    grid — the gdalwarp -t_srs EPSG:3857 case the render contract used
    to exclude.

    Determinism design: the x mapping (merc x <-> lon <-> source col) is
    fully AFFINE; the only transcendental — dest row center -> latitude,
    lat = degrees(2*atan(exp(my/R)) - pi/2) — is evaluated with scalar
    ``math`` calls in a per-ROW python loop (out_h values), so a scalar
    golden replays the identical libm bits; the remaining sampling is
    elementwise float64. Source sampling uses the raster_translate
    conventions: continuous src coords sx = (lon - lon0)/gsd_deg, sy =
    (lat1 - lat)/gsd_deg; nearest = clamped floor; bilinear at
    (s - 0.5) with edge-replicate clamp (NaN poisons its stencil).

    ``out_gsd`` defaults to the equator-scale of the source pixel,
    R * radians(gsd_deg) — gdalwarp's default-resolution analogue.
    Returns (float64 grid, target georef dict).
    """
    import math

    h, w = a.shape
    lon1 = lon0 + w * gsd_deg
    lat0 = lat1 - h * gsd_deg
    if not (-85.06 < lat0 and lat1 < 85.06):
        raise ValueError(f"latitude range [{lat0}, {lat1}] outside web-mercator band")
    if out_gsd is None:
        out_gsd = _R * math.radians(gsd_deg)
    x0 = _R * math.radians(lon0)
    x1 = _R * math.radians(lon1)
    y1 = _R * math.log(math.tan(math.pi / 4.0 + math.radians(lat1) / 2.0))
    y0 = _R * math.log(math.tan(math.pi / 4.0 + math.radians(lat0) / 2.0))
    out_w = max(1, int(math.ceil((x1 - x0) / out_gsd - 1e-9)))
    out_h = max(1, int(math.ceil((y1 - y0) / out_gsd - 1e-9)))
    # per-row latitude via scalar math (the one transcendental; see above)
    sy = np.array(
        [
            (lat1 - math.degrees(2.0 * math.atan(math.exp((y1 - (r + 0.5) * out_gsd) / _R)) - math.pi / 2.0))
            / gsd_deg
            for r in range(out_h)
        ],
        np.float64,
    )
    # per-col source x: affine end to end
    sx = np.array(
        [
            (math.degrees((x0 + (c + 0.5) * out_gsd) / _R) - lon0) / gsd_deg
            for c in range(out_w)
        ],
        np.float64,
    )
    af = a.astype(np.float64)
    if resample == "nearest":
        ri = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
        ci = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
        out = af[ri[:, None], ci[None, :]]
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
        top = af[r0c, c0c] * (1.0 - fc) + af[r0c, c1c] * fc
        bot = af[r1c, c0c] * (1.0 - fc) + af[r1c, c1c] * fc
        out = top * (1.0 - fr) + bot * fr
    else:
        raise ValueError(f"unknown resample {resample!r} (nearest|bilinear)")
    return out, {"gsd": out_gsd, "mx0": x0, "my1": y1, "epsg": 3857}


def reproject_4326(
    images: DataFrame,
    out_gsd: float | None = None,
    resample: str = "bilinear",
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdalwarp -s_srs EPSG:4326 -t_srs EPSG:3857` parity over a table
    of lon/lat GeoTIFFs (GeoKey must say 4326 — anything else raises,
    fail-loud): one summary row per raster (image_id, out_w, out_h,
    mx0, my1, out_gsd, n_nan, q_sum, q_min, q_max, grid_md5), quantized
    like the zonal family (mx0/my1 rounded to 1e-3 m). Scale shape:
    per-raster independent Arrow pass; pixels never shuffle."""
    import hashlib

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("reproject_4326 expects single-band rasters")
                if geo is None or geo.get("epsg") != 4326:
                    raise ValueError(
                        f"reproject_4326: {iid!r} georef is not EPSG:4326 "
                        f"(got {None if geo is None else geo.get('epsg')})"
                    )
                out, tgeo = reproject_4326_np(
                    a, float(geo["mx0"]), float(geo["my1"]), float(geo["gsd"]),
                    out_gsd=out_gsd, resample=resample,
                )
                bad = ~np.isfinite(out)
                q = np.where(
                    bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / quant)
                ).astype(np.int64)
                ok = q[~bad]
                rows.append(
                    (
                        iid, out.shape[1], out.shape[0],
                        float(np.round(tgeo["mx0"] / 1e-3) * 1e-3),
                        float(np.round(tgeo["my1"] / 1e-3) * 1e-3),
                        float(np.round(tgeo["gsd"] / 1e-6) * 1e-6),
                        int(bad.sum()),
                        int(ok.sum()) if ok.size else 0,
                        int(ok.min()) if ok.size else 0,
                        int(ok.max()) if ok.size else 0,
                        hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "out_w", "out_h", "mx0", "my1", "out_gsd",
                    "n_nan", "q_sum", "q_min", "q_max", "grid_md5",
                ],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, out_w int, out_h int, mx0 double, my1 double, "
        "out_gsd double, n_nan long, q_sum long, q_min long, q_max long, grid_md5 string",
    )


# ---------------------------------------------------------------------------
# gdal_retile parity: regular-grid chunking of large rasters
# ---------------------------------------------------------------------------


def raster_retile(
    images: DataFrame,
    tile_w: int = 256,
    tile_h: int = 256,
    quant: float = 1e-3,
    emit_bytes: bool = True,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_retile.py` parity: slice each GeoTIFF into a regular
    tile_w x tile_h grid (left-to-right, top-to-bottom; EDGE tiles are
    CROPPED to the remainder, not padded — gdal_retile's default), each
    chunk re-georeferenced to its own anchor (mx0 + col*tile_w*gsd,
    my1 - row*tile_h*gsd, same gsd). One output row per chunk:
    (id, tile_row, tile_col, w, h, mx0, my1, n_nan, q_sum, grid_md5
    [, bytes]) — the audit columns quantize to the shared 1e-3 /
    GRID_SENT contract; ``bytes`` (Float32 deflate GeoTIFF per chunk,
    ``emit_bytes=False`` skips the encode for audit-only runs) feeds the
    chunked blobs straight back into every other raster operator.

    This is the distributed-ingest primitive for rasters near the 2 GiB
    binary-cell cap: one oversized blob becomes a grid of independently
    processable rows. Scale shape: per-raster independent Arrow
    flat-map; chunks inherit the parent's partition, nothing shuffles."""
    import hashlib

    from ..functions import tiffcodec

    if tile_w <= 0 or tile_h <= 0:
        raise ValueError(f"bad retile size {tile_w}x{tile_h}")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if geo is None:
                    raise ValueError("raster_retile needs GeoTIFF georef")
                if a.ndim != 2:
                    raise ValueError("raster_retile expects single-band rasters")
                H, W = a.shape
                gsd = float(geo["gsd"])
                for tr in range((H + tile_h - 1) // tile_h):
                    for tc in range((W + tile_w - 1) // tile_w):
                        ch = a[
                            tr * tile_h : min((tr + 1) * tile_h, H),
                            tc * tile_w : min((tc + 1) * tile_w, W),
                        ]
                        v = ch.astype(np.float64)
                        bad = ~np.isfinite(v)
                        q = np.where(
                            bad, GRID_SENT, np.round(np.where(bad, 0.0, v) / quant)
                        ).astype(np.int64)
                        cx0 = float(geo["mx0"]) + tc * tile_w * gsd
                        cy1 = float(geo["my1"]) - tr * tile_h * gsd
                        out = (
                            tiffcodec.encode_tiff(
                                ch.astype(np.float32),
                                geo={"gsd": gsd, "mx0": cx0, "my1": cy1,
                                     "epsg": geo.get("epsg") or 3857},
                                compression="deflate",
                            )
                            if emit_bytes
                            else b""
                        )
                        rows.append(
                            (iid, tr, tc, ch.shape[1], ch.shape[0], cx0, cy1,
                             int(bad.sum()),
                             int(q[~bad].sum()) if (~bad).any() else 0,
                             hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                             out)
                        )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "tile_row", "tile_col", "w", "h", "mx0", "my1",
                         "n_nan", "q_sum", "grid_md5", "bytes"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, tile_row int, tile_col int, w int, h int, "
        "mx0 double, my1 double, n_nan long, q_sum long, grid_md5 string, bytes binary",
    )


# ---------------------------------------------------------------------------
# gdalwarp UTM (EPSG:326xx/327xx) -> EPSG:3857 parity
# ---------------------------------------------------------------------------


def utm_dest_grid(
    h: int,
    w: int,
    e0: float,
    n1: float,
    gsd: float,
    epsg: int,
    out_gsd: float | None = None,
) -> dict:
    """Destination-grid geometry + source-coordinate maps for a UTM raster
    warped onto a north-up EPSG:3857 grid.

    SHARED between the engine (`reproject_utm`) and the warp_utm golden
    generator — by-construction bit-identity, the same pattern as the
    quantized Lanczos taps. Independence for the transverse-Mercator
    math itself is anchored by tests/test_utm.py (closed-form anchors +
    an independently coded Snyder-series cross-check to < 1 mm).

    Geometry: the source boundary ring (every edge pixel corner) is
    inverse-projected to lon/lat and forward-mapped to web mercator;
    the dest bbox is its min/max (the TM->3857 image of a rectangle is
    not a rectangle, so corners alone under-cover). ``out_gsd`` defaults
    to gsd / cos(lat_center) — web mercator's 1/cos(lat) stretch of the
    ~true-scale UTM pixel, gdalwarp's suggested-resolution analogue —
    computed with scalar math.

    Returns {x0, y1, out_w, out_h, out_gsd, sx, sy} where sx/sy are
    (out_h, out_w) float64 continuous source pixel coordinates.
    """
    import math

    from ..functions import utm as _utm

    lon0, fn = _utm.utm_zone_params(epsg)
    # boundary ring of the source rectangle in UTM metres
    cols = np.arange(w + 1, dtype=np.float64)
    rows_ = np.arange(h + 1, dtype=np.float64)
    be = np.concatenate([cols, cols, np.zeros(h + 1), np.full(h + 1, float(w))])
    bn = np.concatenate([np.zeros(w + 1), np.full(w + 1, float(h)), rows_, rows_])
    lat_b, lon_b = _utm.tm_inverse(e0 + be * gsd, n1 - bn * gsd, lon0, false_northing=fn)
    if not (np.all(lat_b > -85.06) and np.all(lat_b < 85.06)):
        raise ValueError("raster extent outside the web-mercator band")
    mx_b = _R * np.deg2rad(lon_b)
    my_b = _R * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat_b) / 2.0))
    x0, x1 = float(mx_b.min()), float(mx_b.max())
    y0, y1 = float(my_b.min()), float(my_b.max())
    if out_gsd is None:
        lat_c, _ = _utm.tm_inverse(
            e0 + (w / 2.0) * gsd, n1 - (h / 2.0) * gsd, lon0, false_northing=fn
        )
        out_gsd = gsd / math.cos(math.radians(float(lat_c)))
    out_w = max(1, int(math.ceil((x1 - x0) / out_gsd - 1e-9)))
    out_h = max(1, int(math.ceil((y1 - y0) / out_gsd - 1e-9)))
    # dest pixel centers -> lon/lat: lon affine per column, lat scalar per
    # row (same one-transcendental-per-row design as reproject_4326)
    lon_c = np.array(
        [math.degrees((x0 + (c + 0.5) * out_gsd) / _R) for c in range(out_w)],
        np.float64,
    )[None, :]
    lat_r = np.array(
        [
            math.degrees(2.0 * math.atan(math.exp((y1 - (r + 0.5) * out_gsd) / _R)) - math.pi / 2.0)
            for r in range(out_h)
        ],
        np.float64,
    )[:, None]
    # broadcast through the shared vectorized Krueger forward
    E, N = _utm.tm_forward(lat_r, lon_c, lon0)
    sx = (E - e0) / gsd
    sy = (n1 - (N + fn)) / gsd
    return {
        "x0": x0, "y1": y1, "out_w": out_w, "out_h": out_h,
        "out_gsd": float(out_gsd), "sx": sx, "sy": sy,
    }


def _sample_grid(af: np.ndarray, sx: np.ndarray, sy: np.ndarray, resample: str) -> np.ndarray:
    """Sample float64 raster `af` at 2-D continuous coords (same nearest/
    bilinear conventions as reproject_4326_np, edge-replicate clamp)."""
    h, w = af.shape
    if resample == "nearest":
        ri = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
        ci = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
        return af[ri, ci]
    if resample != "bilinear":
        raise ValueError(f"unknown resample {resample!r} (nearest|bilinear)")
    uu = sx - 0.5
    vv = sy - 0.5
    c0 = np.floor(uu).astype(np.int64)
    r0 = np.floor(vv).astype(np.int64)
    fc = uu - c0
    fr = vv - r0
    c0c = np.clip(c0, 0, w - 1)
    c1c = np.clip(c0 + 1, 0, w - 1)
    r0c = np.clip(r0, 0, h - 1)
    r1c = np.clip(r0 + 1, 0, h - 1)
    top = af[r0c, c0c] * (1.0 - fc) + af[r0c, c1c] * fc
    bot = af[r1c, c0c] * (1.0 - fc) + af[r1c, c1c] * fc
    return top * (1.0 - fr) + bot * fr


def reproject_utm(
    images: DataFrame,
    out_gsd: float | None = None,
    resample: str = "bilinear",
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdalwarp -s_srs EPSG:326xx|327xx -t_srs EPSG:3857` parity over a
    table of UTM GeoTIFFs (GeoKey must carry a UTM EPSG code — anything
    else raises, fail-loud). Output schema matches reproject_4326: one
    1e-3-quantized summary row per raster. Scale shape: per-raster
    independent Arrow pass; pixels never shuffle; the TM math is
    elementwise float64 over the dest grid (no python-per-pixel loop)."""
    import hashlib

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("reproject_utm expects single-band rasters")
                epsg = None if geo is None else geo.get("epsg")
                if epsg is None or not (32601 <= epsg <= 32660 or 32701 <= epsg <= 32760):
                    raise ValueError(
                        f"reproject_utm: {iid!r} georef is not a UTM CRS (got {epsg})"
                    )
                g = utm_dest_grid(
                    a.shape[0], a.shape[1], float(geo["mx0"]), float(geo["my1"]),
                    float(geo["gsd"]), int(epsg), out_gsd=out_gsd,
                )
                out = _sample_grid(a.astype(np.float64), g["sx"], g["sy"], resample)
                bad = ~np.isfinite(out)
                q = np.where(
                    bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / quant)
                ).astype(np.int64)
                ok = q[~bad]
                rows.append(
                    (
                        iid, g["out_w"], g["out_h"],
                        float(np.round(g["x0"] / 1e-3) * 1e-3),
                        float(np.round(g["y1"] / 1e-3) * 1e-3),
                        float(np.round(g["out_gsd"] / 1e-6) * 1e-6),
                        int(bad.sum()),
                        int(ok.sum()) if ok.size else 0,
                        int(ok.min()) if ok.size else 0,
                        int(ok.max()) if ok.size else 0,
                        hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "out_w", "out_h", "mx0", "my1", "out_gsd",
                    "n_nan", "q_sum", "q_min", "q_max", "grid_md5",
                ],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, out_w int, out_h int, mx0 double, my1 double, "
        "out_gsd double, n_nan long, q_sum long, q_min long, q_max long, grid_md5 string",
    )


# ---------------------------------------------------------------------------
# gdaladdo parity: build internal overviews
# ---------------------------------------------------------------------------


def overview_np(a: np.ndarray, level: int, resample: str = "average") -> np.ndarray:
    """One gdaladdo overview level for an integer raster (uint8/uint16,
    gray or (H,W,C)): output dims ceil(h/level) x ceil(w/level).

    * nearest: the top-left sample of each block (a[::level, ::level] —
      gdaladdo's subsample rule);
    * average: INTEGER-EXACT round-half-up block mean over the (partial
      at edges) level x level block — (2*sum + cnt) // (2*cnt), so no
      float rounding exists anywhere and a scalar integer replay is
      identical by construction.

    Float rasters raise (fail-loud): the average contract here is the
    integer chart/imagery path; DEM overviews go through the render
    pyramid's float kernels.
    """
    if level < 2:
        raise ValueError(f"overview level must be >= 2, got {level}")
    if resample == "nearest":
        return a[::level, ::level]
    if resample != "average":
        raise ValueError(f"unknown overview resample {resample!r} (average|nearest)")
    if not np.issubdtype(a.dtype, np.integer):
        raise ValueError("average overviews are defined for integer rasters only")
    h, w = a.shape[:2]
    oh, ow = (h + level - 1) // level, (w + level - 1) // level
    ph, pw = oh * level, ow * level
    pad = [(0, ph - h), (0, pw - w)] + [(0, 0)] * (a.ndim - 2)
    ap = np.pad(a.astype(np.int64), pad)
    mask = np.pad(np.ones((h, w), np.int64), [(0, ph - h), (0, pw - w)])
    if a.ndim == 2:
        s = ap.reshape(oh, level, ow, level).sum(axis=(1, 3))
    else:
        s = ap.reshape(oh, level, ow, level, a.shape[2]).sum(axis=(1, 3))
    cnt = mask.reshape(oh, level, ow, level).sum(axis=(1, 3))
    if a.ndim != 2:
        cnt = cnt[..., None]
    return ((2 * s + cnt) // (2 * cnt)).astype(a.dtype)


def build_overviews(
    images: DataFrame,
    levels: tuple[int, ...] = (2, 4),
    resample: str = "average",
    cog_layout: bool = False,
    tile: int | None = None,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdaladdo` parity: read each GeoTIFF blob, compute the requested
    overview levels (integer-exact average or nearest subsample) and
    re-encode with the overviews appended as chained IFDs — the GDAL
    internal-overview layout the reader's `decode_tiff(ifd=k)` already
    serves. Emits (id, bytes, n_overviews). ``tile=256`` +
    ``cog_layout=True`` produces output that passes ``info.cog_check``
    (tiled 16-multiple organization, smallest-overview-data-first).
    Scale shape: per-raster independent Arrow pass; pixels never
    shuffle (the gdaladdo unit of work is one file)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                ovs = [overview_np(a, lv, resample) for lv in sorted(levels)]
                out = tiffcodec.encode_tiff(
                    a, geo=geo, compression="deflate", overviews=ovs,
                    tile=tile, cog_layout=cog_layout,
                )
                rows.append((iid, out, len(ovs)))
            yield pd.DataFrame(rows, columns=[id_col, "bytes", "n_overviews"])

    return images.select(id_col, bytes_col).mapInPandas(
        fn, schema=f"{id_col} string, bytes binary, n_overviews int"
    )
