"""minitiler — single-process, loop-based NumPy oracle (SURVEY.md §5.2).

The stand-in for the reference tiler binary, which cannot run here (no
GDAL/PIL; the reference checkout is absent — SURVEY.md §0.1). Implements the
published global-mercator math (SURVEY.md §1.4) and the engine's render
contract independently of the Spark engine's vectorized code paths:
deliberately scalar, boring, and slow. Tests compare the distributed engine
against this bit-for-tile (BASELINE.json:6).

Shared modules: only the byte-level codecs and the S2/H3 indexers
(`tilers_tools_spark.functions.{codecs,s2lite,h3lite}`) — byte determinism
requires a single encoder, and the indexers are themselves KAT-tested. All
tile math, georef derivation, rendering, resampling, PIP, and kNN are
re-derived here from the formulas, not imported from the engine.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tilers_tools_spark.functions import codecs, s2lite  # noqa: E402

R = 6378137.0
ORIGIN = math.pi * R
TILE = 256
RES0 = 2.0 * ORIGIN / TILE

# --------------------------------------------------------------------------
# scalar tile math (independent transcription of SURVEY.md §1.4)
# --------------------------------------------------------------------------


def merc(lon: float, lat: float):
    mx = lon * (ORIGIN / 180.0)
    my = math.log(math.tan((90.0 + lat) * (math.pi / 360.0))) * R
    return mx, my


def inv_merc(mx: float, my: float):
    lon = mx * (180.0 / ORIGIN)
    lat = math.degrees(2.0 * math.atan(math.exp(my / R)) - math.pi / 2.0)
    return lon, lat


def res_at(z: int) -> float:
    return RES0 / (2.0**z)


def base_zoom(gsd: float, zmax: int = 30) -> int:
    return int(min(zmax, max(0, math.ceil(math.log2(RES0 / gsd)))))


def cover(mx0, my0, mx1, my1, z):
    """Inclusive (txmin, txmax, tymin_tms, tymax_tms), half-open box rule."""
    span = res_at(z) * TILE
    n = (1 << z) - 1
    txmin = int(max(0, min(n, math.floor((mx0 + ORIGIN) / span))))
    tymin = int(max(0, min(n, math.floor((my0 + ORIGIN) / span))))
    txmax = int(max(0, min(n, max(txmin, math.ceil((mx1 + ORIGIN) / span) - 1))))
    tymax = int(max(0, min(n, max(tymin, math.ceil((my1 + ORIGIN) / span) - 1))))
    return txmin, txmax, tymin, tymax


def h3_res_for_zoom(z: int) -> int:
    """Engine convention: h3_res = clamp(z - 2, 0, 12) (documented contract)."""
    return int(min(12, max(0, z - 2)))


def s2_level_for_zoom(z: int) -> int:
    """Engine convention: s2_level = clamp(z, 0, 30)."""
    return int(min(30, max(0, z)))


# --------------------------------------------------------------------------
# global-geodetic (EPSG:4326 plate-carree) profile — scalar transcription of
# the gdal2tiles `--profile geodetic` grid: 256px tiles, 2^(z+1) columns x
# 2^z rows (two root tiles at z0), degree units (SURVEY.md §2.3 row 12 note)
# --------------------------------------------------------------------------

RES0_GEO = 180.0 / TILE  # 0.703125 deg/px at z=0


def res_geo(z: int) -> float:
    return RES0_GEO / (2.0**z)


def base_zoom_geo(gsd: float, zmax: int = 30) -> int:
    """Geodetic base zoom from an EPSG:3857 gsd (m/px): equivalent angular
    gsd at the equator gsd_deg = gsd*180/ORIGIN, z = ceil(log2(RES0_GEO /
    gsd_deg)), clamped — the published two-step definition, transcribed."""
    gsd_deg = gsd * (180.0 / ORIGIN)
    return int(min(zmax, max(0, math.ceil(math.log2(RES0_GEO / gsd_deg)))))


def cover_geo(lon0, lat0, lon1, lat1, z):
    """Inclusive (txmin, txmax, tymin_tms, tymax_tms) on the rectangular
    2^(z+1) x 2^z geodetic grid, same half-open box rule as cover()."""
    span = res_geo(z) * TILE
    n = 1 << z
    txmin = int(max(0, min(2 * n - 1, math.floor((lon0 + 180.0) / span))))
    tymin = int(max(0, min(n - 1, math.floor((lat0 + 90.0) / span))))
    txmax = int(max(0, min(2 * n - 1, max(txmin, math.ceil((lon1 + 180.0) / span) - 1))))
    tymax = int(max(0, min(n - 1, max(tymin, math.ceil((lat1 + 90.0) / span) - 1))))
    return txmin, txmax, tymin, tymax


# --------------------------------------------------------------------------
# georef derivation — independent scalar transcription of FIXTURES.md §2-3
# --------------------------------------------------------------------------

_M = (1 << 64) - 1


def _sm64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _M
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & _M
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & _M
    x ^= x >> 31
    return x


def _u01(x: int) -> float:
    return (x >> 11) / float(1 << 53)


def georef_of(phash: int, w: int, h: int):
    ph = phash & _M
    lon_c = -180.0 + 360.0 * _u01(_sm64(ph ^ 1))
    lat_c = -66.0 + 132.0 * _u01(_sm64(ph ^ 2))
    if ph % 5 == 0:  # HOT skew box (FIXTURES.md §3)
        lon_c = 139.7 - 1.0 + 2.0 * _u01(_sm64(ph ^ 1))
        lat_c = 35.7 - 1.0 + 2.0 * _u01(_sm64(ph ^ 2))
    gsd = 2.0 ** (4.0 + 6.0 * _u01(_sm64(ph ^ 3)))
    mx_c, my_c = merc(lon_c, lat_c)
    mx0 = mx_c - gsd * w / 2.0
    my1 = my_c + gsd * h / 2.0
    return {"lon_c": lon_c, "lat_c": lat_c, "gsd": gsd, "mx0": mx0, "my1": my1,
            "mx1": mx0 + gsd * w, "my0": my1 - gsd * h}


# --------------------------------------------------------------------------
# render contract (shared semantics; loop-based here)
# --------------------------------------------------------------------------


# Quantized 8.8 multi-tap kernel weights: imported from the ONE shared
# implementation (tilers_tools_spark/functions/kernels.py — pure NumPy,
# no Spark) that the engine's render path also uses, so engine-vs-oracle
# bit-identity for these kernels holds BY CONSTRUCTION. The cost is that
# this oracle is NOT independent of the engine for the tap formula
# itself; that independence is restored one level down by
# tests/test_kernels_spec.py, which pins the quantized taps for several
# fractional offsets to hand-computed integer lists (VERDICT r4 ask #5).
from tilers_tools_spark.functions.kernels import (  # noqa: E402
    cubic_wq_scalar as _cubic_wq,
    lanczos_wq_scalar as _lanczos_wq,
)


def render_tile(
    rgba_src: np.ndarray, geo: dict, z: int, tx: int, ty_tms: int, base_resampling: str = "bilinear"
) -> np.ndarray:
    """Render one 256x256 RGBA dest tile by inverse-mapping resampling.

    Contract (engine must match bit-for-bit):
    * dest pixel (r,c) center meters: mx = tmx0 + (c+0.5)*res ; my = tmy1 - (r+0.5)*res
      (float64 geometry)
    * source px coords: sc = (mx - mx0)/gsd - 0.5 ; sr = (my1 - my)/gsd - 0.5 (float64)
    * validity in meter space: mx0 <= mx < mx1 and my0 < my <= my1 -> alpha else 0
    * bilinear: 8.8 fixed-point on clamped integer neighbors, columns lerped
      before rows: weight wq = floor(frac*256 + 0.5) in [0, 256]; per stage
      out = (a*(256-wq) + b*wq + 128) >> 8 in uint16 (a*(256-wq)+b*wq <=
      255*256, no overflow). Quantized bilinear, standard SIMD practice.
    * cubic (Catmull-Rom): 4 clamped taps at floor(s)-1..+2, quantized 8.8
      weights per _cubic_wq (residue on tap 1, sum exactly 256), int32
      accumulate, (acc + 128) >> 8 arithmetic shift, clip 0..255 per stage;
      columns before rows, u8 intermediate — identical ops in the engine.
    """
    h, w = rgba_src.shape[:2]
    res = res_at(z)
    span = res * TILE
    tmx0 = tx * span - ORIGIN
    tmy1 = (ty_tms + 1) * span - ORIGIN
    out = np.zeros((TILE, TILE, 4), dtype=np.uint8)
    cc = np.arange(TILE, dtype=np.float64)
    mx = tmx0 + (cc + 0.5) * res  # per-column meters
    src16 = rgba_src[:, :, :3].astype(np.uint16)
    for r in range(TILE):
        my = tmy1 - (r + 0.5) * res
        valid = (mx >= geo["mx0"]) & (mx < geo["mx1"]) & (my > geo["my0"]) & (my <= geo["my1"])
        if not valid.any():
            continue
        sc = (mx - geo["mx0"]) / geo["gsd"] - 0.5
        sr = (geo["my1"] - my) / geo["gsd"] - 0.5
        c0 = np.floor(sc).astype(np.int64)
        r0 = int(math.floor(sr))
        if base_resampling == "bilinear":
            wc = np.floor((sc - c0) * 256.0 + 0.5).astype(np.uint16)[:, None]
            wr = np.uint16(math.floor((sr - r0) * 256.0 + 0.5))
            c0c = np.clip(c0, 0, w - 1)
            c1c = np.clip(c0 + 1, 0, w - 1)
            r0c = min(max(r0, 0), h - 1)
            r1c = min(max(r0 + 1, 0), h - 1)
            top = (src16[r0c, c0c] * (256 - wc) + src16[r0c, c1c] * wc + 128) >> 8
            bot = (src16[r1c, c0c] * (256 - wc) + src16[r1c, c1c] * wc + 128) >> 8
            row = ((top * (256 - wr) + bot * wr + 128) >> 8).astype(np.uint8)
        elif base_resampling == "nearest":
            # gdalwarp 'near': round(s) = floor(s + 0.5), clamped
            cn = np.clip(np.floor(sc + 0.5).astype(np.int64), 0, w - 1)
            rn = min(max(int(math.floor(sr + 0.5)), 0), h - 1)
            row = rgba_src[rn, cn, :3].astype(np.uint8)
        elif base_resampling in ("cubic", "lanczos"):
            taps, off, wq_fn = (4, 1, _cubic_wq) if base_resampling == "cubic" else (6, 2, _lanczos_wq)
            fc = sc - c0
            cq = np.stack([np.array(wq_fn(f), dtype=np.int32) for f in fc])  # (256, taps)
            rq = wq_fn(sr - r0)
            cols = []  # horizontal pass on each of the clamped source rows
            for j in range(taps):
                rj = min(max(r0 + (j - off), 0), h - 1)
                acc = np.zeros((TILE, 3), dtype=np.int64)
                for k in range(taps):
                    ckc = np.clip(c0 + (k - off), 0, w - 1)
                    acc += src16[rj, ckc].astype(np.int64) * cq[:, k][:, None]
                cols.append(np.clip((acc + 128) >> 8, 0, 255))
            racc = np.zeros((TILE, 3), dtype=np.int64)
            for j in range(taps):
                racc += cols[j] * rq[j]
            row = np.clip((racc + 128) >> 8, 0, 255).astype(np.uint8)
        else:
            raise ValueError(base_resampling)
        out[r, valid, :3] = row[valid]
        out[r, valid, 3] = 255
    return out


def warp_tile(rgba_src: np.ndarray, A, z: int, tx: int, ty_tms: int) -> np.ndarray:
    """General-affine (rotation/shear) inverse-mapping bilinear render —
    independent per-row transcription of the engine's warp contract
    (operators/render.py::warp_tile): GDAL-style corner-based geotransform
    [mx,my]^T = A @ [px,py,1]^T, validity 0<=px<w and 0<=py<h, 8.8
    fixed-point bilinear on clamped neighbors, columns and rows weighted
    per pixel. Bit-identical by elementwise-identical float64/int ops."""
    import numpy as _np

    h, w = rgba_src.shape[:2]
    src16 = rgba_src[:, :, :3].astype(_np.uint16)
    a, b, c0_ = float(A[0][0]), float(A[0][1]), float(A[0][2])
    d, e, f0_ = float(A[1][0]), float(A[1][1]), float(A[1][2])
    det = a * e - b * d
    res = res_at(z)
    span = res * TILE
    tmx0 = tx * span - ORIGIN
    tmy1 = (ty_tms + 1) * span - ORIGIN
    out = _np.zeros((TILE, TILE, 4), dtype=_np.uint8)
    cc = _np.arange(TILE, dtype=_np.float64)
    mx = tmx0 + (cc + 0.5) * res
    for r in range(TILE):
        my = tmy1 - (r + 0.5) * res
        dx = mx - c0_
        dy = my - f0_
        px = (e * dx - b * dy) / det
        py = (a * dy - d * dx) / det
        valid = (px >= 0.0) & (px < w) & (py >= 0.0) & (py < h)
        if not valid.any():
            continue
        sc = px - 0.5
        sr = py - 0.5
        cf = _np.floor(sc)
        rf = _np.floor(sr)
        wc = _np.floor((sc - cf) * 256.0 + 0.5).astype(_np.uint16)[:, None]
        wr = _np.floor((sr - rf) * 256.0 + 0.5).astype(_np.uint16)[:, None]
        ci = cf.astype(_np.int64)
        ri = rf.astype(_np.int64)
        c0c = _np.clip(ci, 0, w - 1)
        c1c = _np.clip(ci + 1, 0, w - 1)
        r0c = _np.clip(ri, 0, h - 1)
        r1c = _np.clip(ri + 1, 0, h - 1)
        top = (src16[r0c, c0c] * (256 - wc) + src16[r0c, c1c] * wc + 128) >> 8
        bot = (src16[r1c, c0c] * (256 - wc) + src16[r1c, c1c] * wc + 128) >> 8
        row = ((top * (256 - wr) + bot * wr + 128) >> 8).astype(_np.uint8)
        out[r, valid, :3] = row[valid]
        out[r, valid, 3] = 255
    return out


def downsample_average(quad: np.ndarray) -> np.ndarray:
    """512x512x4 -> 256x256x4: unweighted 2x2 channel mean, round half up."""
    m = quad.reshape(TILE, 2, TILE, 2, 4).astype(np.float64).mean(axis=(1, 3))
    return np.clip(m + 0.5, 0.0, 255.0).astype(np.uint8)


def downsample_lanczos(quad: np.ndarray, a: int = 3) -> np.ndarray:
    """512->256 2x separable Lanczos-a ('antialias', SURVEY.md §2.3 row 17).

    Dest pixel d center maps to source coord s = 2d + 0.5; integer source
    taps j with x = (j - s)/2, |x| < a, weight sinc(x)*sinc(x/a), weights
    normalized to sum 1. Edge handling: clamp (replicate border). Channels
    filtered independently in float64; final round half up, clip 0..255.
    """
    src = quad.astype(np.float32)  # filter in f32 (contract with engine)
    n_src = quad.shape[0]
    n_dst = n_src // 2
    d = np.arange(n_dst, dtype=np.float64)
    s = 2.0 * d + 0.5
    j0 = np.floor(s - (2 * a - 1)).astype(np.int64)
    taps = 4 * a
    jj = j0[:, None] + np.arange(taps)[None, :]
    x = (jj - s[:, None]) / 2.0
    wgt = np.sinc(x) * np.sinc(np.clip(x / a, -1, 1)) * (np.abs(x) < a)
    wgt /= wgt.sum(axis=1, keepdims=True)
    wgt = wgt.astype(np.float32)
    jc = np.clip(jj, 0, n_src - 1)
    # filter rows (axis 0): out1[d, col, ch] = sum_t wgt[d,t]*src[jc[d,t], col, ch]
    out1 = np.einsum("dt,dtwc->dwc", wgt, src[jc])
    # filter cols (axis 1): out2[row, d, ch] = sum_t wgt[d,t]*out1[row, jc[d,t], ch]
    out2 = np.einsum("dt,rdtc->rdc", wgt, out1[:, jc])
    return np.clip(out2 + np.float32(0.5), 0.0, 255.0).astype(np.uint8)


def downsample_nearest(quad: np.ndarray) -> np.ndarray:
    return quad[::2, ::2]


# --------------------------------------------------------------------------
# full-pyramid oracle over a generated fixture row
# --------------------------------------------------------------------------


def tile_image(
    rec: dict,
    zmin: int | None = None,
    zmax: int | None = None,
    resampling: str = "average",
    base_resampling: str = "bilinear",
):
    """One image row -> dict {(z, x_tms_is_not, y...)}: list of tile records.

    Returns list of dicts: z, x, y (TMS), xyz_y, rgba, h3_res, s2_cell.
    Base zoom per base_zoom(gsd); overviews down to zmin (default 0 capped to
    base-6 for test cost). H3 cell filled by caller (needs h3lite).
    """
    rgba = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
    geo = georef_of(rec["phash"], rec["w"], rec["h"])
    zb = base_zoom(geo["gsd"]) if zmax is None else zmax
    zlo = max(0, zb - 2) if zmin is None else zmin
    tiles = {}
    txmin, txmax, tymin, tymax = cover(geo["mx0"], geo["my0"], geo["mx1"], geo["my1"], zb)
    for tx in range(txmin, txmax + 1):
        for ty in range(tymin, tymax + 1):
            arr = render_tile(rgba, geo, zb, tx, ty, base_resampling)
            if arr[:, :, 3].max() == 0:
                continue  # empty-tile elision
            tiles[(zb, tx, ty)] = arr
    # overviews: parent (z-1, px, py) from children (z, 2px+cx, 2py+cy);
    # TMS y: child ty = 2py+1 is the NORTH half -> top rows of the 512 quad
    level = {k: v for k, v in tiles.items()}
    out = dict(tiles)
    down = {"average": downsample_average, "antialias": downsample_lanczos, "nearest": downsample_nearest}[resampling]
    z = zb
    while z > zlo:
        parents = {}
        for (cz, cx, cy), arr in level.items():
            parents.setdefault((cz - 1, cx // 2, cy // 2), []).append((cx, cy, arr))
        nxt = {}
        for (pz, px, py), kids in parents.items():
            quad = np.zeros((2 * TILE, 2 * TILE, 4), dtype=np.uint8)
            for cx, cy, arr in kids:
                colofs = (cx - 2 * px) * TILE
                rowofs = (1 - (cy - 2 * py)) * TILE  # cy odd (north) -> rows 0..255
                quad[rowofs : rowofs + TILE, colofs : colofs + TILE] = arr
            parr = down(quad)
            if parr[:, :, 3].max() == 0:
                continue
            nxt[(pz, px, py)] = parr
        out.update(nxt)
        level = nxt
        z -= 1
    recs = []
    for (z, tx, ty), arr in sorted(out.items()):
        cmx = (tx + 0.5) * res_at(z) * TILE - ORIGIN
        cmy = (ty + 0.5) * res_at(z) * TILE - ORIGIN
        lon, lat = inv_merc(cmx, cmy)
        s2 = int(s2lite.latlng_to_cell(np.array([lat]), np.array([lon]), s2_level_for_zoom(z))[0])
        recs.append(
            {
                "image_id": rec["image_id"],
                "z": z,
                "x": tx,
                "y": ty,
                "y_xyz": (1 << z) - 1 - ty,
                "rgba": arr,
                "s2_cell": s2,
                "lat": lat,
                "lon": lon,
                "caption": rec["caption"],
            }
        )
    return recs


def render_tile_geo(
    rgba_src: np.ndarray, geo: dict, z: int, tx: int, ty_tms: int, base_resampling: str = "bilinear"
) -> np.ndarray:
    """Render one 256x256 RGBA dest tile on the GLOBAL-GEODETIC grid.

    Same sampling contract as render_tile (float64 geometry, half-open
    validity in 3857 meter space, 8.8 fixed-point kernels, columns before
    rows) — only the dest geometry differs: dest pixel centers are linear
    in DEGREES on the 2^(z+1) x 2^z plate-carree grid, mapped to source
    meters by the closed-form forward mercator (lon is a pure scale; lat
    goes through ln∘tan, scalar per dest row)."""
    h, w = rgba_src.shape[:2]
    res = res_geo(z)
    span = res * TILE
    out = np.zeros((TILE, TILE, 4), dtype=np.uint8)
    cc = np.arange(TILE, dtype=np.float64)
    lon = (tx * span - 180.0) + (cc + 0.5) * res
    mx = lon * (ORIGIN / 180.0)  # per-column meters
    src16 = rgba_src[:, :, :3].astype(np.uint16)
    for r in range(TILE):
        lat = ((ty_tms + 1) * span - 90.0) - (r + 0.5) * res
        my = math.log(math.tan((90.0 + lat) * (math.pi / 360.0))) * R
        valid = (mx >= geo["mx0"]) & (mx < geo["mx1"]) & (my > geo["my0"]) & (my <= geo["my1"])
        if not valid.any():
            continue
        sc = (mx - geo["mx0"]) / geo["gsd"] - 0.5
        sr = (geo["my1"] - my) / geo["gsd"] - 0.5
        c0 = np.floor(sc).astype(np.int64)
        r0 = int(math.floor(sr))
        if base_resampling == "bilinear":
            wc = np.floor((sc - c0) * 256.0 + 0.5).astype(np.uint16)[:, None]
            wr = np.uint16(math.floor((sr - r0) * 256.0 + 0.5))
            c0c = np.clip(c0, 0, w - 1)
            c1c = np.clip(c0 + 1, 0, w - 1)
            r0c = min(max(r0, 0), h - 1)
            r1c = min(max(r0 + 1, 0), h - 1)
            top = (src16[r0c, c0c] * (256 - wc) + src16[r0c, c1c] * wc + 128) >> 8
            bot = (src16[r1c, c0c] * (256 - wc) + src16[r1c, c1c] * wc + 128) >> 8
            row = ((top * (256 - wr) + bot * wr + 128) >> 8).astype(np.uint8)
        elif base_resampling == "nearest":
            cn = np.clip(np.floor(sc + 0.5).astype(np.int64), 0, w - 1)
            rn = min(max(int(math.floor(sr + 0.5)), 0), h - 1)
            row = rgba_src[rn, cn, :3].astype(np.uint8)
        elif base_resampling in ("cubic", "lanczos"):
            taps, off, wq_fn = (4, 1, _cubic_wq) if base_resampling == "cubic" else (6, 2, _lanczos_wq)
            fc = sc - c0
            cq = np.stack([np.array(wq_fn(f), dtype=np.int32) for f in fc])
            rq = wq_fn(sr - r0)
            cols = []
            for j in range(taps):
                rj = min(max(r0 + (j - off), 0), h - 1)
                acc = np.zeros((TILE, 3), dtype=np.int64)
                for k in range(taps):
                    ckc = np.clip(c0 + (k - off), 0, w - 1)
                    acc += src16[rj, ckc].astype(np.int64) * cq[:, k][:, None]
                cols.append(np.clip((acc + 128) >> 8, 0, 255))
            racc = np.zeros((TILE, 3), dtype=np.int64)
            for j in range(taps):
                racc += cols[j] * rq[j]
            row = np.clip((racc + 128) >> 8, 0, 255).astype(np.uint8)
        else:
            raise ValueError(base_resampling)
        out[r, valid, :3] = row[valid]
        out[r, valid, 3] = 255
    return out


def tile_image_geo(
    rec: dict,
    zmin: int | None = None,
    zmax: int | None = None,
    resampling: str = "average",
    base_resampling: str = "bilinear",
):
    """Geodetic-profile twin of tile_image: one image row -> tile records
    on the 2^(z+1) x 2^z grid. Overview quadtree parent = (cx//2, cy//2)
    holds on the rectangular grid too (both axis counts halve per level;
    z0 ends with two roots). Tile-center lat/lon are closed-form degrees
    (no inverse mercator); s2 at s2_level_for_zoom(z)."""
    rgba = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
    geo = georef_of(rec["phash"], rec["w"], rec["h"])
    zb = base_zoom_geo(geo["gsd"]) if zmax is None else zmax
    zlo = max(0, zb - 2) if zmin is None else zmin
    lon0, lat0 = inv_merc(geo["mx0"], geo["my0"])
    lon1, lat1 = inv_merc(geo["mx1"], geo["my1"])
    txmin, txmax, tymin, tymax = cover_geo(lon0, lat0, lon1, lat1, zb)
    tiles = {}
    for tx in range(txmin, txmax + 1):
        for ty in range(tymin, tymax + 1):
            arr = render_tile_geo(rgba, geo, zb, tx, ty, base_resampling)
            if arr[:, :, 3].max() == 0:
                continue
            tiles[(zb, tx, ty)] = arr
    level = dict(tiles)
    out = dict(tiles)
    down = {"average": downsample_average, "antialias": downsample_lanczos, "nearest": downsample_nearest}[resampling]
    z = zb
    while z > zlo:
        parents = {}
        for (cz, cx, cy), arr in level.items():
            parents.setdefault((cz - 1, cx // 2, cy // 2), []).append((cx, cy, arr))
        nxt = {}
        for (pz, px, py), kids in parents.items():
            quad = np.zeros((2 * TILE, 2 * TILE, 4), dtype=np.uint8)
            for cx, cy, arr in kids:
                colofs = (cx - 2 * px) * TILE
                rowofs = (1 - (cy - 2 * py)) * TILE
                quad[rowofs : rowofs + TILE, colofs : colofs + TILE] = arr
            parr = down(quad)
            if parr[:, :, 3].max() == 0:
                continue
            nxt[(pz, px, py)] = parr
        out.update(nxt)
        level = nxt
        z -= 1
    recs = []
    for (z, tx, ty), arr in sorted(out.items()):
        span = res_geo(z) * TILE
        lon = (tx + 0.5) * span - 180.0
        lat = (ty + 0.5) * span - 90.0
        s2 = int(s2lite.latlng_to_cell(np.array([lat]), np.array([lon]), s2_level_for_zoom(z))[0])
        recs.append(
            {
                "image_id": rec["image_id"],
                "z": z,
                "x": tx,
                "y": ty,
                "y_xyz": (1 << z) - 1 - ty,
                "rgba": arr,
                "s2_cell": s2,
                "lat": lat,
                "lon": lon,
                "caption": rec["caption"],
            }
        )
    return recs


def cutline_mask(rings_lonlat, z: int, tx: int, ty_tms: int) -> np.ndarray:
    """(256,256) bool: pixel center inside ANY ring, even-odd — independent
    brute-force formulation (per-row edge crossings broadcast against all
    column centers; no sort/searchsorted)."""
    res = res_at(z)
    span = res * TILE
    tmx0 = tx * span - ORIGIN
    tmy1 = (ty_tms + 1) * span - ORIGIN
    cc = np.arange(TILE, dtype=np.float64)
    mx = tmx0 + (cc + 0.5) * res
    mask = np.zeros((TILE, TILE), dtype=bool)
    for ring in rings_lonlat:
        pts = [merc(v["lon"], v["lat"]) for v in ring]
        x1 = np.array([p[0] for p in pts])
        y1 = np.array([p[1] for p in pts])
        x2 = np.roll(x1, -1)
        y2 = np.roll(y1, -1)
        for r in range(TILE):
            my = tmy1 - (r + 0.5) * res
            crosses = (y1 > my) != (y2 > my)
            if not crosses.any():
                continue
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = x1[crosses] + (my - y1[crosses]) * (x2[crosses] - x1[crosses]) / (y2[crosses] - y1[crosses])
            inside = (xint[None, :] > mx[:, None]).sum(axis=1) % 2 == 1
            mask[r] |= inside
    return mask


# --------------------------------------------------------------------------
# PIP / kNN brute force (oracle for spatial joins, SURVEY.md §2.5)
# --------------------------------------------------------------------------


def point_in_ring(lon: float, lat: float, ring) -> bool:
    """Even-odd ray cast, scalar."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]["lon"], ring[i]["lat"]
        x2, y2 = ring[(i + 1) % n]["lon"], ring[(i + 1) % n]["lat"]
        if (y1 > lat) != (y2 > lat):
            xin = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
            if xin > lon:
                inside = not inside
    return inside


def knn_bruteforce(q_lonlat, pts_lonlat, k: int):
    """Euclidean-in-mercator-meters kNN; returns index arrays (nq, k)."""
    qm = np.array([merc(lo, la) for lo, la in q_lonlat])
    pm = np.array([merc(lo, la) for lo, la in pts_lonlat])
    d2 = ((qm[:, None, :] - pm[None, :, :]) ** 2).sum(-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :k]
