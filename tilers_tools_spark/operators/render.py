"""Tile rendering — the gdal_tiler core re-expressed as one shuffle-free
``mapInPandas`` pass (SURVEY.md §2.3 rows 14-20, §3.2 E1').

Design for 10^12-image scale (BASELINE.json:14): a tile pyramid is
*per-image* (the tiles table key is (image_id, z, x, y) — the reference
processes one map at a time; cross-map merge is a separate operator,
``operators.convert.merge_tilesets``). Every tile of an image derives from
that image's bytes alone, so base cut AND all overview levels happen inside
a single Arrow-batched ``mapInPandas`` over the images scan — **zero
shuffles, no bytes ever cross the wire**. Shuffles appear only downstream
(sink clustering by (zoom, salted h3), joins), on narrow tile rows.

Bit-for-tile contract: formulas below are element-for-element identical to
``oracle/minitiler.py`` — float64 geometry, 8.8 fixed-point pixel
interpolation (uint16), integer 2x2 average — so tiles are byte-identical;
see tests/test_pipeline_vs_oracle.py. The fixed-point choice is deliberate:
this box has ~4 GB/s total DRAM bandwidth, and float64 pixel math saturates
it at 8 cores (measured, BENCH/BASELINE.md); integer u8/u16 math keeps the
render compute-bound so it scales across executors.

Reference parity: gdal_tiler.py::Pyramid base-tile loop + overview recursion
[R] — /root/reference is empty this session (SURVEY.md §0.1), so citations
are symbol-level only.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from ..functions import codecs, georef, h3lite, s2lite
from ..functions import tilemath as tm

TILE = tm.TILE

TILES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("z", IntegerType()),
        StructField("x", LongType()),
        StructField("y", LongType()),  # TMS y (canonical; y_xyz = 2^z-1-y)
        StructField("y_xyz", LongType()),
        StructField("tile", BinaryType()),  # PNG RGBA 256x256
        StructField("h3_cell", LongType()),
        StructField("h3_res", IntegerType()),
        StructField("s2_cell", LongType()),
        StructField("lat", DoubleType()),  # tile center
        StructField("lon", DoubleType()),
        StructField("caption", StringType()),
        StructField("part_id", IntegerType()),
    ]
)


def h3_res_for_zoom(z: int) -> int:
    """Engine convention (shared with oracle): clamp(z - 2, 0, 12)."""
    return int(min(12, max(0, z - 2)))


def s2_level_for_zoom(z: int) -> int:
    return int(min(30, max(0, z)))


# ---------------------------------------------------------------------------
# per-image pure-NumPy pyramid (runs inside the UDF; matches oracle bit-exact)
# ---------------------------------------------------------------------------


# quantized 8.8 multi-tap kernel weights: ONE shared implementation
# (functions/kernels.py) imported by BOTH this engine path and
# oracle/minitiler — bit-identity by construction; the shared formula
# itself is anchored to hand-pinned spec taps in tests/test_kernels_spec.py
from ..functions.kernels import cubic_weights_q as _cubic_weights_q  # noqa: E402
from ..functions.kernels import lanczos_weights_q as _lanczos_weights_q  # noqa: E402

# multi-tap separable base kernels: (taps, left offset from floor(s), wq fn)
_BASE_KERNELS = {"cubic": (4, 1, _cubic_weights_q), "lanczos": (6, 2, _lanczos_weights_q)}


def _downsample(quad: np.ndarray, resampling: str) -> np.ndarray:
    if resampling == "average":
        # integer-exact fast path: floor(mean + 0.5) == (sum + 2) >> 2 for
        # uint8 2x2 blocks — byte-identical to the oracle's float mean
        q = quad.astype(np.uint16)
        s = q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]
        return ((s + 2) >> 2).astype(np.uint8)
    if resampling == "nearest":
        return quad[::2, ::2]
    if resampling == "antialias":  # separable Lanczos-3 (oracle contract)
        a = 3
        src = quad.astype(np.float32)
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
        wgt = wgt.astype(np.float32)  # filter in f32 (contract with oracle)
        jc = np.clip(jj, 0, n_src - 1)
        out1 = np.einsum("dt,dtwc->dwc", wgt, src[jc])
        out2 = np.einsum("dt,rdtc->rdc", wgt, out1[:, jc])
        return np.clip(out2 + np.float32(0.5), 0.0, 255.0).astype(np.uint8)
    raise ValueError(f"unknown resampling {resampling!r}")


def render_image_pyramid(
    rec: dict,
    overview_levels: int = 2,
    resampling: str = "average",
    zmin=None,
    zmax=None,
    base_resampling: str = "bilinear",
):
    """One image row -> {(z, tx, ty_tms): rgba}. Base cut + overviews.

    `base_resampling`: 'bilinear' (default), 'cubic' (Catmull-Rom),
    'lanczos' (Lanczos-3) or 'nearest' — the gdalwarp kernel set
    (SURVEY.md §2.3 row 17). Interpolating kernels are 8.8 fixed-point,
    columns before rows, intermediates clipped to u8 — bit-identical to
    oracle/minitiler; 'nearest' is a pure gather (round(s), clamped)."""
    rgba = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
    # phash arrives as a (possibly negative) int64; reinterpret as uint64
    ph = np.array([rec["phash"]], dtype=np.int64).astype(np.uint64)
    g = georef.derive_georef_np(ph, np.array([rec["w"]]), np.array([rec["h"]]))
    geo = {k: float(v[0]) for k, v in g.items()}
    src = rgba[:, :, :3].astype(np.uint16)  # convert once per image (8.8 fixed-point contract)
    zb = int(tm.base_zoom_np(np.array([geo["gsd"]]))[0]) if zmax is None else int(zmax)
    zlo = max(0, zb - overview_levels) if zmin is None else int(zmin)
    txmin, txmax, tymin, tymax = (
        int(v[0])
        for v in tm.cover_range_np(
            np.array([geo["mx0"]]), np.array([geo["my0"]]), np.array([geo["mx1"]]), np.array([geo["my1"]]), np.array([zb])
        )
    )
    level = {}
    # column-interp depends only on tx -> compute once per tile column and
    # share across the ty range (identical elementwise float64 ops as
    # _render_tile, hoisted; bit-identical, property-tested vs oracle)
    res = tm.RES0 / (2.0**zb)
    span = res * TILE
    h_src, w_src = src.shape[:2]
    cc = np.arange(TILE, dtype=np.float64)
    for tx in range(txmin, txmax + 1):
        tmx0 = tx * span - tm.ORIGIN
        mx = tmx0 + (cc + 0.5) * res
        vcol = (mx >= geo["mx0"]) & (mx < geo["mx1"])
        if not vcol.any():
            continue
        sc = (mx - geo["mx0"]) / geo["gsd"] - 0.5
        cols_full = _column_stage(src, sc, base_resampling, w_src, h_src)
        for ty in range(tymin, tymax + 1):
            tmy1 = (ty + 1) * span - tm.ORIGIN
            my = tmy1 - (cc + 0.5) * res
            vrow = (my > geo["my0"]) & (my <= geo["my1"])
            if not vrow.any():
                continue
            sr = (geo["my1"] - my) / geo["gsd"] - 0.5
            val = _row_stage(cols_full, sr, base_resampling, h_src)
            valid = vrow[:, None] & vcol[None, :]
            arr = np.empty((TILE, TILE, 4), dtype=np.uint8)
            np.multiply(val, valid[:, :, None], out=arr[:, :, :3], dtype=np.uint8, casting="unsafe")
            np.multiply(valid, 255, out=arr[:, :, 3], dtype=np.uint8, casting="unsafe")
            if valid.any():
                level[(zb, tx, ty)] = arr
    return _build_overviews(level, zb, zlo, resampling)


def _column_stage(src: np.ndarray, sc: np.ndarray, base_resampling: str, w_src: int, h_src: int) -> np.ndarray:
    """Horizontal resample of all source rows at the 256 dest-column
    positions `sc` (corner-based source px minus 0.5). 8.8 fixed-point
    contract (bit-identical to oracle/minitiler):

    * bilinear: weight wq = floor(frac*256 + 0.5) in [0,256]; per stage
      out = (a*(256-wq) + b*wq + 128) >> 8, all uint16 (max 255*256 fits).
      Quantized bilinear = standard SIMD image-pipeline practice; ~4x less
      memory traffic than float64 -> scales across cores.
    * nearest: gdalwarp 'near' — the source pixel whose center is closest
      to the dest sample point, round(s) = floor(s + 0.5), clamped.
    * cubic (Catmull-Rom) / lanczos (Lanczos-3): multi-tap kernel, int32
      accumulate (taps can be negative), (acc + 128) >> 8 arithmetic
      shift, clip to u8 per stage.

    Hoisted out of the ty loop by both pyramid cuts: column interp depends
    only on tx, so it is computed once per tile column and shared across
    the ty range. Output stored u8 (values <= 255) to halve the stage-2
    gather traffic."""
    c0 = np.floor(sc)
    fc = sc - c0
    c0 = c0.astype(np.int64)
    if base_resampling == "bilinear":
        c0c = np.clip(c0, 0, w_src - 1)
        c1c = np.clip(c0 + 1, 0, w_src - 1)
        wc = np.floor(fc * 256.0 + 0.5).astype(np.uint16)[None, :, None]
        return ((src[:, c0c] * (256 - wc) + src[:, c1c] * wc + 128) >> 8).astype(np.uint8)
    if base_resampling == "nearest":
        cn = np.clip(np.floor(sc + 0.5).astype(np.int64), 0, w_src - 1)
        return src[:, cn].astype(np.uint8)
    if base_resampling in _BASE_KERNELS:
        taps, off, wfn = _BASE_KERNELS[base_resampling]
        cq = wfn(fc)
        acc = np.zeros((h_src, TILE, 3), dtype=np.int32)
        for k in range(taps):
            ck = np.clip(c0 + (k - off), 0, w_src - 1)
            acc += src[:, ck].astype(np.int32) * cq[:, k][None, :, None]
        return np.clip((acc + 128) >> 8, 0, 255).astype(np.uint8)
    raise ValueError(f"unknown base_resampling {base_resampling!r}")


def _row_stage(cols_full: np.ndarray, sr: np.ndarray, base_resampling: str, h_src: int) -> np.ndarray:
    """Vertical resample of the column-stage output at the 256 dest-row
    positions `sr` — same kernel set and fixed-point contract as
    _column_stage (columns before rows, intermediates clipped to u8)."""
    r0 = np.floor(sr)
    fr = sr - r0
    r0 = r0.astype(np.int64)
    if base_resampling == "bilinear":
        r0c = np.clip(r0, 0, h_src - 1)
        r1c = np.clip(r0 + 1, 0, h_src - 1)
        wr = np.floor(fr * 256.0 + 0.5).astype(np.uint16)[:, None, None]
        return (cols_full[r0c] * (256 - wr) + cols_full[r1c] * wr + 128) >> 8
    if base_resampling == "nearest":
        rn = np.clip(np.floor(sr + 0.5).astype(np.int64), 0, h_src - 1)
        return cols_full[rn]
    taps, off, wfn = _BASE_KERNELS[base_resampling]
    rq = wfn(fr)
    racc = np.zeros((TILE, TILE, 3), dtype=np.int32)
    for k in range(taps):
        rk = np.clip(r0 + (k - off), 0, h_src - 1)
        racc += cols_full[rk].astype(np.int32) * rq[:, k][:, None, None]
    return np.clip((racc + 128) >> 8, 0, 255)


def _build_overviews(level: dict, zb: int, zlo: int, resampling: str) -> dict:
    """Quadtree overview chain zb -> zlo from the base-level dict
    {(z, tx, ty_tms): rgba}. Grid-agnostic: parent = (cx//2, cy//2) holds
    on BOTH the square mercator grid and the rectangular 2^(z+1) x 2^z
    geodetic grid (each halves both axis counts per level; geodetic z0
    simply ends with two roots). Empty parents elided."""
    out = dict(level)
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
                rowofs = (1 - (cy - 2 * py)) * TILE  # TMS: odd child y = north half
                quad[rowofs : rowofs + TILE, colofs : colofs + TILE] = arr
            parr = _downsample(quad, resampling)
            if parr[:, :, 3].max() != 0:
                nxt[(pz, px, py)] = parr
        out.update(nxt)
        level = nxt
        z -= 1
    return out


def render_image_pyramid_geodetic(
    rec: dict,
    overview_levels: int = 2,
    resampling: str = "average",
    zmin=None,
    zmax=None,
    base_resampling: str = "bilinear",
):
    """One image row -> {(z, tx, ty_tms): rgba} on the GLOBAL-GEODETIC
    grid (gdal2tiles `--profile geodetic` / OSGeo TMS global-geodetic:
    2^(z+1) x 2^z 256px tiles in plate-carree degrees, two roots at z0).

    The source georef is the engine's EPSG:3857 convention, so the cut is
    the exact 3857 -> 4326 inverse mapping: dest columns are linear in
    lon (mercator x is a pure scale of lon), dest rows go through the
    closed-form mercator forward my = R*ln(tan((90+lat)*pi/360)) — scalar
    per dest ROW, which preserves the separable column-stage/row-stage
    structure and the 8.8 fixed-point contract shared with the mercator
    pyramid (same _column_stage/_row_stage kernels, all four resamplings).
    Pixels are NOT square on the ground away from the equator — that is
    the geodetic profile's defining property, not a bug."""
    rgba = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
    ph = np.array([rec["phash"]], dtype=np.int64).astype(np.uint64)
    g = georef.derive_georef_np(ph, np.array([rec["w"]]), np.array([rec["h"]]))
    geo = {k: float(v[0]) for k, v in g.items()}
    src = rgba[:, :, :3].astype(np.uint16)
    h_src, w_src = src.shape[:2]
    zb = int(tm.base_zoom_geo_np(np.array([geo["gsd"]]))[0]) if zmax is None else int(zmax)
    zlo = max(0, zb - overview_levels) if zmin is None else int(zmin)
    lon0, lat0 = tm.inv_merc_np(np.array([geo["mx0"]]), np.array([geo["my0"]]))
    lon1, lat1 = tm.inv_merc_np(np.array([geo["mx1"]]), np.array([geo["my1"]]))
    txmin, txmax, tymin, tymax = (
        int(v[0]) for v in tm.cover_range_geo_np(lon0, lat0, lon1, lat1, zb)
    )
    res = tm.RES0_GEO / (2.0**zb)
    span = res * TILE
    cc = np.arange(TILE, dtype=np.float64)
    level = {}
    for tx in range(txmin, txmax + 1):
        lon = (tx * span - 180.0) + (cc + 0.5) * res
        mx = lon * (tm.ORIGIN / 180.0)
        vcol = (mx >= geo["mx0"]) & (mx < geo["mx1"])
        if not vcol.any():
            continue
        sc = (mx - geo["mx0"]) / geo["gsd"] - 0.5
        cols_full = _column_stage(src, sc, base_resampling, w_src, h_src)
        for ty in range(tymin, tymax + 1):
            lat = ((ty + 1) * span - 90.0) - (cc + 0.5) * res
            my = np.log(np.tan((90.0 + lat) * (math.pi / 360.0))) * tm.R
            vrow = (my > geo["my0"]) & (my <= geo["my1"])
            if not vrow.any():
                continue
            sr = (geo["my1"] - my) / geo["gsd"] - 0.5
            val = _row_stage(cols_full, sr, base_resampling, h_src)
            valid = vrow[:, None] & vcol[None, :]
            arr = np.empty((TILE, TILE, 4), dtype=np.uint8)
            np.multiply(val, valid[:, :, None], out=arr[:, :, :3], dtype=np.uint8, casting="unsafe")
            np.multiply(valid, 255, out=arr[:, :, 3], dtype=np.uint8, casting="unsafe")
            if valid.any():
                level[(zb, tx, ty)] = arr
    return _build_overviews(level, zb, zlo, resampling)


def warp_tile(rgba_src: np.ndarray, A: np.ndarray, z: int, tx: int, ty_tms: int) -> np.ndarray:
    """Render one 256x256 RGBA tile from a GENERAL affine georeference
    (rotation/shear allowed) — the gdalwarp role beyond the north-up fast
    path. A is the GDAL-style geotransform (2x3, corner-based):
    [mx, my]^T = A @ [px, py, 1]^T. Inverse-mapping bilinear with the SAME
    8.8 fixed-point contract as render_image_pyramid; elementwise formulas
    mirrored in oracle/minitiler.warp_tile -> bit-identical (tested).

    No column hoisting here: rotation breaks the separability that the
    north-up path exploits, so this is the slower general kernel — the
    pipeline uses it only for rows whose affine has off-diagonal terms.
    """
    h_src, w_src = rgba_src.shape[:2]
    src = rgba_src[:, :, :3].astype(np.uint16)
    a, b, c0_ = float(A[0, 0]), float(A[0, 1]), float(A[0, 2])
    d, e, f0_ = float(A[1, 0]), float(A[1, 1]), float(A[1, 2])
    det = a * e - b * d
    if det == 0.0:
        raise ValueError("degenerate affine")
    res = tm.RES0 / (2.0**z)
    span = res * TILE
    tmx0 = tx * span - tm.ORIGIN
    tmy1 = (ty_tms + 1) * span - tm.ORIGIN
    cc = np.arange(TILE, dtype=np.float64)
    mx = tmx0 + (cc + 0.5) * res  # (256,) per-column meters
    my = tmy1 - (cc + 0.5) * res  # (256,) per-row meters
    dx = mx[None, :] - c0_  # (256,256) broadcast: rows x cols
    dy = my[:, None] - f0_
    px = (e * dx - b * dy) / det  # corner-based source pixel coords
    py = (a * dy - d * dx) / det
    valid = (px >= 0.0) & (px < w_src) & (py >= 0.0) & (py < h_src)
    sc = px - 0.5
    sr = py - 0.5
    cf = np.floor(sc)
    rf = np.floor(sr)
    wc = np.floor((sc - cf) * 256.0 + 0.5).astype(np.uint16)[:, :, None]
    wr = np.floor((sr - rf) * 256.0 + 0.5).astype(np.uint16)[:, :, None]
    ci = cf.astype(np.int64)
    ri = rf.astype(np.int64)
    c0c = np.clip(ci, 0, w_src - 1)
    c1c = np.clip(ci + 1, 0, w_src - 1)
    r0c = np.clip(ri, 0, h_src - 1)
    r1c = np.clip(ri + 1, 0, h_src - 1)
    top = (src[r0c, c0c] * (256 - wc) + src[r0c, c1c] * wc + 128) >> 8
    bot = (src[r1c, c0c] * (256 - wc) + src[r1c, c1c] * wc + 128) >> 8
    val = (top * (256 - wr) + bot * wr + 128) >> 8
    out = np.empty((TILE, TILE, 4), dtype=np.uint8)
    np.multiply(val, valid[:, :, None], out=out[:, :, :3], dtype=np.uint8, casting="unsafe")
    np.multiply(valid, 255, out=out[:, :, 3], dtype=np.uint8, casting="unsafe")
    return out


def affine_cover(A: np.ndarray, w: int, h: int, z: int):
    """Inclusive TMS tile range covering the affine image's quad at z
    (bbox of the four warped corners, same half-open cover rule)."""
    corners_px = np.array([[0, 0], [w, 0], [0, h], [w, h]], dtype=np.float64)
    mx = A[0, 0] * corners_px[:, 0] + A[0, 1] * corners_px[:, 1] + A[0, 2]
    my = A[1, 0] * corners_px[:, 0] + A[1, 1] * corners_px[:, 1] + A[1, 2]
    r = tm.cover_range_np(
        np.array([mx.min()]), np.array([my.min()]), np.array([mx.max()]), np.array([my.max()]), np.array([z])
    )
    return tuple(int(v[0]) for v in r)


def render_warped(images: DataFrame, zoom: int, affine_cols=("a00", "a01", "a02", "a10", "a11", "a12")) -> DataFrame:
    """images DF carrying per-row affine geotransform columns (e.g. from
    the GCP fit, functions/georef_parsers.fit_affine_3857) -> warped tiles
    at `zoom`. Same shuffle-free mapInPandas shape as render_pyramid;
    rotated/sheared charts supported (empty tiles elided)."""
    from typing import Iterator as _It

    def fn(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                rgba = codecs.to_rgba(codecs.decode_image(rec["bytes"], rec["fmt"]))
                A = np.array(
                    [[rec[affine_cols[0]], rec[affine_cols[1]], rec[affine_cols[2]]],
                     [rec[affine_cols[3]], rec[affine_cols[4]], rec[affine_cols[5]]]],
                    dtype=np.float64,
                )
                txmin, txmax, tymin, tymax = affine_cover(A, rgba.shape[1], rgba.shape[0], zoom)
                for tx in range(txmin, txmax + 1):
                    for ty in range(tymin, tymax + 1):
                        arr = warp_tile(rgba, A, zoom, tx, ty)
                        if arr[:, :, 3].max() == 0:
                            continue
                        rows.append((rec["image_id"], zoom, tx, ty, codecs.encode_tile_png(arr)))
            if rows:
                yield pd.DataFrame(rows, columns=["image_id", "z", "x", "y", "tile"])

    return images.mapInPandas(fn, schema="image_id string, z int, x long, y long, tile binary")


# ---------------------------------------------------------------------------
# the Spark operator
# ---------------------------------------------------------------------------


def render_pyramid(
    images: DataFrame,
    overview_levels: int = 2,
    resampling: str = "average",
    zmin=None,
    zmax=None,
    encode: str = "png",
    base_resampling: str = "bilinear",
) -> DataFrame:
    """images DF (BASELINE.json:15 schema) -> tiles DF (TILES_SCHEMA).

    Shuffle-free: one narrow mapInPandas stage; H3/S2 assignment vectorized
    per output batch. Partition balance comes from the images scan split
    (`spark.sql.files.maxPartitionBytes`); per-image tile counts are bounded
    (<= ~(w/256+1)*(h/256+1) + overview tail), so no salting needed here —
    salting applies at sink/join repartition (plans.tile_pyramid).

    `encode`: 'png' (interop tile blobs, Python-side deflate) or 'raw'
    (RAW1 header + RGBA bytes — the scale path: columnar sinks compress
    JVM-side with zstd, so pre-compressing in Python wastes the Python
    workers; convert to png only at container export, operators/convert.py
    row 23).
    """
    enc = codecs.encode_tile_png if encode == "png" else codecs.encode_raw

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                tiles = render_image_pyramid(rec, overview_levels, resampling, zmin, zmax, base_resampling)
                for (z, tx, ty), arr in sorted(tiles.items()):
                    rows.append(
                        (rec["image_id"], z, tx, ty, rec["caption"], enc(arr))
                    )
            if not rows:
                continue
            out = pd.DataFrame(rows, columns=["image_id", "z", "x", "y", "caption", "tile"])
            z = out["z"].to_numpy(np.int64)
            txa = out["x"].to_numpy(np.int64)
            tya = out["y"].to_numpy(np.int64)
            span = tm.RES0 / (2.0**z.astype(np.float64)) * TILE
            cmx = (txa.astype(np.float64) + 0.5) * span - tm.ORIGIN
            cmy = (tya.astype(np.float64) + 0.5) * span - tm.ORIGIN
            lon, lat = tm.inv_merc_np(cmx, cmy)
            h3 = np.zeros(len(out), dtype=np.int64)
            s2 = np.zeros(len(out), dtype=np.int64)
            h3res = np.clip(z - 2, 0, 12).astype(np.int64)
            s2lvl = np.clip(z, 0, 30).astype(np.int64)
            for rv in np.unique(h3res):
                m = h3res == rv
                h3[m] = h3lite.latlng_to_cell(lat[m], lon[m], int(rv))
            for lv in np.unique(s2lvl):
                m = s2lvl == lv
                s2[m] = s2lite.latlng_to_cell(lat[m], lon[m], int(lv))
            yield pd.DataFrame(
                {
                    "image_id": out["image_id"],
                    "z": out["z"].astype("int32"),
                    "x": out["x"],
                    "y": out["y"],
                    "y_xyz": (np.int64(1) << z) - 1 - tya,
                    "tile": out["tile"],
                    "h3_cell": h3,
                    "h3_res": h3res.astype("int32"),
                    "s2_cell": s2,
                    "lat": lat,
                    "lon": lon,
                    "caption": out["caption"],
                    "part_id": np.full(len(out), pid, dtype=np.int32),
                }
            )

    return images.mapInPandas(fn, schema=TILES_SCHEMA)


def render_pyramid_geodetic(
    images: DataFrame,
    overview_levels: int = 2,
    resampling: str = "average",
    zmin=None,
    zmax=None,
    encode: str = "png",
    base_resampling: str = "bilinear",
) -> DataFrame:
    """Global-geodetic (EPSG:4326 plate-carree) pyramid — the gdal2tiles
    `--profile geodetic` counterpart of render_pyramid. Same shuffle-free
    one-mapInPandas-stage shape and TILES_SCHEMA output; tile keys live on
    the 2^(z+1) x 2^z grid (y_xyz flips over the 2^z ROW count), tile
    centers are closed-form degrees (no inverse mercator), and H3/S2
    cells use the true center latitude (geodetic tiles exist beyond the
    mercator ±85.05° clip; both cell systems are defined at the poles)."""
    enc = codecs.encode_tile_png if encode == "png" else codecs.encode_raw

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                tiles = render_image_pyramid_geodetic(
                    rec, overview_levels, resampling, zmin, zmax, base_resampling
                )
                for (z, tx, ty), arr in sorted(tiles.items()):
                    rows.append((rec["image_id"], z, tx, ty, rec["caption"], enc(arr)))
            if not rows:
                continue
            out = pd.DataFrame(rows, columns=["image_id", "z", "x", "y", "caption", "tile"])
            z = out["z"].to_numpy(np.int64)
            txa = out["x"].to_numpy(np.int64)
            tya = out["y"].to_numpy(np.int64)
            span = tm.RES0_GEO / (2.0 ** z.astype(np.float64)) * TILE
            lon = (txa.astype(np.float64) + 0.5) * span - 180.0
            lat = (tya.astype(np.float64) + 0.5) * span - 90.0
            h3 = np.zeros(len(out), dtype=np.int64)
            s2 = np.zeros(len(out), dtype=np.int64)
            h3res = np.clip(z - 2, 0, 12).astype(np.int64)
            s2lvl = np.clip(z, 0, 30).astype(np.int64)
            for rv in np.unique(h3res):
                m = h3res == rv
                h3[m] = h3lite.latlng_to_cell(lat[m], lon[m], int(rv))
            for lv in np.unique(s2lvl):
                m = s2lvl == lv
                s2[m] = s2lite.latlng_to_cell(lat[m], lon[m], int(lv))
            yield pd.DataFrame(
                {
                    "image_id": out["image_id"],
                    "z": out["z"].astype("int32"),
                    "x": out["x"],
                    "y": out["y"],
                    "y_xyz": (np.int64(1) << z) - 1 - tya,
                    "tile": out["tile"],
                    "h3_cell": h3,
                    "h3_res": h3res.astype("int32"),
                    "s2_cell": s2,
                    "lat": lat,
                    "lon": lon,
                    "caption": out["caption"],
                    "part_id": np.full(len(out), pid, dtype=np.int32),
                }
            )

    return images.mapInPandas(fn, schema=TILES_SCHEMA)
