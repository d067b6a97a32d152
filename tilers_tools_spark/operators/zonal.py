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


def label_regions_np(a: np.ndarray, connect8: bool = False) -> np.ndarray:
    """4-connected (default) or 8-connected equal-value region labeling
    (the `gdal_polygonize` / `-8connected` grouping rules). Returns an
    int64 label image where every pixel of a region carries the
    region's canonical id = ``min_row * w + min_col``
    of its first pixel in scan order — deterministic and independent of
    traversal, so two engines labeling the same raster agree exactly.

    Runs-based two-pass union-find: each row is cut into equal-value
    runs (vectorized); overlapping equal-value runs of adjacent rows
    union. Union always points the larger run id at the smaller, so a
    region's root is its scan-order-first run and the canonical id falls
    out without a second normalization pass.
    """
    if a.ndim != 2:
        raise ValueError("label_regions_np expects a single-band 2-D array")
    h, w = a.shape
    run_img = np.empty((h, w), np.int64)
    run_start: list[int] = []  # per run: row * w + start col
    parent = np.empty(0, np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    prev: list[tuple[int, int, int]] = []
    for r in range(h):
        row = a[r]
        chg = np.flatnonzero(row[1:] != row[:-1]) + 1
        starts = np.concatenate(([0], chg))
        ends = np.concatenate((chg, [w]))
        base = len(run_start)
        cur = []
        for s, e in zip(starts, ends):
            rid = len(run_start)
            run_start.append(r * w + int(s))
            run_img[r, s:e] = rid
            cur.append((int(s), int(e), rid))
        parent = np.concatenate([parent, np.arange(base, len(run_start))])
        if r:
            i = j = 0
            up = a[r - 1]
            while i < len(prev) and j < len(cur):
                ps, pe, pr = prev[i]
                cs, ce, cr = cur[j]
                if connect8:
                    # runs are 8-adjacent when they overlap OR touch
                    # diagonally: ps <= ce-1+1 and cs <= pe-1+1; the
                    # runs' values are constant, so compare endpoints
                    touch = ps <= ce and cs <= pe and up[ps] == row[cs]
                else:
                    o = max(ps, cs)
                    touch = o < min(pe, ce) and up[o] == row[o]
                if touch:
                    rp, rc = find(pr), find(cr)
                    if rp != rc:
                        if rp < rc:
                            parent[rc] = rp
                        else:
                            parent[rp] = rc
                if pe <= ce:
                    # 8-conn lookahead: when this prev run ends exactly
                    # where cur_j ends (pe == ce), the NEXT cur run
                    # starts at pe and still touches prev diagonally —
                    # the sweep would otherwise skip that pair
                    if connect8 and pe == ce and j + 1 < len(cur):
                        ns, _ne, nr = cur[j + 1]
                        if ns == pe and up[ps] == row[ns]:
                            rp, rc = find(pr), find(nr)
                            if rp != rc:
                                if rp < rc:
                                    parent[rc] = rp
                                else:
                                    parent[rp] = rc
                    i += 1
                else:
                    j += 1
        prev = cur
    roots = np.arange(len(run_start), dtype=np.int64)
    for x in range(len(run_start)):
        roots[x] = find(x)
    canon = np.asarray(run_start, np.int64)[roots]
    return canon[run_img]


def region_summary_np(a: np.ndarray, connect8: bool = False):
    """Shared region-table kernel (polygonize + contour_bands): label
    equal-value regions and reduce to per-region (ids, values, n_pixels,
    bbox, 4-edge perimeter) arrays. Perimeter = 4 per pixel minus 2 per
    same-value internal edge (4-adjacent same-value pixels share a
    region in both connectivities, so dense-equality is value-equality)."""
    h, w = a.shape
    lab = label_regions_np(a, connect8=connect8)
    ids, dense = np.unique(lab, return_inverse=True)
    dense = dense.reshape(h, w)
    n = len(ids)
    npix = np.bincount(dense.ravel(), minlength=n)
    rows_idx = np.repeat(np.arange(h), w)
    cols_idx = np.tile(np.arange(w), h)
    flat = dense.ravel()
    inf = np.iinfo(np.int64).max
    minr = np.full(n, inf); minc = np.full(n, inf)
    maxr = np.full(n, -1); maxc = np.full(n, -1)
    np.minimum.at(minr, flat, rows_idx)
    np.minimum.at(minc, flat, cols_idx)
    np.maximum.at(maxr, flat, rows_idx)
    np.maximum.at(maxc, flat, cols_idx)
    perim = 4 * npix.astype(np.int64)
    same_h = dense[:, 1:] == dense[:, :-1]
    same_v = dense[1:, :] == dense[:-1, :]
    perim -= 2 * np.bincount(dense[:, 1:][same_h].ravel(), minlength=n)
    perim -= 2 * np.bincount(dense[1:, :][same_v].ravel(), minlength=n)
    vals = a[ids // w, ids % w]  # canonical pixel carries the value
    return ids, vals, npix, minr, minc, maxr, maxc, perim


def polygonize(
    images: DataFrame,
    connect8: bool = False,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_polygonize` parity as a region-summary table: group
    4-connected (or 8-connected with ``connect8=True`` — the utility's
    `-8` flag; perimeter stays the 4-edge different-VALUE count in both
    modes) pixels of equal value into regions and emit one row per
    region — (image_id, region_id, value, n_pixels, min_row, min_col,
    max_row, max_col, perimeter). ``region_id`` is the canonical
    ``min_row * w + min_col`` pixel of the region (deterministic across
    engines); ``perimeter`` counts pixel edges bordering a
    different-value pixel or the raster boundary (4-connected edge
    count, so a lone pixel is 4 and an HxW constant raster is 2*(H+W)).

    Documented deviation from the GDAL utility: emits the region table,
    not WKT rings — ring tracing is the contour module's territory; the
    grouping rule (4-connectivity, exact value equality) is identical.

    Scale shape: one Arrow-batched mapInPandas pass; each raster labels
    independently (regions never span rasters, matching per-file
    gdal_polygonize), output rows are narrow summaries — pixels never
    shuffle. A blob that fails decode contributes no rows but is counted
    in no silent path (decode raises propagate — polygonize inputs are
    engine-produced rasters, not wild archives).
    """
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                id_col: [], "region_id": [], "value": [], "n_pixels": [],
                "min_row": [], "min_col": [], "max_row": [], "max_col": [],
                "perimeter": [],
            }
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("polygonize expects single-band rasters")
                ids, vals, npix, minr, minc, maxr, maxc, perim = region_summary_np(
                    a, connect8=connect8
                )
                out[id_col].extend([iid] * len(ids))
                out["region_id"].extend(ids.tolist())
                out["value"].extend(np.asarray(vals, np.float64).tolist())
                out["n_pixels"].extend(npix.tolist())
                out["min_row"].extend(minr.tolist())
                out["min_col"].extend(minc.tolist())
                out["max_row"].extend(maxr.tolist())
                out["max_col"].extend(maxc.tolist())
                out["perimeter"].extend(perim.tolist())
            yield pd.DataFrame(out)

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, region_id long, value double, n_pixels long, "
        "min_row long, min_col long, max_row long, max_col long, perimeter long",
    )


# ---------------------------------------------------------------------------
# gdal_proximity parity: exact Euclidean distance transform
# ---------------------------------------------------------------------------


def edt_np(mask: np.ndarray) -> np.ndarray:
    """Exact squared Euclidean distance transform of a boolean mask
    (True = target). int64 squared pixel distances — every value is an
    exact integer, so independent implementations agree bit-for-bit.

    Two separable passes: (1) per column, distance to the nearest target
    row (vectorized cummax/cummin of target row indices); (2) per row,
    ``D[y,x] = min_x' ((x-x')^2 + vd[y,x']^2)`` — the exact lower
    envelope evaluated as a vectorized min over x' in row chunks (O(w^2)
    per row, all inside NumPy; rasters here are tiles, not continents).
    A mask with no targets returns all -1 (gdal_proximity's nodata
    convention for an empty target set).
    """
    h, w = mask.shape
    if not mask.any():
        return np.full((h, w), -1, np.int64)
    big = h + w + 1  # > any possible pixel distance; big^2 fits int64
    rows = np.arange(h, dtype=np.int64)[:, None]
    up = np.where(mask, rows, -big)
    up = np.maximum.accumulate(up, axis=0)
    down = np.where(mask, rows, 2 * big)
    down = np.minimum.accumulate(down[::-1], axis=0)[::-1]
    vd = np.minimum(rows - up, down - rows)
    vd = np.minimum(vd, big)  # columns with no target
    vd2 = vd.astype(np.int64) ** 2
    dx2 = (np.arange(w, dtype=np.int64)[:, None] - np.arange(w, dtype=np.int64)[None, :]) ** 2
    out = np.empty((h, w), np.int64)
    chunk = max(1, (1 << 22) // max(1, w * w))  # ~32MB of int64 per block
    for y0 in range(0, h, chunk):
        block = vd2[y0 : y0 + chunk, None, :] + dx2[None, :, :]
        out[y0 : y0 + chunk] = block.min(axis=2)
    return out


def proximity(
    images: DataFrame,
    target: float,
    quant_step: float | None = None,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_proximity` parity: per raster, the exact squared Euclidean
    pixel distance from every pixel to the nearest target pixel
    (``floor(v / quant_step) == target`` when quantized, else exact
    value equality). Emits one summary row per raster —
    (image_id, n_target, max_sqdist, sum_sqdist, sqdist_md5) — where
    sqdist_md5 hashes the full int64 grid, pinning every pixel.

    Squared distances keep the whole contract in integers (gdal's
    -distunits pixel with a final sqrt is a presentation detail);
    documented deviation: no maxdist clamp / fixed-buffer modes.

    Scale shape: one Arrow-batched mapInPandas pass, per-raster
    independent (proximity never crosses file bounds in the reference
    toolchain either); narrow rows out, pixels never shuffle.
    """
    import hashlib

    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("proximity expects single-band rasters")
                v = np.floor(a.astype(np.float64) / quant_step) if quant_step else a
                mask = v == target
                d = edt_np(mask)
                rows.append(
                    (
                        iid,
                        int(mask.sum()),
                        int(d.max()),
                        int(d.sum()),
                        hashlib.md5(np.ascontiguousarray(d).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_target", "max_sqdist", "sum_sqdist", "sqdist_md5"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, n_target long, max_sqdist long, "
        "sum_sqdist long, sqdist_md5 string",
    )


# ---------------------------------------------------------------------------
# gdal_sieve parity: remove small regions
# ---------------------------------------------------------------------------


def sieve_np(
    a: np.ndarray, threshold: int, connect8: bool = False
) -> tuple[np.ndarray, int, int, int]:
    """`gdal_sieve` semantics under a deterministic spec (binding for
    engine AND the golden's independent scalar recoding):

    1. Label 4-connected (or 8-connected with ``connect8`` — the
       utility's `-8` flag; the neighbor search in step 3 uses the SAME
       connectivity) equal-value regions (canonical id =
       ``min_row * w + min_col``, as label_regions_np).
    2. A region is *small* if its pixel count < threshold. If there are
       no small regions, or only one region exists, stop.
    3. Every small region (all of them, one sweep) is repainted with the
       value of its 4-adjacent neighbor region chosen by
       (largest pixel count, then smallest canonical id). Repaints use
       the labeling/values of the CURRENT sweep simultaneously.
    4. Relabel and repeat (merged neighbors can grow past the
       threshold; region count strictly decreases, so this terminates).

    Returns (sieved array, n_regions_before, n_regions_after,
    n_pixels_changed vs the input).
    """
    cur = a.copy()
    h, w = a.shape
    n_before = n_after = len(np.unique(label_regions_np(cur, connect8=connect8)))
    while True:
        lab = label_regions_np(cur, connect8=connect8)
        ids, dense = np.unique(lab, return_inverse=True)
        dense = dense.reshape(h, w)
        n = len(ids)
        n_after = n
        if n <= 1:
            break
        sizes = np.bincount(dense.ravel(), minlength=n)
        small = np.flatnonzero(sizes < threshold)
        if len(small) == 0:
            break
        # adjacency pairs across region boundaries (both orientations)
        pairs = []
        dh = dense[:, 1:] != dense[:, :-1]
        pairs.append((dense[:, 1:][dh], dense[:, :-1][dh]))
        pairs.append((dense[:, :-1][dh], dense[:, 1:][dh]))
        dv = dense[1:, :] != dense[:-1, :]
        pairs.append((dense[1:, :][dv], dense[:-1, :][dv]))
        pairs.append((dense[:-1, :][dv], dense[1:, :][dv]))
        if connect8:
            d1 = dense[1:, 1:] != dense[:-1, :-1]  # down-right diagonal
            pairs.append((dense[1:, 1:][d1], dense[:-1, :-1][d1]))
            pairs.append((dense[:-1, :-1][d1], dense[1:, 1:][d1]))
            d2 = dense[1:, :-1] != dense[:-1, 1:]  # down-left diagonal
            pairs.append((dense[1:, :-1][d2], dense[:-1, 1:][d2]))
            pairs.append((dense[:-1, 1:][d2], dense[1:, :-1][d2]))
        pa = np.concatenate([p[0] for p in pairs])
        pb = np.concatenate([p[1] for p in pairs])
        # per region, best neighbor by (size desc, canonical id asc):
        # sort pairs so the best neighbor lands LAST, then let fancy
        # assignment keep the last write per region
        order = np.lexsort((-ids[pb], sizes[pb]))
        best = np.full(n, -1, np.int64)
        best[pa[order]] = pb[order]
        vals = cur[ids // w, ids % w]
        is_small = np.zeros(n, bool)
        is_small[small] = True
        repaint = is_small[dense] & (best[dense] >= 0)
        cur = np.where(repaint, vals[best[dense]], cur)
    changed = int((cur != a).sum())
    return cur, n_before, n_after, changed


def sieve(
    images: DataFrame,
    threshold: int,
    quant_step: float | None = None,
    connect8: bool = False,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_sieve` parity: drop 4-connected (or 8-connected, the `-8`
    flag) regions smaller than
    ``threshold`` pixels, repainting them with their dominant neighbor
    (deterministic rule in sieve_np). One summary row per raster:
    (image_id, n_regions_before, n_regions_after, n_changed, out_md5) —
    out_md5 hashes the sieved float32 grid, pinning every pixel.

    Scale shape: per-raster independent Arrow pass, narrow rows out.
    """
    import hashlib

    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("sieve expects single-band rasters")
                if quant_step:
                    a = np.floor(a.astype(np.float64) / quant_step).astype(np.float32)
                out, nb, na, changed = sieve_np(a, threshold, connect8=connect8)
                rows.append(
                    (
                        iid, nb, na, changed,
                        hashlib.md5(np.ascontiguousarray(out.astype(np.float32)).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_regions_before", "n_regions_after", "n_changed", "out_md5"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, n_regions_before long, n_regions_after long, "
        "n_changed long, out_md5 string",
    )


# ---------------------------------------------------------------------------
# gdal_rasterize parity: burn polygons into a banded grid
# ---------------------------------------------------------------------------


def rasterize(
    zones: DataFrame,
    grid: dict,
    burn: dict,
    n_bands: int = 4,
) -> DataFrame:
    """`gdal_rasterize` parity: burn polygon values into a north-up
    EPSG:3857 grid. Pixel-center containment uses the SAME even-odd
    scanline kernel as the cutline mask (`cutline.grid_mask`); polygons
    burn in ascending poly_id order, later ids overwriting earlier
    (gdal_rasterize's feature-order rule made deterministic).

    ``grid`` = {w, h, gsd, mx0, my1} (meters, top-left corner);
    ``burn`` maps poly_id -> float burn value; background is 0.0.

    Scale shape: the grid is split into ``n_bands`` horizontal bands,
    one task each (this is how a 10^6x10^6 rasterization distributes:
    bands/tiles x broadcast geometry). Zones are contract-small (cutline
    convention) and ship in the closure; each band emits narrow count
    rows per final value — (band, y0, band_h, poly_id, burn_value,
    n_pixels, band_md5) — where band_md5 pins the band's float32 pixels
    and poly_id '__bg__' carries the background count.
    """
    import hashlib

    spark = zones.sparkSession
    polys = sorted(
        (r["poly_id"], ring_to_merc(r["ring"]))
        for r in zones.select("poly_id", "ring").collect()
    )
    w, h, gsd = int(grid["w"]), int(grid["h"]), float(grid["gsd"])
    mx0, my1 = float(grid["mx0"]), float(grid["my1"])
    band_h = (h + n_bands - 1) // n_bands
    bands = [(b, b * band_h, min(band_h, h - b * band_h)) for b in range(n_bands)]
    bands = [b for b in bands if b[2] > 0]
    bdf = spark.createDataFrame(bands, "band int, y0 int, band_h int")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for band, y0, bh in pdf[["band", "y0", "band_h"]].itertuples(index=False):
                g = np.zeros((bh, w), np.float32)
                owner = np.full((bh, w), "", object)
                top = my1 - y0 * gsd
                for pid, ring_m in polys:
                    m = grid_mask([ring_m], mx0, top, gsd, bh, w)
                    g[m] = np.float32(burn[pid])
                    owner[m] = pid
                md5 = hashlib.md5(g.tobytes()).hexdigest()
                ids, counts = np.unique(owner, return_counts=True)
                for pid, cnt in zip(ids, counts):
                    rows.append(
                        (
                            int(band), int(y0), int(bh),
                            pid if pid else "__bg__",
                            float(burn.get(pid, 0.0)),
                            int(cnt),
                            md5,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["band", "y0", "band_h", "poly_id", "burn_value", "n_pixels", "band_md5"],
            )

    return bdf.mapInPandas(
        fn,
        schema="band int, y0 int, band_h int, poly_id string, "
        "burn_value double, n_pixels long, band_md5 string",
    )


# ---------------------------------------------------------------------------
# gdal_grid (invdist) parity: IDW interpolation onto a banded grid
# ---------------------------------------------------------------------------


def idw_np(
    mx: np.ndarray, my: np.ndarray, pts: np.ndarray, power: int = 2
) -> np.ndarray:
    """Inverse-distance weighting at pixel centers: value =
    sum(z_i / d_i^power) / sum(1 / d_i^power); an exact hit (d^2 <
    1e-12 m^2) takes the coincident point's value (smallest point index
    on ties). pts = (N, 3) [x, y, z]. Vectorized over one band."""
    d2 = (mx[:, None] - pts[None, :, 0]) ** 2 + (my[:, None] - pts[None, :, 1]) ** 2
    hit = d2 < 1e-12
    with np.errstate(divide="ignore"):
        wgt = 1.0 / np.where(hit, 1.0, d2) ** (power / 2)
    val = (wgt * pts[None, :, 2]).sum(axis=1) / wgt.sum(axis=1)
    any_hit = hit.any(axis=1)
    first_hit = np.argmax(hit, axis=1)
    return np.where(any_hit, pts[first_hit, 2], val)


def grid_idw(
    points: DataFrame,
    grid: dict,
    power: int = 2,
    n_bands: int = 4,
    quant: float = 1e-3,
) -> DataFrame:
    """`gdal_grid -a invdist` parity: scattered (x, y, z) points ->
    north-up grid by inverse-distance-squared weighting at pixel
    centers. Points are broadcast (scatter sets are small relative to
    the grid in the gdal_grid use case); the grid distributes as
    horizontal bands, one task per band, like `rasterize`.

    Per band emits (band, y0, band_h, n_cells, q_sum, q_min, q_max,
    band_md5) where q_* and the md5 are over the band's values
    QUANTIZED to ``quant`` units (int64 round-half-even): quantization
    makes the contract integer-exact, absorbing summation-order ULP
    differences between implementations.
    """
    import hashlib

    spark = points.sparkSession
    pts = np.array(
        sorted(
            (float(r["x"]), float(r["y"]), float(r["z"]))
            for r in points.select("x", "y", "z").collect()
        ),
        np.float64,
    )
    w, h, gsd = int(grid["w"]), int(grid["h"]), float(grid["gsd"])
    mx0, my1 = float(grid["mx0"]), float(grid["my1"])
    band_h = (h + n_bands - 1) // n_bands
    bands = [(b, b * band_h, min(band_h, h - b * band_h)) for b in range(n_bands)]
    bands = [b for b in bands if b[2] > 0]
    bdf = spark.createDataFrame(bands, "band int, y0 int, band_h int")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for band, y0, bh in pdf[["band", "y0", "band_h"]].itertuples(index=False):
                cc = np.tile(np.arange(w, dtype=np.float64), bh)
                rr = np.repeat(np.arange(bh, dtype=np.float64), w)
                mx = mx0 + (cc + 0.5) * gsd
                my = (my1 - y0 * gsd) - (rr + 0.5) * gsd
                v = idw_np(mx, my, pts, power)
                q = np.round(v / quant).astype(np.int64)
                rows.append(
                    (
                        int(band), int(y0), int(bh), int(q.size),
                        int(q.sum()), int(q.min()), int(q.max()),
                        hashlib.md5(q.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["band", "y0", "band_h", "n_cells", "q_sum", "q_min", "q_max", "band_md5"],
            )

    return bdf.mapInPandas(
        fn,
        schema="band int, y0 int, band_h int, n_cells long, "
        "q_sum long, q_min long, q_max long, band_md5 string",
    )


# ---------------------------------------------------------------------------
# gdal_fillnodata parity: directional-raycast inverse-distance fill
# ---------------------------------------------------------------------------


def fillnodata_np(
    a: np.ndarray, valid: np.ndarray, max_dist: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """Fill nodata pixels from the FIRST valid pixel along each of the 8
    compass rays (within ``max_dist`` steps), weighted by inverse squared
    pixel distance — d^2 = steps^2 axially, 2*steps^2 diagonally, an
    integer, so the weight set is implementation-independent (documented
    deviation from gdal_fillnodata's 1/d weighting: squared keeps the
    contract exact). Pixels no ray reaches stay nodata.

    Returns (filled float64 array, filled_mask). Vectorized as 8
    directional sweeps x max_dist shifted-mask steps (each step is an
    O(h*w) NumPy op — max_dist is a small constant, never image-sized).
    """
    h, w = a.shape
    af = np.where(valid, a.astype(np.float64), 0.0)
    num = np.zeros((h, w))
    den = np.zeros((h, w))
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)):
        found = np.zeros((h, w), bool)
        for step in range(1, max_dist + 1):
            sy, sx = dy * step, dx * step
            # source pixel (r - sy, c - sx) seen from each target pixel
            src_v = np.zeros((h, w))
            src_ok = np.zeros((h, w), bool)
            ty0, ty1 = max(0, sy), min(h, h + sy)
            tx0, tx1 = max(0, sx), min(w, w + sx)
            if ty1 <= ty0 or tx1 <= tx0:
                break  # shift exceeds the raster; farther steps too
            src_v[ty0:ty1, tx0:tx1] = af[ty0 - sy : ty1 - sy, tx0 - sx : tx1 - sx]
            src_ok[ty0:ty1, tx0:tx1] = valid[ty0 - sy : ty1 - sy, tx0 - sx : tx1 - sx]
            hit = src_ok & ~found
            if hit.any():
                wgt = 1.0 / ((dy * dy + dx * dx) * step * step)
                num += np.where(hit, wgt * src_v, 0.0)
                den += np.where(hit, wgt, 0.0)
            found |= src_ok
    fill_mask = ~valid & (den > 0)
    out = np.where(valid, a.astype(np.float64), np.where(fill_mask, num / np.where(den > 0, den, 1.0), np.nan))
    return out, fill_mask


def fillnodata(
    images: DataFrame,
    max_dist: int = 16,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_fillnodata` parity: NaN pixels of each single-band raster
    filled per fillnodata_np's spec. Emits one summary row per raster —
    (image_id, n_nodata, n_filled, n_unfilled, q_sum, grid_md5) — where
    the grid md5 covers the output QUANTIZED to ``quant`` units (int64,
    unfillable pixels as the sentinel -2^60), making the whole contract
    integer-exact across implementations.

    Scale shape: per-raster independent Arrow pass (the gdal utility is
    per-file too); narrow rows out, pixels never shuffle.
    """
    import hashlib

    from ..functions import tiffcodec

    SENT = -(2**60)

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("fillnodata expects single-band rasters")
                a = a.astype(np.float64)
                valid = ~np.isnan(a)
                out, filled = fillnodata_np(a, valid, max_dist)
                q = np.where(
                    np.isnan(out), SENT, np.round(out / quant)
                ).astype(np.int64)
                n_nodata = int((~valid).sum())
                rows.append(
                    (
                        iid,
                        n_nodata,
                        int(filled.sum()),
                        n_nodata - int(filled.sum()),
                        int(q[filled].sum()),
                        hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_nodata", "n_filled", "n_unfilled", "q_sum", "grid_md5"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, n_nodata long, n_filled long, n_unfilled long, "
        "q_sum long, grid_md5 string",
    )


# ---------------------------------------------------------------------------
# gdalinfo -stats / -hist parity: integer-exact raster statistics
# ---------------------------------------------------------------------------


def raster_stats_np(
    a: np.ndarray, n_bins: int = 16, quant: float = 1e-3
) -> tuple[dict, list[int]]:
    """Per-raster statistics under an INTEGER-EXACT contract: pixels are
    quantized to ``quant`` units (qv = round(v/quant), int64) and every
    statistic is computed on the ints — q_min/q_max/q_sum/q_sumsq are
    exact, so mean/stddev are derivable by the caller without any
    cross-engine float-summation ambiguity (gdalinfo -stats reports
    float mean/std; the quantized sums carry the same information).

    Histogram (gdalinfo -hist analogue, documented integer rule): the
    quantized span [q_min, q_max] is cut into ``n_bins`` buckets,
    bucket(qv) = (qv - q_min) * n_bins // (q_max - q_min + 1) — pure
    integer floor division, implementation-independent. Empty buckets
    are reported with count 0. An all-nodata raster gets stats zeros
    and NO histogram (n_valid = 0 marks it).
    """
    h, w = a.shape
    valid = ~np.isnan(a)
    n_valid = int(valid.sum())
    base = {"w": w, "h": h, "n_valid": n_valid, "n_nodata": h * w - n_valid}
    if n_valid == 0:
        base.update(q_min=0, q_max=0, q_sum=0, q_sumsq=0)
        return base, []
    qv = np.round(a[valid].astype(np.float64) / quant).astype(np.int64)
    qmin, qmax = int(qv.min()), int(qv.max())
    base.update(
        q_min=qmin,
        q_max=qmax,
        q_sum=int(qv.sum()),
        q_sumsq=int((qv * qv).sum()),
    )
    span = qmax - qmin + 1
    idx = (qv - qmin) * n_bins // span
    counts = np.bincount(idx, minlength=n_bins)
    return base, [int(c) for c in counts]


def raster_stats(
    images: DataFrame,
    n_bins: int = 16,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdalinfo -stats -hist` parity over single-band rasters: one row
    per (raster, histogram bucket) carrying the per-raster integer-exact
    stats (see raster_stats_np) plus that bucket's count; an all-nodata
    raster emits a single bucket=-1 row with count 0 so it stays visible
    in the output.

    Scale shape: per-raster independent Arrow pass (map-side reduction
    of every pixel to n_bins + 6 ints); pixels never shuffle.
    """
    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("raster_stats expects single-band rasters")
                base, counts = raster_stats_np(
                    a.astype(np.float64), n_bins=n_bins, quant=quant
                )
                common = (
                    iid, base["w"], base["h"], base["n_valid"], base["n_nodata"],
                    base["q_min"], base["q_max"], base["q_sum"], base["q_sumsq"],
                )
                if not counts:
                    rows.append(common + (-1, 0))
                else:
                    for b, cnt in enumerate(counts):
                        rows.append(common + (b, cnt))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "w", "h", "n_valid", "n_nodata", "q_min", "q_max",
                    "q_sum", "q_sumsq", "bucket", "bucket_count",
                ],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, w int, h int, n_valid long, n_nodata long, "
        "q_min long, q_max long, q_sum long, q_sumsq long, "
        "bucket int, bucket_count long",
    )


# ---------------------------------------------------------------------------
# gdal_grid -a average / -a nearest parity: banded scatter-to-grid stats
# ---------------------------------------------------------------------------

GRID_SENT = -(2**60)


def grid_average_np(
    mx: np.ndarray, my: np.ndarray, pts: np.ndarray, radius: float
) -> np.ndarray:
    """`gdal_grid -a average:radius` analogue: plain mean of the z of
    every point with d^2 <= radius^2 (INCLUSIVE boundary) of each pixel
    center; cells with no point in range get NaN. Vectorized over one
    band; the z sums are dyadic-safe for half-unit fixture values, and
    the gate quantizes, so the contract is implementation-independent."""
    d2 = (mx[:, None] - pts[None, :, 0]) ** 2 + (my[:, None] - pts[None, :, 1]) ** 2
    inr = d2 <= radius * radius
    cnt = inr.sum(axis=1)
    s = np.where(inr, pts[None, :, 2], 0.0).sum(axis=1)
    with np.errstate(invalid="ignore"):
        return np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)


def grid_metric_np(
    mx: np.ndarray, my: np.ndarray, pts: np.ndarray, radius: float, metric: str
) -> np.ndarray:
    """`gdal_grid` data-metrics analogues over the inclusive-boundary
    radius neighborhood: minimum | maximum | range | count |
    average_distance. Cells with no point in range get NaN (GDAL's
    nodata). Accumulation is a LEFT-TO-RIGHT fold over the canonical
    sorted-points order (vectorized across pixels, python loop over the
    few broadcast points) so a scalar per-pixel replay is bit-identical:
    +, /, sqrt, min, max are all exactly-rounded IEEE ops."""
    n = pts.shape[0]
    cnt = np.zeros(mx.shape[0], np.int64)
    s = np.zeros(mx.shape[0], np.float64)
    mn = np.full(mx.shape[0], np.inf)
    mx_v = np.full(mx.shape[0], -np.inf)
    r2 = radius * radius
    for i in range(n):
        d2 = (mx - pts[i, 0]) ** 2 + (my - pts[i, 1]) ** 2
        inr = d2 <= r2
        cnt += inr
        if metric == "average_distance":
            s = s + np.where(inr, np.sqrt(d2), 0.0)
        else:
            z = pts[i, 2]
            mn = np.where(inr, np.minimum(mn, z), mn)
            mx_v = np.where(inr, np.maximum(mx_v, z), mx_v)
    empty = cnt == 0
    if metric == "minimum":
        v = mn
    elif metric == "maximum":
        v = mx_v
    elif metric == "range":
        v = mx_v - mn
    elif metric == "count":
        v = cnt.astype(np.float64)
    elif metric == "average_distance":
        with np.errstate(invalid="ignore"):
            v = s / np.maximum(cnt, 1)
    else:
        raise ValueError(f"unknown gdal_grid metric {metric!r}")
    return np.where(empty, np.nan, v)


def grid_nearest_np(mx: np.ndarray, my: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """`gdal_grid -a nearest` analogue: z of the point with the smallest
    d^2 to the pixel center; ties break to the SMALLEST index in the
    canonical sorted-points order (np.argmin first-match rule — the
    golden replays it with a scalar strict-< scan)."""
    d2 = (mx[:, None] - pts[None, :, 0]) ** 2 + (my[:, None] - pts[None, :, 1]) ** 2
    return pts[np.argmin(d2, axis=1), 2]


def grid_stat(
    points: DataFrame,
    grid: dict,
    algorithm: str = "average",
    radius: float = 10.0,
    n_bands: int = 4,
    quant: float = 1e-3,
) -> DataFrame:
    """`gdal_grid -a average|nearest|minimum|maximum|range|count|
    average_distance` parity, same banded scale shape as grid_idw
    (points broadcast in the closure — small by the gdal_grid contract;
    one task per horizontal band; pixels never shuffle).

    Per band emits (alg, band, y0, band_h, n_cells, n_empty, q_sum,
    q_min, q_max, band_md5): q_* cover NON-empty cells quantized to
    ``quant`` (int64, all-zero when every cell is empty); the md5 covers
    the full quantized band with empty cells as the GRID_SENT sentinel.
    """
    import hashlib

    metrics = ("minimum", "maximum", "range", "count", "average_distance")
    if algorithm not in ("average", "nearest") + metrics:
        raise ValueError(f"unknown gdal_grid algorithm {algorithm!r}")
    spark = points.sparkSession
    pts = np.array(
        sorted(
            (float(r["x"]), float(r["y"]), float(r["z"]))
            for r in points.select("x", "y", "z").collect()
        ),
        np.float64,
    )
    w, h, gsd = int(grid["w"]), int(grid["h"]), float(grid["gsd"])
    mx0, my1 = float(grid["mx0"]), float(grid["my1"])
    band_h = (h + n_bands - 1) // n_bands
    bands = [(b, b * band_h, min(band_h, h - b * band_h)) for b in range(n_bands)]
    bands = [b for b in bands if b[2] > 0]
    bdf = spark.createDataFrame(bands, "band int, y0 int, band_h int")

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for band, y0, bh in pdf[["band", "y0", "band_h"]].itertuples(index=False):
                cc = np.tile(np.arange(w, dtype=np.float64), bh)
                rr = np.repeat(np.arange(bh, dtype=np.float64), w)
                mx = mx0 + (cc + 0.5) * gsd
                my = (my1 - y0 * gsd) - (rr + 0.5) * gsd
                if algorithm == "average":
                    v = grid_average_np(mx, my, pts, radius)
                elif algorithm == "nearest":
                    v = grid_nearest_np(mx, my, pts)
                else:
                    v = grid_metric_np(mx, my, pts, radius, algorithm)
                empty = np.isnan(v)
                q = np.where(
                    empty, GRID_SENT, np.round(np.where(empty, 0.0, v) / quant)
                ).astype(np.int64)
                nz = q[~empty]
                rows.append(
                    (
                        algorithm, int(band), int(y0), int(bh), int(q.size),
                        int(empty.sum()),
                        int(nz.sum()) if nz.size else 0,
                        int(nz.min()) if nz.size else 0,
                        int(nz.max()) if nz.size else 0,
                        hashlib.md5(q.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "alg", "band", "y0", "band_h", "n_cells", "n_empty",
                    "q_sum", "q_min", "q_max", "band_md5",
                ],
            )

    return bdf.mapInPandas(
        fn,
        schema="alg string, band int, y0 int, band_h int, n_cells long, "
        "n_empty long, q_sum long, q_min long, q_max long, band_md5 string",
    )


# ---------------------------------------------------------------------------
# gdal2xyz parity: raster -> relational (x, y, value) table
# ---------------------------------------------------------------------------


def raster_to_xyz(
    images: DataFrame,
    stride: int = 1,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal2xyz -skipnodata` parity: one row per valid pixel (row/col
    stepped by ``stride``) carrying the pixel-center EPSG:3857 coords
    and the value quantized to ``quant`` units (mx/my rounded to 1e-3 m
    so the relational contract is exact cross-engine). NaN pixels are
    skipped — gdal2xyz's skip-nodata mode; rasters without a georef
    raise (fail-loud, NaN-row convention does not fit a coordinate
    table).

    This is the raster->table bridge: its output joins relationally
    (DuckDB/Spark SQL) against any other table — deliberately row-per-
    pixel, the caller chooses stride to bound the blow-up. Scale shape:
    per-raster independent Arrow pass; rows stream out of the scan with
    no shuffle.
    """

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            out = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, geo = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("raster_to_xyz expects single-band rasters")
                if geo is None:
                    raise ValueError(f"raster_to_xyz: {iid!r} has no georef")
                h, w = a.shape
                gsd = float(geo["gsd"])
                mx0, my1 = float(geo["mx0"]), float(geo["my1"])
                sub = a[::stride, ::stride].astype(np.float64)
                rr, cc = np.nonzero(~np.isnan(sub))
                r = rr * stride
                c = cc * stride
                v = sub[rr, cc]
                out.append(
                    pd.DataFrame(
                        {
                            id_col: iid,
                            "row": r.astype(np.int32),
                            "col": c.astype(np.int32),
                            "mx": np.round((mx0 + (c + 0.5) * gsd) / 1e-3) * 1e-3,
                            "my": np.round((my1 - (r + 0.5) * gsd) / 1e-3) * 1e-3,
                            "q_value": np.round(v / quant).astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                columns=[id_col, "row", "col", "mx", "my", "q_value"]
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, row int, col int, mx double, my double, q_value long",
    )


# ---------------------------------------------------------------------------
# nearblack parity: border-connected collar removal
# ---------------------------------------------------------------------------


def nearblack_np(
    a: np.ndarray, target: float = 0.0, tol: float = 2.0
) -> tuple[np.ndarray, np.ndarray]:
    """`nearblack` parity: mark the border-connected collar of pixels
    with |v - target| <= tol (4-connected flood from every edge pixel —
    interior lakes of near-target pixels are NOT collar, exactly
    nearblack's edge-inward behavior) and return (filled array with
    collar as NaN, collar mask). NaN input pixels count as near-target
    (they extend the collar but were already nodata).

    Vectorized as an iterative dilation flood: each pass ORs the
    4-neighbor shifts of the current collar against the near-target
    mask; iterations <= h+w (worst-case serpentine), each an O(h*w)
    NumPy op."""
    h, w = a.shape
    near = np.isnan(a) | (np.abs(a - target) <= tol)
    collar = np.zeros((h, w), bool)
    collar[0, :] = near[0, :]
    collar[-1, :] = near[-1, :]
    collar[:, 0] |= near[:, 0]
    collar[:, -1] |= near[:, -1]
    while True:
        grown = collar.copy()
        grown[1:, :] |= collar[:-1, :]
        grown[:-1, :] |= collar[1:, :]
        grown[:, 1:] |= collar[:, :-1]
        grown[:, :-1] |= collar[:, 1:]
        grown &= near
        if (grown == collar).all():
            break
        collar = grown
    out = np.where(collar, np.nan, a.astype(np.float64))
    return out, collar


def nearblack(
    images: DataFrame,
    target: float = 0.0,
    tol: float = 2.0,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`nearblack` parity over a raster table: one summary row per raster
    (image_id, n_collar, n_kept, q_sum, grid_md5) — the md5 covers the
    collar-stripped grid quantized to ``quant`` with collar/nodata cells
    as the GRID_SENT sentinel; q_sum over kept cells. Scale shape:
    per-raster independent Arrow pass; pixels never shuffle."""
    import hashlib

    from ..functions import tiffcodec

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("nearblack expects single-band rasters")
                out, collar = nearblack_np(a.astype(np.float64), target, tol)
                bad = np.isnan(out)
                q = np.where(
                    bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / quant)
                ).astype(np.int64)
                ok = q[~bad]
                rows.append(
                    (
                        iid,
                        int(collar.sum()),
                        int((~bad).sum()),
                        int(ok.sum()) if ok.size else 0,
                        hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_collar", "n_kept", "q_sum", "grid_md5"]
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, n_collar long, n_kept long, q_sum long, grid_md5 string",
    )
