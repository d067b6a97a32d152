"""Vector-tile pyramid operators — the tippecanoe/ogr2ogr-MVT role
(serving-side raster<->vector closure: the engine's raster pyramid gets
a polygon-layer twin; SURVEY.md training/serving op families).

``polygon_vector_tiles`` turns a small WKT polygon set (the engine's
broadcast-polygon contract, same shape as cutline/PIP) into a z-level
of Mapbox Vector Tiles: per covering tile, rings are clipped to the
buffered tile square (Sutherland-Hodgman against the axis-aligned
bbox), quantized to the integer extent grid (round-half-up, y top-down)
and encoded with functions/mvtcodec.py (spec-KAT-pinned wire format).

Scale shape: polygons are DRIVER-SIDE literals (broadcast contract —
the polygon set is small; the TILE side is what scales). The work list
(poly x covering tile) is one narrow DataFrame; encoding is a
per-(x, y) group ``applyInPandas`` — each output tile is built exactly
once, geometry never shuffles twice, and blobs are produced in their
final grouping. The quantization math itself is also exposed as pure
Column expressions (``polygon_tile_coords``) so the driver's DuckDB
gate can check it cross-engine (`mvt_quantize`).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import tilemath as tm


def _rings_merc(wkt: str) -> list[np.ndarray]:
    from ..functions.georef_parsers import parse_wkt_polygon

    out = []
    for ring in parse_wkt_polygon(wkt):
        lon = np.array([p[0] for p in ring])
        lat = np.array([p[1] for p in ring])
        mx, my = tm.merc_np(lon, lat)
        out.append(np.stack([mx, my], axis=1))
    return out


def _clip_ring(pts: list, x0: float, x1: float, y0: float, y1: float) -> list:
    """Sutherland-Hodgman clip of a ring against the axis-aligned box
    (clip polygon convex, subject may be non-convex). Returns [] when
    fully outside."""
    edges = (
        (lambda p: p[0] >= x0, lambda a, b: _isect_x(a, b, x0)),
        (lambda p: p[0] <= x1, lambda a, b: _isect_x(a, b, x1)),
        (lambda p: p[1] >= y0, lambda a, b: _isect_y(a, b, y0)),
        (lambda p: p[1] <= y1, lambda a, b: _isect_y(a, b, y1)),
    )
    cur = list(pts)
    for inside, isect in edges:
        if not cur:
            return []
        nxt = []
        n = len(cur)
        for i in range(n):
            a, b = cur[i], cur[(i + 1) % n]
            ia, ib = inside(a), inside(b)
            if ia:
                nxt.append(a)
                if not ib:
                    nxt.append(isect(a, b))
            elif ib:
                nxt.append(isect(a, b))
        cur = nxt
    return cur


def _isect_x(a, b, x):
    t = (x - a[0]) / (b[0] - a[0])
    return (x, a[1] + t * (b[1] - a[1]))


def _isect_y(a, b, y):
    t = (y - a[1]) / (b[1] - a[1])
    return (a[0] + t * (b[0] - a[0]), y)


def _cover_tiles(rings: list[np.ndarray], z: int) -> list[tuple[int, int]]:
    allpts = np.concatenate(rings, axis=0)
    txmin, txmax, tymin, tymax = (
        int(v[0])
        for v in tm.cover_range_np(
            np.array([allpts[:, 0].min()]),
            np.array([allpts[:, 1].min()]),
            np.array([allpts[:, 0].max()]),
            np.array([allpts[:, 1].max()]),
            np.array([z]),
        )
    )
    return [(x, y) for x in range(txmin, txmax + 1) for y in range(tymin, tymax + 1)]


def polygon_vector_tiles(
    spark: SparkSession,
    polys: list[tuple[str, str]],
    z: int,
    extent: int = 4096,
    buffer_px: int = 8,
    layer_name: str = "polys",
    max_tiles: int = 200_000,
    simplify_px: float = 0.0,
) -> DataFrame:
    """[(poly_id, wkt lon/lat)] -> (z, x TMS, y TMS, tile MVT bytes,
    n_features) at zoom z. Rings entirely clipped away contribute no
    feature; tiles with no surviving feature are not emitted. Feature id
    = index in the input list; props = {'poly_id': id}.

    `simplify_px` > 0 enables zoom-scaled Douglas-Peucker simplification
    (the tippecanoe role): tolerance = simplify_px tile pixels at this
    zoom, applied ONCE per ring driver-side before cover/clip (so coarse
    zooms also enumerate fewer covered tiles); rings degenerate at this
    tolerance are dropped entirely."""
    from ..functions import mvtcodec as mvt
    from ..functions import simplify as simp

    parsed = {pid: _rings_merc(wkt) for pid, wkt in polys}
    if simplify_px > 0.0:
        tol = simplify_px * (tm.RES0 / (2.0**z) * 256.0) / float(extent)
        parsed = {
            pid: [r for r in (simp.dp_simplify_ring(ring, tol) for ring in rings) if r is not None]
            for pid, rings in parsed.items()
        }
    fid = {pid: i for i, (pid, _w) in enumerate(polys)}
    work = []
    for pid, rings in parsed.items():
        tiles = _cover_tiles(rings, z)
        if len(work) + len(tiles) > max_tiles:
            raise ValueError(
                f"polygon_vector_tiles: cover exceeds max_tiles={max_tiles} at z={z}; "
                "lower z or raise the cap"
            )
        work += [(pid, x, y) for x, y in tiles]
    if not work:
        return spark.createDataFrame(
            [], "z int, x long, y long, tile binary, n_features int"
        )
    wdf = spark.createDataFrame(work, "poly_id string, x long, y long")
    span = tm.RES0 / (2.0**z) * 256.0
    buf_m = buffer_px / float(extent) * span

    def encode_tile(pdf):
        import pandas as pd

        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        mx0 = x * span - tm.ORIGIN
        my0 = y * span - tm.ORIGIN
        top = my0 + span
        feats = []
        for pid in sorted(set(pdf["poly_id"])):
            rings_q = []
            for ring in parsed[pid]:
                clipped = _clip_ring(
                    [tuple(p) for p in ring], mx0 - buf_m, mx0 + span + buf_m,
                    my0 - buf_m, top + buf_m,
                )
                if len(clipped) < 3:
                    continue
                q = []
                for mx, my in clipped:
                    qx = int(np.floor((mx - mx0) / span * extent + 0.5))
                    qy = int(np.floor((top - my) / span * extent + 0.5))
                    if not q or q[-1] != (qx, qy):
                        q.append((qx, qy))
                if len(q) > 1 and q[0] == q[-1]:
                    q.pop()
                if len(q) < 3 or mvt.signed_area2(q) == 0:
                    continue
                rings_q.append(q)
            if rings_q:
                feats.append(
                    {
                        "id": fid[pid],
                        "type": mvt.GEOM_POLYGON,
                        "geometry": mvt.polygon_geometry(rings_q),
                        "props": {"poly_id": pid},
                    }
                )
        if not feats:
            return pd.DataFrame(
                {"z": [], "x": [], "y": [], "tile": [], "n_features": []}
            ).astype({"z": "int32", "x": "int64", "y": "int64", "n_features": "int32"})
        blob = mvt.encode_mvt({layer_name: (feats, extent)})
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "tile": [blob], "n_features": [len(feats)]}
        )

    return wdf.groupBy("x", "y").applyInPandas(
        encode_tile, schema="z int, x long, y long, tile binary, n_features int"
    )


def polygon_tile_coords(
    spark: SparkSession, polys: list[tuple[str, str]], z: int, extent: int = 4096
) -> DataFrame:
    """The encoder's quantization math as PURE Column expressions over
    the (vertex x covering-tile) join — the cross-engine-checkable core
    (gate `mvt_quantize`): for every ring vertex and covering tile,
    the tile-local integer coords qx = floor((mx - tx0)/span*extent +
    0.5), qy top-down. No clipping here (the gate fixture keeps
    polygons off tile edges); mercator forward + quantize all happen
    JVM-side from literal lon/lat rows."""
    from ..functions.georef_parsers import parse_wkt_polygon

    verts = []
    tiles = []
    for pid, wkt in polys:
        for ri, ring in enumerate(parse_wkt_polygon(wkt)):
            for vi, (lon, lat) in enumerate(ring):
                verts.append((pid, ri, vi, float(lon), float(lat)))
        for x, y in _cover_tiles(_rings_merc(wkt), z):  # planner output rows
            tiles.append((pid, x, y))
    vdf = spark.createDataFrame(
        verts, "poly_id string, ring_i int, vtx_i int, lon double, lat double"
    )
    tdf = spark.createDataFrame(tiles, "poly_id string, x long, y long")
    span = tm.RES0 / (2.0**z) * 256.0
    mx = F.col("lon") * F.lit(tm.ORIGIN / 180.0)
    my = (
        F.log(F.tan((F.lit(90.0) + F.col("lat")) * F.lit(np.pi / 360.0)))
        * F.lit(6378137.0)
    )
    j = vdf.join(tdf, "poly_id")
    tx0 = F.col("x").cast("double") * F.lit(span) - F.lit(tm.ORIGIN)
    top = (F.col("y").cast("double") + F.lit(1.0)) * F.lit(span) - F.lit(tm.ORIGIN)
    return j.select(
        "poly_id",
        "ring_i",
        "vtx_i",
        "x",
        "y",
        F.floor((mx - tx0) / F.lit(span) * F.lit(float(extent)) + F.lit(0.5))
        .cast("long")
        .alias("qx"),
        F.floor((top - my) / F.lit(span) * F.lit(float(extent)) + F.lit(0.5))
        .cast("long")
        .alias("qy"),
    )


def point_tile_coords(
    points: DataFrame,
    z: int,
    extent: int = 4096,
    id_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """The DISTRIBUTED vector-tile core for point layers: tile assign +
    extent quantization as pure Column expressions (codegen, no UDF).
    Returns narrow rows (x, y TMS, id, qx, qy) — the only thing that
    ever shuffles when building point MVTs from billions of rows; gate
    `mvt_point_tiles` checks per-tile counts and coordinate sums
    cross-engine."""
    zz = F.lit(z)
    span = tm.RES0 / (2.0**z) * 256.0
    d = points.select(
        F.col(id_col).cast("long").alias("id"),
        tm.merc_x(F.col(lon_col)).alias("_mx"),
        tm.merc_y(F.col(lat_col)).alias("_my"),
    ).select(
        "id",
        tm.tile_x(F.col("_mx"), zz).alias("x"),
        tm.tile_y_tms(F.col("_my"), zz).alias("y"),
        "_mx",
        "_my",
    )
    tx0 = F.col("x").cast("double") * F.lit(span) - F.lit(tm.ORIGIN)
    top = (F.col("y").cast("double") + F.lit(1.0)) * F.lit(span) - F.lit(tm.ORIGIN)
    return d.select(
        "x",
        "y",
        "id",
        F.floor((F.col("_mx") - tx0) / F.lit(span) * F.lit(float(extent)) + F.lit(0.5))
        .cast("long")
        .alias("qx"),
        F.floor((top - F.col("_my")) / F.lit(span) * F.lit(float(extent)) + F.lit(0.5))
        .cast("long")
        .alias("qy"),
    )


def point_vector_tiles(
    points: DataFrame,
    z: int,
    extent: int = 4096,
    layer_name: str = "points",
    id_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Point-layer MVT pyramid level from an arbitrarily large point
    table -> (z, x TMS, y TMS, tile bytes, n_features). One feature per
    point (feature id = the point id, deterministic id-sorted member
    order). Scale shape: the Column stage above reduces every row to
    four longs; ONE shuffle on the (x, y) tile key feeds a per-tile
    applyInPandas encode — raw lon/lat and any payload columns are
    dropped before the exchange."""
    from ..functions import mvtcodec as mvt

    narrow = point_tile_coords(points, z, extent, id_col, lon_col, lat_col)

    def encode_tile(pdf):
        import pandas as pd

        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        pdf = pdf.sort_values("id")
        feats = [
            {
                "id": int(r.id),
                "type": mvt.GEOM_POINT,
                "geometry": mvt.point_geometry([(int(r.qx), int(r.qy))]),
                "props": None,
            }
            for r in pdf.itertuples()
        ]
        blob = mvt.encode_mvt({layer_name: (feats, extent)})
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "tile": [blob], "n_features": [len(feats)]}
        )

    return narrow.groupBy("x", "y").applyInPandas(
        encode_tile, schema="z int, x long, y long, tile binary, n_features int"
    )


def _parse_wkt_linestring(wkt: str) -> list[tuple[float, float]]:
    s = wkt.strip()
    up = s.upper()
    if not up.startswith("LINESTRING"):
        raise ValueError(f"not a LINESTRING: {wkt[:40]!r}")
    body = s[s.index("(") + 1 : s.rindex(")")]
    pts = []
    for tok in body.split(","):
        x, y = tok.split()
        pts.append((float(x), float(y)))
    if len(pts) < 2:
        raise ValueError("LINESTRING needs >= 2 points")
    return pts


def _clip_segment(a, b, x0, x1, y0, y1):
    """Liang-Barsky: segment a-b clipped to the box, or None."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, a[0] - x0),
        (dx, x1 - a[0]),
        (-dy, a[1] - y0),
        (dy, y1 - a[1]),
    ):
        if p == 0.0:
            if q < 0.0:
                return None
        else:
            t = q / p
            if p < 0.0:
                if t > t1:
                    return None
                if t > t0:
                    t0 = t
            else:
                if t < t0:
                    return None
                if t < t1:
                    t1 = t
    return (
        (a[0] + t0 * dx, a[1] + t0 * dy),
        (a[0] + t1 * dx, a[1] + t1 * dy),
    )


def _clip_polyline(pts, x0, x1, y0, y1):
    """Clip a polyline to the box -> list of connected sub-paths (a line
    that exits and re-enters the box splits)."""
    paths = []
    cur = []
    for i in range(len(pts) - 1):
        seg = _clip_segment(pts[i], pts[i + 1], x0, x1, y0, y1)
        if seg is None:
            if len(cur) >= 2:
                paths.append(cur)
            cur = []
            continue
        a, b = seg
        if cur and cur[-1] == a:
            cur.append(b)
        else:
            if len(cur) >= 2:
                paths.append(cur)
            cur = [a, b]
    if len(cur) >= 2:
        paths.append(cur)
    return paths


def line_vector_tiles(
    spark: SparkSession,
    lines: list[tuple[str, str]],
    z: int,
    extent: int = 4096,
    buffer_px: int = 8,
    layer_name: str = "lines",
    max_tiles: int = 200_000,
    simplify_px: float = 0.0,
) -> DataFrame:
    """[(line_id, LINESTRING wkt lon/lat)] -> (z, x, y, tile, n_features)
    — the line-geometry leg of the MVT family (contours, routes, coast
    lines). Same broadcast shape as polygon_vector_tiles; per tile the
    polyline is Liang-Barsky-clipped segment-wise to the buffered tile
    square (exiting/re-entering splits into multiple paths of ONE
    multi-linestring feature), quantized round-half-up, consecutive
    duplicate vertices collapsed. `simplify_px` > 0 applies zoom-scaled
    Douglas-Peucker (tolerance = that many tile pixels) once per line
    driver-side before cover/clip — see polygon_vector_tiles."""
    from ..functions import mvtcodec as mvt
    from ..functions import simplify as simp

    parsed = {}
    for lid, wkt in lines:
        lon = np.array([p[0] for p in _parse_wkt_linestring(wkt)])
        lat = np.array([p[1] for p in _parse_wkt_linestring(wkt)])
        mx, my = tm.merc_np(lon, lat)
        pts = np.stack([mx, my], axis=1)
        if simplify_px > 0.0:
            tol = simplify_px * (tm.RES0 / (2.0**z) * 256.0) / float(extent)
            pts = simp.dp_simplify(pts, tol)
        parsed[lid] = pts
    fid = {lid: i for i, (lid, _w) in enumerate(lines)}
    work = []
    for lid, pts in parsed.items():
        tiles = _cover_tiles([pts], z)
        if len(work) + len(tiles) > max_tiles:
            raise ValueError(
                f"line_vector_tiles: cover exceeds max_tiles={max_tiles} at z={z}"
            )
        work += [(lid, x, y) for x, y in tiles]
    if not work:
        return spark.createDataFrame(
            [], "z int, x long, y long, tile binary, n_features int"
        )
    wdf = spark.createDataFrame(work, "line_id string, x long, y long")
    span = tm.RES0 / (2.0**z) * 256.0
    buf_m = buffer_px / float(extent) * span

    def encode_tile(pdf):
        import pandas as pd

        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        mx0 = x * span - tm.ORIGIN
        my0 = y * span - tm.ORIGIN
        top = my0 + span
        feats = []
        for lid in sorted(set(pdf["line_id"])):
            paths_q = []
            for path in _clip_polyline(
                [tuple(p) for p in parsed[lid]],
                mx0 - buf_m, mx0 + span + buf_m, my0 - buf_m, top + buf_m,
            ):
                q = []
                for mx, my in path:
                    qx = int(np.floor((mx - mx0) / span * extent + 0.5))
                    qy = int(np.floor((top - my) / span * extent + 0.5))
                    if not q or q[-1] != (qx, qy):
                        q.append((qx, qy))
                if len(q) >= 2:
                    paths_q.append(q)
            if paths_q:
                feats.append(
                    {
                        "id": fid[lid],
                        "type": mvt.GEOM_LINE,
                        "geometry": mvt.line_geometry(paths_q),
                        "props": {"line_id": lid},
                    }
                )
        if not feats:
            return pd.DataFrame(
                {"z": [], "x": [], "y": [], "tile": [], "n_features": []}
            ).astype({"z": "int32", "x": "int64", "y": "int64", "n_features": "int32"})
        blob = mvt.encode_mvt({layer_name: (feats, extent)})
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "tile": [blob], "n_features": [len(feats)]}
        )

    return wdf.groupBy("x", "y").applyInPandas(
        encode_tile, schema="z int, x long, y long, tile binary, n_features int"
    )


def merge_vector_tiles(base: DataFrame, overlay: DataFrame) -> DataFrame:
    """Merge two vector tile sets on (z, x, y) — the tiles_merge role
    for MVT. Protobuf semantics make this a pure byte concatenation:
    a Tile message is `repeated Layer layers = 3`, so concatenating two
    valid Tile blobs yields one valid Tile carrying both layer sets
    (layer names should be distinct; later layers win in renderers).
    One full-outer join on the key, blobs coalesce — geometry is never
    decoded."""
    b = base.select("z", "x", "y", F.col("tile").alias("_tb"))
    o = overlay.select("z", "x", "y", F.col("tile").alias("_to"))
    return (
        b.join(o, ["z", "x", "y"], "full_outer")
        .select(
            "z",
            "x",
            "y",
            F.concat(
                F.coalesce(F.col("_tb"), F.lit(b"")),
                F.coalesce(F.col("_to"), F.lit(b"")),
            ).alias("tile"),
        )
    )


def simplify_polylines(df: DataFrame, tol: float, x_col: str = "xs", y_col: str = "ys") -> DataFrame:
    """Distributed Douglas-Peucker over per-row polyline array columns
    (`xs`/`ys` array<double>): the big-geometry path — a 100 TB contour /
    route / trajectory table simplifies as one narrow Arrow ``mapInPandas``
    pass, embarrassingly parallel, ZERO shuffle (each row's geometry is
    self-contained). Contract = functions/simplify.py (infinite-line
    distance, strict >, first-max split). Schema is preserved."""
    from ..functions import simplify as simp

    schema = df.schema

    def run(it):
        for pdf in it:
            out_x, out_y = [], []
            for xs, ys in zip(pdf[x_col], pdf[y_col]):
                pts = np.stack(
                    [np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)],
                    axis=1,
                )
                kept = pts[simp.dp_mask(pts, tol)]
                out_x.append(kept[:, 0].tolist())
                out_y.append(kept[:, 1].tolist())
            pdf = pdf.copy()
            pdf[x_col] = out_x
            pdf[y_col] = out_y
            yield pdf

    return df.mapInPandas(run, schema)


def cluster_points(
    points: DataFrame,
    z: int,
    radius_px: float = 40.0,
    id_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Supercluster-role point clustering for a zoom level — the
    deterministic GRID variant (documented deviation: supercluster's
    greedy kd-tree radius merge is insertion-order-dependent, which a
    distributed engine must not be; snapping to a grid of cell size =
    `radius_px` web-mercator pixels at zoom `z` is the
    partitioning-independent server-side equivalent). Each point lands
    in cell (floor(mx/cell), floor(my/cell)); a cell aggregates to
    point_count `n`, representative `min_id` (smallest member id —
    stable under re-runs) and the member centroid (cx, cy in meters).

    Scale shape: rows reduce to (id, mx, my) before ONE narrow shuffle
    on the cell key with map-side partial aggregation — billions of
    points cluster in a single pass; no UDF anywhere."""
    cell = radius_px * (tm.RES0 / (2.0**z))
    d = points.select(
        F.col(id_col).cast("long").alias("id"),
        tm.merc_x(F.col(lon_col)).alias("mx"),
        tm.merc_y(F.col(lat_col)).alias("my"),
    ).select(
        "id",
        "mx",
        "my",
        F.floor(F.col("mx") / F.lit(cell)).cast("long").alias("cell_x"),
        F.floor(F.col("my") / F.lit(cell)).cast("long").alias("cell_y"),
    )
    return d.groupBy("cell_x", "cell_y").agg(
        F.count("*").alias("n"),
        F.min("id").alias("min_id"),
        F.avg("mx").alias("cx"),
        F.avg("my").alias("cy"),
    )


def clustered_point_vector_tiles(
    points: DataFrame,
    z: int,
    cluster_radius_px: float = 40.0,
    extent: int = 4096,
    layer_name: str = "points",
    id_col: str = "event_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """point_vector_tiles with the supercluster serving convention:
    pre-cluster (grid variant above), then one feature per cluster at
    the member centroid — props {"cluster": true, "point_count": n} for
    n > 1 (the keys mapbox-gl styling expects), plain unclustered point
    features for singletons; feature id = min member id. Same scale
    shape: clusters reduce to five longs before the single tile-key
    exchange."""
    from ..functions import mvtcodec as mvt

    zz = F.lit(z)
    span = tm.RES0 / (2.0**z) * 256.0
    cl = cluster_points(points, z, cluster_radius_px, id_col, lon_col, lat_col)
    d = cl.select(
        F.col("min_id").alias("id"),
        F.col("n"),
        tm.tile_x(F.col("cx"), zz).alias("x"),
        tm.tile_y_tms(F.col("cy"), zz).alias("y"),
        "cx",
        "cy",
    )
    tx0 = F.col("x").cast("double") * F.lit(span) - F.lit(tm.ORIGIN)
    top = (F.col("y").cast("double") + F.lit(1.0)) * F.lit(span) - F.lit(tm.ORIGIN)
    narrow = d.select(
        "x",
        "y",
        "id",
        "n",
        F.floor((F.col("cx") - tx0) / F.lit(span) * F.lit(float(extent)) + F.lit(0.5))
        .cast("long")
        .alias("qx"),
        F.floor((top - F.col("cy")) / F.lit(span) * F.lit(float(extent)) + F.lit(0.5))
        .cast("long")
        .alias("qy"),
    )

    def encode_tile(pdf):
        import pandas as pd

        x = int(pdf["x"].iloc[0])
        y = int(pdf["y"].iloc[0])
        pdf = pdf.sort_values("id")
        feats = []
        for r in pdf.itertuples():
            props = (
                {"cluster": True, "point_count": int(r.n)} if int(r.n) > 1 else None
            )
            feats.append(
                {
                    "id": int(r.id),
                    "type": mvt.GEOM_POINT,
                    "geometry": mvt.point_geometry([(int(r.qx), int(r.qy))]),
                    "props": props,
                }
            )
        blob = mvt.encode_mvt({layer_name: (feats, extent)})
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "tile": [blob], "n_features": [len(feats)]}
        )

    return narrow.groupBy("x", "y").applyInPandas(
        encode_tile, schema="z int, x long, y long, tile binary, n_features int"
    )
