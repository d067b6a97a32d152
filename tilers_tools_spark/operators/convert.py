"""Tile-set transforms — the tiles_convert / tiles_merge roles
(SURVEY.md §2.4 rows 21-24, §2.1 rows 5-6).

The tiles DataFrame is the hub; every container format is a pure column
projection over it (scheme y-flips, path layouts, MBTiles key triples) —
conversion never touches pixel bytes, so Catalyst collapses a whole
convert into one narrow projection stage (SURVEY.md §3.2 E2').

Reference parity [R] (checkout absent, SURVEY.md §0.1): tiles_convert.py
format registry classes; layouts below follow the public conventions —
XYZ/slippy `z/x/y.png`, TMS `z/x/y.png` with TMS y, ZYX `z/y/x.png`,
MBTiles 1.x spec (tiles(zoom_level, tile_column, tile_row TMS-flipped),
metadata k/v, unique index), SASPlanet `z{z+1}/x/y`-style nesting, Maemo
mapper `zoom/x/y`. Per SURVEY §2.1 row 6 these are flagged low-confidence
vs the reference's exact variants and isolated here for easy re-pinning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tilemath as tm

# ---------------------------------------------------------------------------
# scheme conversion (row 21): canonical storage is TMS y; xyz <-> tms flip
# ---------------------------------------------------------------------------


def flip_y(df: DataFrame, z: str = "z", y: str = "y") -> DataFrame:
    """XYZ <-> TMS y-flip: y' = 2^z - 1 - y. Involution (tested)."""
    return df.withColumn(y, tm.tms_to_xyz(F.col(y), F.col(z)))


def with_scheme(tiles: DataFrame, scheme: str) -> DataFrame:
    """Add scheme-resolved (sx, sy) columns. scheme in {xyz, tms, zyx}."""
    if scheme == "tms":
        return tiles.withColumn("sx", F.col("x")).withColumn("sy", F.col("y"))
    if scheme in ("xyz", "zyx"):
        return tiles.withColumn("sx", F.col("x")).withColumn("sy", tm.tms_to_xyz(F.col("y"), F.col("z")))
    raise ValueError(scheme)


def quadkey(tiles: DataFrame, out_col: str = "quadkey") -> DataFrame:
    """Add the Bing-maps quadkey string (published scheme: one base-4
    digit per zoom level, MSB-first, digit = x-bit + 2*y-bit with XYZ
    top-down y). Variable zoom per row — built as a pure Column expression
    (sequence + transform + concat_ws, zero Python), so at 100 TB it's one
    narrow projection. z=0 yields the empty string (the scheme's root).

    Bit extraction uses exact power-of-two double division
    (floor(v / 2^k) % 2): x,y < 2^30 and 2^k are both exact doubles, so
    the truncating cast is bit-exact — avoids shiftright(), whose PySpark
    wrapper only takes a literal shift count.
    """
    zc, xc = F.col("z"), F.col("x")
    y_xyz = tm.tms_to_xyz(F.col("y"), zc)

    def bit(v, k):
        return (v / F.pow(F.lit(2.0), k.cast("double"))).cast("bigint") % 2

    def digit(i):
        k = zc - i
        return (bit(xc, k) + 2 * bit(y_xyz, k) + 1).cast("int")

    chars = F.array(*[F.lit(c) for c in "0123"])
    qk = F.when(zc == 0, F.lit("")).otherwise(
        F.concat_ws(
            "",
            F.transform(F.sequence(F.lit(1), zc.cast("int")), lambda i: F.element_at(chars, digit(i))),
        )
    )
    return tiles.withColumn(out_col, qk)


def tiles_in_bbox(
    tiles: DataFrame, z: int, lon0: float, lat0: float, lon1: float, lat1: float
) -> DataFrame:
    """Serving-path tile lookup: all tiles of `tiles` at zoom `z` inside
    the lon/lat bbox. The covering (x, y_tms) ranges are computed
    DRIVER-SIDE with the NumPy tile-math twins and applied as literal
    range predicates — so against a z-partitioned tile table the z filter
    prunes partitions and the x/y range pushes into parquet row-group
    stats (min/max), reading only the touched stripe. This is the query a
    tile server issues per viewport; no shuffle, no UDF."""
    import numpy as np

    from ..functions import tilemath as tmn

    mx0, my0 = tmn.merc_np(np.array([min(lon0, lon1)]), np.array([min(lat0, lat1)]))
    mx1, my1 = tmn.merc_np(np.array([max(lon0, lon1)]), np.array([max(lat0, lat1)]))
    txmin, txmax, tymin, tymax = (
        int(v[0]) for v in tmn.cover_range_np(mx0, my0, mx1, my1, np.array([z]))
    )
    return tiles.filter(
        (F.col("z") == z)
        & F.col("x").between(txmin, txmax)
        & F.col("y").between(tymin, tymax)
    )


def _ring_pip_center_col(ring, z: int):
    """Column: true iff the zoom-`z` tile center of (x, y TMS) lies inside
    the lon/lat `ring` (list of (lon, lat) driver-side vertices).

    Crossing-number test UNROLLED over the vertices into a pure Catalyst
    expression — edge deltas are computed once on the driver and inlined
    as literals, so the whole predicate stays in whole-stage codegen and a
    DuckDB oracle can mirror it term-for-term (identical IEEE op order).
    Choose vertices off the tile-center lattice (e.g. *.0005 offsets) so
    no edge tie is ULP-sensitive."""
    import math

    span = tm.RES0 / (2.0**z) * 256.0
    cx = (F.col("x").cast("double") + F.lit(0.5)) * F.lit(span) - F.lit(tm.ORIGIN)
    cy = (F.col("y").cast("double") + F.lit(0.5)) * F.lit(span) - F.lit(tm.ORIGIN)
    lon = cx * F.lit(180.0 / tm.ORIGIN)
    lat = F.degrees(F.lit(2.0) * F.atan(F.exp(cy / F.lit(6378137.0))) - F.lit(math.pi / 2.0))
    total = F.lit(0)
    n = len(ring)
    for i in range(n):
        x1, y1 = float(ring[i][0]), float(ring[i][1])
        x2, y2 = float(ring[(i + 1) % n][0]), float(ring[(i + 1) % n][1])
        if y1 == y2:
            continue  # horizontal edge never crosses a non-tie latitude
        crosses = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        xint = F.lit(x2 - x1) * (lat - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
        total = total + F.when(crosses & (lon < xint), F.lit(1)).otherwise(F.lit(0))
    return total % 2 == 1


def tiles_covering_polygon(spark, ring, z: int) -> DataFrame:
    """Seeding planner: enumerate every (z, x, y TMS) tile whose center
    falls inside the lon/lat ring — the work list for a targeted region
    re-render (feed it to the pyramid renderer or ``tiles_update``).

    The covering bbox ranges are driver-side literals (same as
    ``tiles_in_bbox``); the grid is one ``spark.range`` projection (no
    join, no shuffle) filtered by the unrolled crossing-number predicate."""
    import numpy as np

    from ..functions import tilemath as tmn

    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    mx0, my0 = tmn.merc_np(np.array([min(lons)]), np.array([min(lats)]))
    mx1, my1 = tmn.merc_np(np.array([max(lons)]), np.array([max(lats)]))
    txmin, txmax, tymin, tymax = (
        int(v[0]) for v in tmn.cover_range_np(mx0, my0, mx1, my1, np.array([z]))
    )
    nx = txmax - txmin + 1
    ny = tymax - tymin + 1
    grid = spark.range(nx * ny).select(
        F.lit(z).cast("long").alias("z"),
        (F.lit(txmin) + F.col("id") % nx).alias("x"),
        (F.lit(tymin) + (F.col("id") / nx).cast("long")).alias("y"),
    )
    return grid.where(_ring_pip_center_col(ring, z))


def tiles_in_polygon(tiles: DataFrame, z: int, ring) -> DataFrame:
    """Filter an existing tile table to zoom `z` tiles whose centers lie
    inside the lon/lat ring: bbox literal ranges first (partition pruning
    + row-group pushdown, exactly as ``tiles_in_bbox``), then the exact
    crossing-number refine as a codegen'd Column — no UDF, no shuffle."""
    lons = [p[0] for p in ring]
    lats = [p[1] for p in ring]
    pre = tiles_in_bbox(tiles, z, min(lons), min(lats), max(lons), max(lats))
    return pre.where(_ring_pip_center_col(ring, z))


def from_quadkey(df: DataFrame, qk_col: str = "quadkey") -> DataFrame:
    """Inverse: quadkey string -> (z, x, y TMS). Pure column expressions
    (aggregate over the digit positions)."""
    q = F.col(qk_col)
    z = F.length(q).cast("bigint")
    digits = F.transform(
        F.split(q, ""), lambda c: F.when(c == "", F.lit(0)).otherwise(c.cast("int"))
    )
    # split('') yields a trailing empty token; positions 1..z carry digits.
    # x = sum over i of x-bit(i) << (z-i); same for y, then flip to TMS.
    def acc(sel):
        # z=0 (root tile, empty quadkey): sequence(1, 0) would count DOWN
        # ([1, 0] — Spark infers step -1) and index element_at(digits, 0),
        # which throws; the root decodes to (0, 0) directly
        return F.when(z == 0, F.lit(0).cast("bigint")).otherwise(
            F.aggregate(
                F.sequence(F.lit(1), z.cast("int")),
                F.lit(0).cast("bigint"),
                lambda a, i: a
                + sel(F.element_at(digits, i)).cast("bigint")
                * F.pow(F.lit(2.0), (z - i).cast("double")).cast("bigint"),
            )
        )
    x = acc(lambda d: d % 2)
    y_xyz = acc(lambda d: (d / 2).cast("int"))
    return df.withColumn("z", z).withColumn("x", x).withColumn(
        "y", tm.tms_to_xyz(y_xyz, z)  # involution: XYZ -> TMS
    )


def tile_path(tiles: DataFrame, scheme: str = "xyz", ext: str = "png") -> DataFrame:
    """Add the container-relative `path` column for directory layouts."""
    t = with_scheme(tiles, scheme)
    if scheme in ("xyz", "tms"):
        p = F.format_string(f"%d/%d/%d.{ext}", F.col("z"), F.col("sx"), F.col("sy"))
    elif scheme == "zyx":
        p = F.format_string(f"%d/%d/%d.{ext}", F.col("z"), F.col("sy"), F.col("sx"))
    else:
        raise ValueError(scheme)
    return t.withColumn("path", p).drop("sx", "sy")


def sasplanet_path(tiles: DataFrame, ext: str = "png") -> DataFrame:
    """SASPlanet cache layout: z{z+1}/{x//1024}/x{x}/{y//1024}/y{y}.{ext}
    (XYZ y convention) — SURVEY.md §2.1 row 6 [R], re-verify when online."""
    t = with_scheme(tiles, "xyz")
    p = F.format_string(
        f"z%d/%d/x%d/%d/y%d.{ext}",
        F.col("z") + 1,
        (F.col("sx") / 1024).cast("long"),
        F.col("sx"),
        (F.col("sy") / 1024).cast("long"),
        F.col("sy"),
    )
    return t.withColumn("path", p).drop("sx", "sy")


def maemo_mapper_path(tiles: DataFrame, ext: str = "png") -> DataFrame:
    """Maemo mapper layout: zoom+1/x/y with XYZ y [R]."""
    t = with_scheme(tiles, "xyz")
    return t.withColumn(
        "path", F.format_string(f"%d/%d/%d.{ext}", F.col("z") + 1, F.col("sx"), F.col("sy"))
    ).drop("sx", "sy")


def ozi_path(tiles: DataFrame, ext: str = "png") -> DataFrame:
    """Ozi tile-cache layout (named by BASELINE.json:6 'MBTiles/Ozi/MapNav
    tile-set transforms'): flat one-directory naming `{z}-{x}-{y}.{ext}`
    with XYZ y — OziExplorer keeps map files flat in a single folder, so
    the key triple is encoded in the file name. Engine convention flagged
    [R]-low-confidence (reference checkout absent, SURVEY.md §0.1);
    isolated here for one-line re-pinning when the exact reference layout
    can be verified."""
    t = with_scheme(tiles, "xyz")
    return t.withColumn(
        "path", F.format_string(f"%d-%d-%d.{ext}", F.col("z"), F.col("sx"), F.col("sy"))
    ).drop("sx", "sy")


def zoomify_path(tiles: DataFrame, ext: str = "jpg") -> DataFrame:
    """Zoomify tile-group layout (the PUBLISHED Zoomify/OpenLayers-Zoomify
    convention): tiles number row-major across all zoom levels from z=0,
    grouped 256 per folder —

        TileGroup{tileIndex // 256}/{z}-{x}-{y}.{ext}

    with XYZ y (row 0 = top). For a full power-of-two pyramid the level
    offset has the closed form sum_{z'<z} 4^z' = (4^z - 1)/3, so
    tileIndex = (4^z - 1)/3 + y*2^z + x — pure LongType bit math
    (shiftleft + integral `div`, exact through z=30), no UDF and no
    double-precision rounding."""
    t = with_scheme(tiles, "xyz")
    idx = F.expr(
        "(shiftleft(CAST(1 AS BIGINT), 2*z) - 1) div 3"
        " + sy * shiftleft(CAST(1 AS BIGINT), z) + sx"
    )
    return (
        t.withColumn("tile_index", idx)
        .withColumn(
            "path",
            F.format_string(
                f"TileGroup%d/%d-%d-%d.{ext}",
                F.expr("tile_index div 256"),
                F.col("z"), F.col("sx"), F.col("sy"),
            ),
        )
        .drop("sx", "sy")
    )


def mapnav_path(tiles: DataFrame, ext: str = "png") -> DataFrame:
    """MapNav tile-cache layout (BASELINE.json:6): row-major tree
    `{z}/{y}/{x}.{ext}` with TMS y (distinct from zyx, which uses XYZ y).
    Engine convention flagged [R]-low-confidence like ozi_path."""
    t = with_scheme(tiles, "tms")
    return t.withColumn(
        "path", F.format_string(f"%d/%d/%d.{ext}", F.col("z"), F.col("sy"), F.col("sx"))
    ).drop("sx", "sy")


# ---------------------------------------------------------------------------
# MBTiles (row 5): pure projection to the MBTiles 1.x key scheme [SPEC]
# ---------------------------------------------------------------------------


def to_mbtiles_keys(tiles: DataFrame) -> DataFrame:
    """tiles -> (zoom_level, tile_column, tile_row, tile_data); tile_row is
    TMS y per the MBTiles spec (our canonical y already is TMS)."""
    return tiles.select(
        F.col("z").cast("int").alias("zoom_level"),
        F.col("x").cast("long").alias("tile_column"),
        F.col("y").cast("long").alias("tile_row"),
        F.col("tile").alias("tile_data"),
    )


def to_mbtiles_dedup_map(tiles: DataFrame) -> DataFrame:
    """`map`-table projection of the deduplicated MBTiles layout (the
    TileMill/mbutil two-table variant written by sources/mbtiles.py with
    dedup=True): key triple + tile_id = md5 hex of the blob. Pure column
    exprs — the digest is computed map-side, so planning a dedup export
    (or auditing its dedup ratio via count distinct tile_id) never
    shuffles blobs."""
    return tiles.select(
        F.col("z").cast("int").alias("zoom_level"),
        F.col("x").cast("long").alias("tile_column"),
        F.col("y").cast("long").alias("tile_row"),
        F.md5(F.col("tile")).alias("tile_id"),
    )


def from_mbtiles_keys(df: DataFrame) -> DataFrame:
    """Inverse projection back to canonical tile keys."""
    return df.select(
        F.col("zoom_level").cast("int").alias("z"),
        F.col("tile_column").cast("long").alias("x"),
        F.col("tile_row").cast("long").alias("y"),
        F.col("tile_data").alias("tile"),
    )


def to_rmaps_keys(tiles: DataFrame) -> DataFrame:
    """tiles -> RMaps/BigPlanet sqlitedb rows (x, y, z, s, image) — the
    published MOBAC "RMaps SQLite" atlas schema, read by RMaps / OsmAnd
    (.sqlitedb) / Locus: tiles(x int, y int, z int, s int, image blob,
    PRIMARY KEY (x,y,z,s)) + info(minzoom, maxzoom). Conventions [SPEC]:
    y is OSM/Google top-down (flipped from the canonical TMS y), z is
    STORED as 17 - zoom (the BigPlanet legacy rule — zoom 10 is stored
    as z=7), s = 0. Pure column projection like the MBTiles twin."""
    return tiles.select(
        F.col("x").cast("long").alias("x"),
        tm.tms_to_xyz(F.col("y"), F.col("z")).cast("long").alias("y"),
        (F.lit(17) - F.col("z")).cast("int").alias("z"),
        F.lit(0).cast("int").alias("s"),
        F.col("tile").alias("image"),
    )


def from_rmaps_keys(df: DataFrame) -> DataFrame:
    """Inverse: stored z -> zoom = 17 - z, OSM y -> canonical TMS y."""
    zoom = (F.lit(17) - F.col("z")).cast("int")
    return df.select(
        zoom.alias("z"),
        F.col("x").cast("long").alias("x"),
        tm.tms_to_xyz(F.col("y"), zoom).cast("long").alias("y"),
        F.col("image").alias("tile"),
    )


def to_gpkg_keys(tiles: DataFrame) -> DataFrame:
    """tiles -> OGC GeoPackage tile-pyramid rows (zoom_level, tile_column,
    tile_row, tile_data) per OGC 12-128r18 §2.2.8 [SPEC]: tile_row 0 is
    the TOP row (XYZ/slippy convention — flipped from the canonical TMS
    y), zoom_level stored as-is. Pure column projection like the MBTiles
    and RMaps twins — a whole container conversion stays one narrow
    Exchange-free stage."""
    return tiles.select(
        F.col("z").cast("int").alias("zoom_level"),
        F.col("x").cast("long").alias("tile_column"),
        tm.tms_to_xyz(F.col("y"), F.col("z")).cast("long").alias("tile_row"),
        F.col("tile").alias("tile_data"),
    )


def from_gpkg_keys(df: DataFrame) -> DataFrame:
    """Inverse: top-down tile_row -> canonical TMS y."""
    return df.select(
        F.col("zoom_level").cast("int").alias("z"),
        F.col("tile_column").cast("long").alias("x"),
        tm.tms_to_xyz(F.col("tile_row"), F.col("zoom_level")).cast("long").alias("y"),
        F.col("tile_data").alias("tile"),
    )


# ---------------------------------------------------------------------------
# tilemap metadata aggregate (row 4)
# ---------------------------------------------------------------------------


def tilemap_metadata(tiles: DataFrame) -> DataFrame:
    """Per-zoom tile ranges + counts -> the tilemap/metadata summary."""
    return (
        tiles.groupBy("z")
        .agg(
            F.min("x").alias("xmin"),
            F.max("x").alias("xmax"),
            F.min("y").alias("ymin"),
            F.max("y").alias("ymax"),
            F.count("*").alias("n_tiles"),
        )
        .orderBy("z")
    )


def mbtiles_metadata_kv(tiles: DataFrame, name: str = "tiles", fmt: str = "png") -> dict:
    """MBTiles `metadata` table content (driver-side tiny dict) [SPEC]."""
    agg = tiles.agg(
        F.min("z").alias("minzoom"),
        F.max("z").alias("maxzoom"),
        F.min("lon").alias("w"),
        F.min("lat").alias("s"),
        F.max("lon").alias("e"),
        F.max("lat").alias("n"),
    ).collect()[0]
    return {
        "name": name,
        "type": "overlay",
        "version": "1.1",
        "description": "tilers-tools-spark pyramid",
        "format": fmt,
        "minzoom": str(agg["minzoom"]),
        "maxzoom": str(agg["maxzoom"]),
        "bounds": f"{agg['w']},{agg['s']},{agg['e']},{agg['n']}",
    }


# ---------------------------------------------------------------------------
# re-encode on convert (row 23): png <-> jpeg <-> raw transcoding
# ---------------------------------------------------------------------------


def transcode(
    tiles: DataFrame,
    src_fmt: str = "png",
    dst_fmt: str = "jpeg",
    quality: int = 90,
    subsampling: str = "444",
) -> DataFrame:
    """Decode + re-encode every tile blob (Arrow batches, pure NumPy codecs).
    jpeg drops alpha (opaque tile sets, as the reference does for jpeg
    output); raw keeps RGBA; tiff writes deflate-compressed RGBA (full
    container symmetry with the sniffing reader). subsampling ("444" or
    "420") is jpeg-only: 4:2:0 writes ~25-40% smaller photographic tiles.
    """
    from ..functions import codecs

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import jpegcodec

        for pdf in batches:
            out = []
            for blob in pdf["tile"]:
                arr = codecs.to_rgba(codecs.decode_image(bytes(blob), src_fmt))
                if dst_fmt == "png":
                    out.append(codecs.encode_tile_png(arr))
                elif dst_fmt == "raw":
                    out.append(codecs.encode_raw(arr))
                elif dst_fmt == "jpeg":
                    out.append(
                        jpegcodec.encode_jpeg(arr[:, :, :3], quality=quality, subsampling=subsampling)
                    )
                elif dst_fmt == "tiff":
                    from ..functions import tiffcodec

                    out.append(tiffcodec.encode_tiff(arr, compression="deflate"))
                elif dst_fmt == "webp":
                    from ..functions import webpcodec

                    out.append(webpcodec.encode_webp(arr))
                elif dst_fmt == "bmp":
                    out.append(codecs.encode_bmp(arr))
                elif dst_fmt == "gif":
                    # GIF is paletted: opaque tiles with <= 256 distinct
                    # colors only — quantize upstream (rgb2pct) otherwise;
                    # both violations fail loudly, never silently degrade
                    from ..functions import gifcodec

                    if not (arr[:, :, 3] == 255).all():
                        raise ValueError(
                            "gif transcode needs fully opaque tiles "
                            "(binary transparency only via indexed input)"
                        )
                    out.append(gifcodec.encode_gif(arr[:, :, :3]))
                else:
                    raise ValueError(dst_fmt)
            res = pdf.copy()
            res["tile"] = out
            yield res

    return tiles.mapInPandas(fn, schema=tiles.schema)


# ---------------------------------------------------------------------------
# merge/overlay (row 24): alpha-composite overlay onto base per tile key
# ---------------------------------------------------------------------------


def composite_over(base_rgba, over_rgba):
    """src-over alpha composite (over on top of base), float64, round half
    up — the single composite contract shared by merge_tilesets and the
    merged-pyramid plan."""
    import numpy as np

    a = base_rgba.astype(np.float64)
    o = over_rgba.astype(np.float64)
    alpha_o = o[:, :, 3:4] / 255.0
    alpha_b = a[:, :, 3:4] / 255.0
    out_a = alpha_o + alpha_b * (1.0 - alpha_o)
    with np.errstate(divide="ignore", invalid="ignore"):
        rgb = (o[:, :, :3] * alpha_o + a[:, :, :3] * alpha_b * (1.0 - alpha_o)) / np.where(
            out_a > 0, out_a, 1.0
        )
    comp = np.dstack([rgb, out_a * 255.0])
    return np.clip(comp + 0.5, 0, 255).astype(np.uint8)


def merge_tilesets(base: DataFrame, overlay: DataFrame, keys=("z", "x", "y")) -> DataFrame:
    """Union of two tile sets; colliding keys -> src-over alpha composite
    (overlay over base), in a pandas UDF over the full-outer join."""
    from ..functions import codecs

    b = base.select(*keys, F.col("tile").alias("_tile_base"))
    o = overlay.select(*keys, F.col("tile").alias("_tile_over"))
    j = b.join(o, list(keys), "full_outer")

    def composite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_tiles = []
            for tb, to in zip(pdf["_tile_base"], pdf["_tile_over"]):
                if to is None:
                    out_tiles.append(tb)
                elif tb is None:
                    out_tiles.append(to)
                else:
                    comp = composite_over(
                        codecs.to_rgba(codecs.decode_png(bytes(tb))),
                        codecs.to_rgba(codecs.decode_png(bytes(to))),
                    )
                    out_tiles.append(codecs.encode_png(comp))
            res = pdf[list(keys)].copy()
            res["tile"] = out_tiles
            yield res

    schema = "z int, x long, y long, tile binary"
    return j.mapInPandas(composite, schema=schema)


# ---------------------------------------------------------------------------
# KML SuperOverlay (the reference toolchain's Google-Earth output mode)
# ---------------------------------------------------------------------------

_KML_REGION = (
    "<Region><LatLonAltBox>"
    "<north>%.9f</north><south>%.9f</south>"
    "<east>%.9f</east><west>%.9f</west>"
    "</LatLonAltBox><Lod><minLodPixels>%d</minLodPixels>"
    "<maxLodPixels>-1</maxLodPixels></Lod></Region>"
)


def _tile_deg_bounds(z, x, y):
    """(north, south, east, west) degree Columns of TMS tile (z, x, y)."""
    span = tm.resolution(z) * F.lit(float(tm.TILE))
    mx0 = x.cast("double") * span - F.lit(tm.ORIGIN)
    my0 = y.cast("double") * span - F.lit(tm.ORIGIN)
    return (
        tm.inv_merc_lat(my0 + span),
        tm.inv_merc_lat(my0),
        tm.inv_merc_lon(mx0 + span),
        tm.inv_merc_lon(mx0),
    )


def kml_superoverlay(tiles: DataFrame, ext: str = "png", min_lod: int = 128) -> DataFrame:
    """Region-based KML SuperOverlay over a tiles table — per tile one
    KML document: a Region+Lod gate, a GroundOverlay referencing the
    sibling tile image, and one NetworkLink (onRegion) per EXISTING
    child at z+1. Documents live next to the images in the xyz layout
    (`z/x/y.kml`), so `doc_path`/`img_href` are relative.

    Spark-first shape: bounds, paths and the XML itself are pure Column
    exprs (format_string/transform/array_join — whole-stage codegen, no
    UDF); which children exist comes from ONE key-only aggregate+join
    over (z, x, y) planning metadata — tile bytes are never read, so at
    100 TB this shuffles a few dozen bytes per tile, and AQE is free to
    pick a broadcast for the child map's upper zooms.

    Returns the input keys + (n_children, children_csv, doc_path,
    img_href, kml)."""
    t = tiles.select("z", "x", "y")
    kids = t.select(
        (F.col("z") - 1).alias("z"),
        F.shiftright(F.col("x"), 1).alias("x"),
        F.shiftright(F.col("y"), 1).alias("y"),
        F.struct(
            F.col("x").cast("long").alias("cx"), F.col("y").cast("long").alias("cy")
        ).alias("c"),
    )
    kidagg = kids.groupBy("z", "x", "y").agg(
        F.sort_array(F.collect_list("c")).alias("children")
    )
    out = t.join(kidagg, ["z", "x", "y"], "left").withColumn(
        "children",
        F.coalesce(
            F.col("children"),
            F.array().cast("array<struct<cx:bigint,cy:bigint>>"),
        ),
    )

    z, x, y = F.col("z"), F.col("x"), F.col("y")
    north, south, east, west = _tile_deg_bounds(z, x, y)
    y_xyz = tm.tms_to_xyz(y, z)
    doc_path = F.format_string("%d/%d/%d.kml", z, x, y_xyz)
    img_href = F.format_string(f"%d.{ext}", y_xyz)
    region = F.format_string(_KML_REGION, north, south, east, west, F.lit(min_lod))

    def link(c):
        cz = z + F.lit(1)
        cn, cs, ce, cw = _tile_deg_bounds(cz, c["cx"], c["cy"])
        return F.format_string(
            "<NetworkLink><name>%d/%d/%d</name>"
            + _KML_REGION
            + "<Link><href>../../%d/%d/%d.kml</href>"
            "<viewRefreshMode>onRegion</viewRefreshMode></Link></NetworkLink>",
            cz, c["cx"], c["cy"],
            cn, cs, ce, cw, F.lit(min_lod),
            cz, c["cx"], tm.tms_to_xyz(c["cy"], cz),
        )

    kml = F.concat(
        F.lit('<?xml version="1.0" encoding="UTF-8"?>'),
        F.lit('<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'),
        region,
        F.format_string(
            "<GroundOverlay><drawOrder>%d</drawOrder><Icon><href>%s</href></Icon>"
            "<LatLonBox><north>%.9f</north><south>%.9f</south>"
            "<east>%.9f</east><west>%.9f</west></LatLonBox></GroundOverlay>",
            z, img_href, north, south, east, west,
        ),
        F.array_join(F.transform(F.col("children"), link), ""),
        F.lit("</Document></kml>"),
    )
    return out.select(
        "z", "x", "y",
        F.size("children").alias("n_children"),
        F.array_join(
            F.transform(
                F.col("children"),
                lambda c: F.concat_ws(":", c["cx"].cast("string"), c["cy"].cast("string")),
            ),
            ",",
        ).alias("children_csv"),
        doc_path.alias("doc_path"),
        img_href.alias("img_href"),
        kml.alias("kml"),
    )


def to_osmdroid_keys(tiles: DataFrame, provider: str = "tiles") -> DataFrame:
    """tiles -> osmdroid sqlite tile-archive rows (key, provider, tile)
    per the published osmdroid DatabaseFileArchive /
    SqliteArchiveTileWriter schema [SPEC]:

        CREATE TABLE tiles (key INTEGER, provider TEXT, tile BLOB,
                            PRIMARY KEY (key, provider))

    with key = getIndex(x, y_osm, z) = (((z << z) + x) << z) + y_osm
    (Java precedence: shifts bind looser than +) and y_osm in OSM/Google
    top-down convention. Evaluated as all-LONG integer arithmetic
    (z <= 29 keeps max key (z+1)*4^z - 1 < 2^63) — exact, no double
    rounding. Pure column projection like the MBTiles/RMaps/GPKG twins;
    a whole container conversion stays one narrow Exchange-free stage."""
    n = tm.n_tiles("z")
    y_osm = tm.tms_to_xyz(F.col("y"), F.col("z")).cast("long")
    key = (F.col("z").cast("long") * n + F.col("x").cast("long")) * n + y_osm
    return tiles.select(
        key.cast("long").alias("key"),
        F.lit(provider).alias("provider"),
        F.col("tile"),
    )


def from_osmdroid_keys(df: DataFrame) -> DataFrame:
    """Inverse of to_osmdroid_keys. z is recoverable without metadata:
    the per-zoom key ranges [z*4^z, (z+1)*4^z) are disjoint and
    increasing, so z is the unique v in 0..29 with (key >> 2v) == v;
    then x = (key >> z) & (2^z - 1) and y_osm = key & (2^z - 1),
    flipped back to canonical TMS y. Pure column bit math (the variable
    shifts go through the SQL shiftright, which accepts column bit
    counts)."""
    k = F.col("key").cast("long")
    z = F.coalesce(
        *[F.when(F.shiftright(k, 2 * v) == v, F.lit(v)) for v in range(30)]
    ).cast("int")
    d = df.withColumn("_z", z)
    mask = (tm.n_tiles("_z") - F.lit(1)).cast("long")
    x = F.expr("shiftright(CAST(key AS BIGINT), _z)").bitwiseAND(mask)
    y_osm = F.col("key").cast("long").bitwiseAND(mask)
    return d.select(
        F.col("_z").alias("z"),
        x.cast("long").alias("x"),
        tm.tms_to_xyz(y_osm, F.col("_z")).cast("long").alias("y"),
        F.col("tile"),
    )


def overzoom_keys(tiles: DataFrame, to_z: int) -> DataFrame:
    """Key-space leg of overzoom (serving zooms DEEPER than the rendered
    pyramid — the standard tile-server fallback): every stored
    (z, x, y TMS) row explodes to its 4^(to_z - z) descendant keys
    (cz, cx, cy). Pure Column sequence+explode over keys only — blobs
    are not touched, so the planner leg costs four longs per child."""
    f = F.pow(F.lit(2.0), (F.lit(to_z) - F.col("z")).cast("double")).cast("bigint")
    return (
        tiles.withColumn("cz", F.lit(to_z))
        .withColumn("cx", F.explode(F.sequence(F.col("x") * f, F.col("x") * f + f - 1)))
        .withColumn("cy", F.explode(F.sequence(F.col("y") * f, F.col("y") * f + f - 1)))
    )


def overzoom_tiles(tiles: DataFrame, to_z: int, tile_size: int = 256) -> DataFrame:
    """Pixel leg of overzoom: materialize zoom `to_z` tiles from a
    shallower stored level by quarter-crop + nearest upscale (the
    convention tile servers and clients apply when a pyramid's max zoom
    is exceeded — resampling stays nearest so bytes are deterministic
    and repeated overzoom composes exactly).

    Scale shape: one Arrow ``mapInPandas`` pass — each stored blob is
    decoded ONCE and emits all its descendants; keys/blobs never
    shuffle (children are produced in the ancestor's partition). Depth
    is capped at 4 (16x upscale) — beyond that serve the client the
    ancestor instead. Input rows where z >= to_z pass through unchanged
    (idempotent on already-deep sets)."""
    from ..functions import codecs

    def run(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"z": [], "x": [], "y": [], "tile": []}
            for r in pdf.itertuples():
                z, x, y = int(r.z), int(r.x), int(r.y)
                blob = bytes(r.tile)
                if z >= to_z:
                    out["z"].append(z)
                    out["x"].append(x)
                    out["y"].append(y)
                    out["tile"].append(blob)
                    continue
                d = to_z - z
                if d > 4:
                    raise ValueError(
                        f"overzoom depth {d} > 4 (z={z} -> {to_z}); render deeper "
                        "levels instead of upscaling 32x+"
                    )
                fmt = codecs.sniff_fmt(blob)
                arr = codecs.to_rgba(codecs.decode_image(blob, fmt))
                n = 1 << d
                w = tile_size >> d
                rep = tile_size // w
                for sx in range(n):
                    for sy in range(n):  # sy = TMS sub-row (from bottom)
                        r0 = (n - 1 - sy) * w  # pixel rows count from top
                        crop = arr[r0 : r0 + w, sx * w : (sx + 1) * w]
                        up = np.repeat(np.repeat(crop, rep, axis=0), rep, axis=1)
                        out["z"].append(to_z)
                        out["x"].append(x * n + sx)
                        out["y"].append(y * n + sy)
                        out["tile"].append(
                            codecs.encode_raw(up) if fmt == "raw" else codecs.encode_tile_png(up)
                        )
            yield pd.DataFrame(out)

    return tiles.select("z", "x", "y", "tile").mapInPandas(
        run, schema="z int, x long, y long, tile binary"
    )
