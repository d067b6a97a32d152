"""Directory tile-tree materializer (SURVEY.md §2.1 row 3 'optional
materializer'): writes `dest/<path>` files per partition for interop with
tools that expect gdal_tiler-style xyz/tms/zyx trees. The primary sink is
the tiles table; this exists for parity with the reference's filesystem
output. `noclobber=True` reproduces the reference's skip-existing resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.convert import tile_path


def write_tileset_dir(tiles: DataFrame, dest: str, scheme: str = "xyz", ext: str = "png", noclobber: bool = True) -> str:
    if scheme == "zoomify":
        from ..operators.convert import zoomify_path

        df = zoomify_path(tiles, ext=ext).select("path", "tile")
    else:
        df = tile_path(tiles, scheme=scheme, ext=ext).select("path", "tile")

    def write_part(rows):
        for r in rows:
            p = os.path.join(dest, r["path"])
            if noclobber and os.path.exists(p):
                continue
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(r["tile"]))
            os.replace(tmp, p)

    df.foreachPartition(write_part)
    return dest


def write_tilemap_xml(
    tiles: DataFrame, dest: str, title: str = "tiles", ext: str = "png", profile: str = "mercator"
) -> str:
    """Write the OSGeo TMS `tilemapresource.xml` next to the tile tree —
    the reference's tilemap metadata writer (SURVEY.md §2.1 row 4; format
    per the public TMS spec [SPEC], as gdal2tiles/gdal_tiler emit it).
    Bounds come from the deepest zoom's tile range (TMS y); one driver-side
    write of a tiny aggregate. Deterministic output text.

    `profile="mercator"` (EPSG:900913 meters, square grid) or
    `profile="geodetic"` (TMS global-geodetic: EPSG:4326 degrees, origin
    (-180,-90), units-per-pixel 0.703125/2^z, 2^(z+1) x 2^z tiles)."""
    from ..functions import tilemath as tm
    from ..operators.convert import tilemap_metadata

    if profile not in ("mercator", "geodetic"):
        raise ValueError(f"profile must be 'mercator' or 'geodetic', got {profile!r}")
    rows = tilemap_metadata(tiles).collect()
    if not rows:
        raise ValueError("empty tile set")
    deepest = max(rows, key=lambda r: r["z"])
    z = int(deepest["z"])
    if profile == "geodetic":
        res0, ox, oy, srs, prof_attr = tm.RES0_GEO, -180.0, -90.0, "EPSG:4326", "global-geodetic"
    else:
        res0, ox, oy, srs, prof_attr = tm.RES0, -tm.ORIGIN, -tm.ORIGIN, "EPSG:900913", "mercator"
    span = res0 / (2.0**z) * 256.0
    minx = deepest["xmin"] * span + ox
    maxx = (deepest["xmax"] + 1) * span + ox
    miny = deepest["ymin"] * span + oy
    maxy = (deepest["ymax"] + 1) * span + oy
    from xml.sax.saxutils import escape

    title = escape(title)
    ext = escape(ext)
    mime = escape({"png": "image/png", "jpeg": "image/jpeg", "jpg": "image/jpeg"}.get(ext, f"image/{ext}"))
    tilesets = "\n".join(
        f'    <TileSet href="{int(r["z"])}" units-per-pixel="{res0 / (2.0 ** int(r["z"])):.17g}" order="{int(r["z"])}"/>'
        for r in sorted(rows, key=lambda r: r["z"])
    )
    xml = f"""<?xml version="1.0" encoding="utf-8"?>
<TileMap version="1.0.0" tilemapservice="http://tms.osgeo.org/1.0.0">
  <Title>{title}</Title>
  <Abstract></Abstract>
  <SRS>{srs}</SRS>
  <BoundingBox minx="{minx:.17g}" miny="{miny:.17g}" maxx="{maxx:.17g}" maxy="{maxy:.17g}"/>
  <Origin x="{ox:.17g}" y="{oy:.17g}"/>
  <TileFormat width="256" height="256" mime-type="{mime}" extension="{ext}"/>
  <TileSets profile="{prof_attr}">
{tilesets}
  </TileSets>
</TileMap>
"""
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, "tilemapresource.xml")
    with open(out, "w") as f:
        f.write(xml)
    return out


def write_tilejson(
    tiles: DataFrame,
    dest: str,
    name: str = "tiles",
    ext: str = "png",
    scheme: str = "xyz",
    url_base: str = "",
) -> str:
    """Write a TileJSON 3.0.0 `tiles.json` next to the tile tree — the
    modern-toolchain counterpart of `tilemapresource.xml` (Mapbox TileJSON
    spec [SPEC]; consumed by MapLibre/Mapbox/OpenLayers). Same tiny driver-
    side aggregate as the TMS writer; bounds are the deepest zoom's tile
    extent inverse-projected to lon/lat (W, S, E, N per spec), `scheme`
    "xyz" or "tms" per spec §3.11. Deterministic output text (sorted keys,
    repr-stable floats via %.8f)."""
    import json as _json

    from ..functions import tilemath as tm
    from ..operators.convert import tilemap_metadata

    if scheme not in ("xyz", "tms"):
        raise ValueError(f"TileJSON scheme must be xyz or tms, got {scheme!r}")
    rows = tilemap_metadata(tiles).collect()
    if not rows:
        raise ValueError("empty tile set")
    deepest = max(rows, key=lambda r: r["z"])
    z = int(deepest["z"])
    span = tm.RES0 / (2.0**z) * 256.0
    import numpy as np

    mx = np.array([deepest["xmin"] * span - tm.ORIGIN, (deepest["xmax"] + 1) * span - tm.ORIGIN])
    my = np.array([deepest["ymin"] * span - tm.ORIGIN, (deepest["ymax"] + 1) * span - tm.ORIGIN])
    lon, lat = tm.inv_merc_np(mx, my)
    bounds = [
        round(float(lon[0]), 8),
        round(float(lat[0]), 8),
        round(float(lon[1]), 8),
        round(float(lat[1]), 8),
    ]
    zs = sorted(int(r["z"]) for r in rows)
    doc = {
        "tilejson": "3.0.0",
        "name": name,
        "scheme": scheme,
        "tiles": [f"{url_base}{{z}}/{{x}}/{{y}}.{ext}"],
        "minzoom": zs[0],
        "maxzoom": zs[-1],
        "bounds": bounds,
        "center": [
            round((bounds[0] + bounds[2]) / 2.0, 8),
            round((bounds[1] + bounds[3]) / 2.0, 8),
            zs[0],
        ],
    }
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, "tiles.json")
    with open(out, "w") as f:
        _json.dump(doc, f, indent=1, sort_keys=True)
    return out


def write_leaflet_html(
    tiles: DataFrame,
    dest: str,
    title: str = "tiles",
    ext: str = "png",
    scheme: str = "xyz",
    url_base: str = "./",
) -> str:
    """Write a self-contained `leaflet.html` viewer next to the tile tree
    — gdal2tiles' `-w leaflet` output role. One tiny driver-side
    aggregate (tilemap_metadata) supplies the zoom range and the lat/lon
    fit bounds (pixel-edge mercator -> degrees via the engine's own
    inverse); the Leaflet library itself loads from the standard CDN
    URLs gdal2tiles emits. `scheme='tms'` sets the Leaflet tms flag
    instead of renaming tiles. Deterministic output text."""
    import numpy as np

    from ..functions import tilemath as tm
    from ..operators.convert import tilemap_metadata
    from xml.sax.saxutils import escape

    rows = tilemap_metadata(tiles).collect()
    if not rows:
        raise ValueError("empty tile set")
    zmin = min(int(r["z"]) for r in rows)
    zmax = max(int(r["z"]) for r in rows)
    deepest = max(rows, key=lambda r: r["z"])
    span = tm.RES0 / (2.0 ** int(deepest["z"])) * 256.0
    mx = np.array([deepest["xmin"] * span - tm.ORIGIN, (deepest["xmax"] + 1) * span - tm.ORIGIN])
    my = np.array([deepest["ymin"] * span - tm.ORIGIN, (deepest["ymax"] + 1) * span - tm.ORIGIN])
    lon, lat = tm.inv_merc_np(mx, my)
    title = escape(title)
    tms_flag = "true" if scheme == "tms" else "false"
    html = f"""<!DOCTYPE html>
<html>
<head>
  <title>{title}</title>
  <meta charset="utf-8"/>
  <meta name="viewport" content="width=device-width, initial-scale=1.0"/>
  <link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
  <script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
  <style>html, body, #map {{ width: 100%; height: 100%; margin: 0; }}</style>
</head>
<body>
<div id="map"></div>
<script>
var map = L.map('map');
L.tileLayer('{url_base}{{z}}/{{x}}/{{y}}.{ext}', {{
  minZoom: {zmin}, maxZoom: {zmax}, tms: {tms_flag}, attribution: '{title}'
}}).addTo(map);
map.fitBounds([[{lat[0]:.8f}, {lon[0]:.8f}], [{lat[1]:.8f}, {lon[1]:.8f}]]);
</script>
</body>
</html>
"""
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, "leaflet.html")
    with open(out, "w") as f:
        f.write(html)
    return out


def write_openlayers_html(
    tiles: DataFrame,
    dest: str,
    title: str = "tiles",
    ext: str = "png",
    scheme: str = "xyz",
    url_base: str = "./",
) -> str:
    """Write an `openlayers.html` viewer next to the tile tree —
    gdal2tiles' default `-w openlayers` output role (OpenLayers 7 API).
    Same tiny driver-side aggregate as write_leaflet_html; `scheme='tms'`
    flips the y in the URL template the way OL expresses TMS
    (`{-y}`). Deterministic output text."""
    from ..functions import tilemath as tm
    from ..operators.convert import tilemap_metadata
    from xml.sax.saxutils import escape

    rows = tilemap_metadata(tiles).collect()
    if not rows:
        raise ValueError("empty tile set")
    zmin = min(int(r["z"]) for r in rows)
    zmax = max(int(r["z"]) for r in rows)
    deepest = max(rows, key=lambda r: r["z"])
    span = tm.RES0 / (2.0 ** int(deepest["z"])) * 256.0
    minx = deepest["xmin"] * span - tm.ORIGIN
    maxx = (deepest["xmax"] + 1) * span - tm.ORIGIN
    miny = deepest["ymin"] * span - tm.ORIGIN
    maxy = (deepest["ymax"] + 1) * span - tm.ORIGIN
    title = escape(title)
    ytok = "{-y}" if scheme == "tms" else "{y}"
    html = f"""<!DOCTYPE html>
<html>
<head>
  <title>{title}</title>
  <meta charset="utf-8"/>
  <meta name="viewport" content="width=device-width, initial-scale=1.0"/>
  <link rel="stylesheet" href="https://cdn.jsdelivr.net/npm/ol@v7.5.2/ol.css"/>
  <script src="https://cdn.jsdelivr.net/npm/ol@v7.5.2/dist/ol.js"></script>
  <style>html, body, #map {{ width: 100%; height: 100%; margin: 0; }}</style>
</head>
<body>
<div id="map"></div>
<script>
var extent = [{minx:.17g}, {miny:.17g}, {maxx:.17g}, {maxy:.17g}];
var map = new ol.Map({{
  target: 'map',
  layers: [new ol.layer.Tile({{
    source: new ol.source.XYZ({{
      url: '{url_base}{{z}}/{{x}}/{ytok}.{ext}',
      minZoom: {zmin}, maxZoom: {zmax}, attributions: '{title}'
    }})
  }})],
  view: new ol.View({{ minZoom: {zmin}, maxZoom: {zmax} }})
}});
map.getView().fit(extent, {{size: map.getSize()}});
</script>
</body>
</html>
"""
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, "openlayers.html")
    with open(out, "w") as f:
        f.write(html)
    return out


def read_tileset_dir(spark, src: str, scheme: str = "xyz"):
    """Walk a tile tree back into a canonical tiles DF (row 10: the tile-set
    walk IS a scan). Uses Spark's binaryFile source for a parallel read.
    Matches every container extension the engine writes (png/jpg/tif/raw)
    — the blob codec is sniffed downstream from magic bytes, not from the
    filename."""
    from pyspark.sql import functions as F

    from ..functions import tilemath as tm

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{png,jpg,tif,raw}")
        .option("recursiveFileLookup", "true")
        .load(src)
    )
    parts = F.split(
        F.regexp_replace(F.col("path"), r"^.*?(\d+)/(\d+)/(\d+)\.(?:png|jpg|tif|raw)$", "$1/$2/$3"),
        "/",
    )
    df = df.select(
        parts.getItem(0).cast("int").alias("z"),
        parts.getItem(1).cast("long").alias("a"),
        parts.getItem(2).cast("long").alias("b"),
        F.col("content").alias("tile"),
    )
    if scheme == "xyz":
        return df.select("z", F.col("a").alias("x"), tm.tms_to_xyz(F.col("b"), F.col("z")).alias("y"), "tile")
    if scheme == "tms":
        return df.select("z", F.col("a").alias("x"), F.col("b").alias("y"), "tile")
    if scheme == "zyx":
        return df.select("z", F.col("b").alias("x"), tm.tms_to_xyz(F.col("a"), F.col("z")).alias("y"), "tile")
    raise ValueError(scheme)


def write_superoverlay_kml(
    tiles: DataFrame, dest: str, ext: str = "png", min_lod: int = 128, name: str = "tiles"
) -> str:
    """Materialize a Google-Earth SuperOverlay next to an xyz tile tree:
    one `z/x/y.kml` per tile (Region + GroundOverlay + per-existing-child
    onRegion NetworkLinks, from operators.convert.kml_superoverlay) plus
    a driver-written `doc.kml` root linking the top zoom's tiles (the top
    level of a pyramid is a handful of rows — safe to collect). Write the
    images with write_tileset_dir(scheme='xyz') alongside."""
    from xml.sax.saxutils import escape

    from ..operators.convert import kml_superoverlay

    df = kml_superoverlay(tiles, ext=ext, min_lod=min_lod).select("z", "doc_path", "kml")
    df = df.persist()
    try:

        def write_part(rows):
            for r in rows:
                p = os.path.join(dest, r["doc_path"])
                os.makedirs(os.path.dirname(p), exist_ok=True)
                tmp = p + ".tmp"
                with open(tmp, "w", encoding="utf-8") as f:
                    f.write(r["kml"])
                os.replace(tmp, p)

        df.foreachPartition(write_part)
        zmin = df.agg({"z": "min"}).collect()[0][0]
        if zmin is None:
            raise ValueError("empty tile set")
        top = sorted(r["doc_path"] for r in df.where(df["z"] == zmin).collect())
        links = "".join(
            f"<NetworkLink><name>{escape(p)}</name><Link><href>{escape(p)}</href>"
            "</Link></NetworkLink>"
            for p in top
        )
        root = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<kml xmlns="http://www.opengis.net/kml/2.2"><Document>'
            f"<name>{escape(name)}</name>{links}</Document></kml>"
        )
        with open(os.path.join(dest, "doc.kml"), "w", encoding="utf-8") as f:
            f.write(root)
    finally:
        df.unpersist()
    return dest


def write_wmts_capabilities(
    tiles: DataFrame, dest: str, name: str = "tiles", ext: str = "png", url_base: str = ""
) -> str:
    """Write an OGC WMTS 1.0.0 GetCapabilities document (OGC 07-057r7
    [SPEC], RESTful encoding) describing the tile tree — the serving
    descriptor MapProxy/QGIS/OpenLayers consume, completing the metadata
    family next to tilemapresource.xml / tiles.json / leaflet /
    openlayers / KML.

    EPSG:3857 TileMatrixSet with the well-known GoogleMapsCompatible
    scale ladder: ScaleDenominator(z) = RES0 / 2^z / 0.00028 (the WMTS
    standardized 0.28 mm pixel), TopLeftCorner (-ORIGIN, ORIGIN), 256px
    tiles, MatrixWidth = MatrixHeight = 2^z. WMTS TileRow is TOP-DOWN
    (XYZ convention), so per-zoom TileMatrixLimits flip the engine's TMS
    rows and the ResourceURL template matches an xyz directory layout.
    One tiny per-zoom aggregate collected driver-side; deterministic
    output text."""
    import math

    from xml.sax.saxutils import escape

    from ..functions import tilemath as tm
    from ..operators.convert import tilemap_metadata

    rows = sorted(tilemap_metadata(tiles).collect(), key=lambda r: r["z"])
    if not rows:
        raise ValueError("empty tile set")
    deepest = rows[-1]
    z = int(deepest["z"])
    span = tm.RES0 / (2.0**z) * 256.0
    minx = deepest["xmin"] * span - tm.ORIGIN
    maxx = (deepest["xmax"] + 1) * span - tm.ORIGIN
    miny = deepest["ymin"] * span - tm.ORIGIN
    maxy = (deepest["ymax"] + 1) * span - tm.ORIGIN

    def _lon(mx):
        return mx / tm.ORIGIN * 180.0

    def _lat(my):
        return math.degrees(2.0 * math.atan(math.exp(my / tm.ORIGIN * math.pi)) - math.pi / 2.0)

    name_x = escape(name)
    mime = escape({"png": "image/png", "jpeg": "image/jpeg", "jpg": "image/jpeg"}.get(ext, f"image/{ext}"))
    limits = "\n".join(
        "          <TileMatrixLimits>\n"
        f"            <TileMatrix>{int(r['z'])}</TileMatrix>\n"
        f"            <MinTileRow>{(1 << int(r['z'])) - 1 - int(r['ymax'])}</MinTileRow>\n"
        f"            <MaxTileRow>{(1 << int(r['z'])) - 1 - int(r['ymin'])}</MaxTileRow>\n"
        f"            <MinTileCol>{int(r['xmin'])}</MinTileCol>\n"
        f"            <MaxTileCol>{int(r['xmax'])}</MaxTileCol>\n"
        "          </TileMatrixLimits>"
        for r in rows
    )
    matrices = "\n".join(
        "      <TileMatrix>\n"
        f"        <ows:Identifier>{int(r['z'])}</ows:Identifier>\n"
        f"        <ScaleDenominator>{tm.RES0 / (2.0 ** int(r['z'])) / 0.00028:.17g}</ScaleDenominator>\n"
        f"        <TopLeftCorner>{-tm.ORIGIN:.17g} {tm.ORIGIN:.17g}</TopLeftCorner>\n"
        "        <TileWidth>256</TileWidth>\n"
        "        <TileHeight>256</TileHeight>\n"
        f"        <MatrixWidth>{1 << int(r['z'])}</MatrixWidth>\n"
        f"        <MatrixHeight>{1 << int(r['z'])}</MatrixHeight>\n"
        "      </TileMatrix>"
        for r in rows
    )
    xml = f"""<?xml version="1.0" encoding="UTF-8"?>
<Capabilities xmlns="http://www.opengis.net/wmts/1.0"
    xmlns:ows="http://www.opengis.net/ows/1.1"
    xmlns:xlink="http://www.w3.org/1999/xlink" version="1.0.0">
  <ows:ServiceIdentification>
    <ows:Title>{name_x}</ows:Title>
    <ows:ServiceType>OGC WMTS</ows:ServiceType>
    <ows:ServiceTypeVersion>1.0.0</ows:ServiceTypeVersion>
  </ows:ServiceIdentification>
  <Contents>
    <Layer>
      <ows:Title>{name_x}</ows:Title>
      <ows:Identifier>{name_x}</ows:Identifier>
      <ows:WGS84BoundingBox>
        <ows:LowerCorner>{_lon(minx):.8f} {_lat(miny):.8f}</ows:LowerCorner>
        <ows:UpperCorner>{_lon(maxx):.8f} {_lat(maxy):.8f}</ows:UpperCorner>
      </ows:WGS84BoundingBox>
      <Style isDefault="true"><ows:Identifier>default</ows:Identifier></Style>
      <Format>{mime}</Format>
      <TileMatrixSetLink>
        <TileMatrixSet>{name_x}_matrix</TileMatrixSet>
        <TileMatrixSetLimits>
{limits}
        </TileMatrixSetLimits>
      </TileMatrixSetLink>
      <ResourceURL format="{mime}" resourceType="tile"
          template="{escape(url_base)}{{TileMatrix}}/{{TileCol}}/{{TileRow}}.{escape(ext)}"/>
    </Layer>
    <TileMatrixSet>
      <ows:Identifier>{name_x}_matrix</ows:Identifier>
      <ows:SupportedCRS>urn:ogc:def:crs:EPSG::3857</ows:SupportedCRS>
{matrices}
    </TileMatrixSet>
  </Contents>
</Capabilities>
"""
    os.makedirs(dest, exist_ok=True)
    out = os.path.join(dest, "WMTSCapabilities.xml")
    with open(out, "w") as f:
        f.write(xml)
    return out
