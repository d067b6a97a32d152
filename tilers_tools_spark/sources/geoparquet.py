"""WKB geometry codec + GeoParquet ingest (SURVEY.md §2.1 vector-ingest
family — the FOURTH vector driver beside WKT, GeoJSON and Shapefile).

Why it exists: GeoParquet (parquet + a WKB-encoded geometry column +
file-level ``geo`` footer metadata, public spec geoparquet.org v1.0) is
the interchange format a Spark-native engine is MOST likely to be handed
— it is what GDAL/ogr2ogr, GeoPandas, DuckDB-spatial and Sedona all emit
for columnar vector data. Reading it needs exactly two public pieces:
the OGC Well-Known-Binary encoding (OGC 06-103r4 "Simple feature
access", §8) and the GeoParquet footer convention.

WKB facts implemented (all from OGC 06-103r4 + the PostGIS EWKB
extension, both public):

* per-geometry header: 1 byte order byte (0=XDR big-endian, 1=NDR
  little-endian) + uint32 geometry type. Each NESTED geometry inside a
  Multi*/GeometryCollection repeats its own full header.
* base types: 1 Point, 2 LineString, 3 Polygon (ring 0 outer, rings
  1..n-1 holes — the spec's even-odd interior), 4 MultiPoint,
  5 MultiLineString, 6 MultiPolygon, 7 GeometryCollection.
* dimensionality, BOTH public conventions: ISO adds 1000 (Z), 2000 (M),
  3000 (ZM) to the type code; PostGIS EWKB sets flag bits 0x80000000
  (Z), 0x40000000 (M) and 0x20000000 (SRID present → uint32 SRID
  follows the type word). Z/M ordinates are parsed past — the engine is
  2-D, XY is extracted and ``has_z`` flagged (same policy as the
  Shapefile driver).
* GeoParquet footer: parquet key-value metadata key ``geo`` is a JSON
  blob with ``primary_column`` and per-column ``encoding`` (must be
  "WKB" in v1.0). Parsed driver-side via pyarrow from ONE footer (KB),
  used to locate/validate the geometry column; the geometry bytes
  themselves are read by Spark's normal distributed parquet scan.

Scale strategy: geometry blobs live in a parquet column, so the read IS
a columnar Spark scan (predicate pushdown / column pruning intact);
decode runs executor-side per Arrow batch in ``mapInPandas``. Nothing
transits the driver except the footer JSON. For the broadcast-side
polygon contract (small sets) ``wkb_polygons_df`` collapses to the same
(poly_id, ring) shape as ``wkt_polygons_df`` — multipolygon members and
holes are extra rings of the same poly_id, which is exactly what the
engine's even-odd PIP/cutline semantics want.

Correctness pinning: the parser is pinned against HANDCRAFTED spec bytes
(tests/test_wkb.py assembles point/linestring/polygon-with-hole/multi*/
collection/EWKB-SRID/ISO-Z hex by hand, incl. the canonical PostGIS
``0101000020E6100000...`` SRID example), so the symmetric writer+reader
pair used by the oracle gate cannot hide a shared layout bug.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KIND = {
    1: "point",
    2: "linestring",
    3: "polygon",
    4: "multipoint",
    5: "multilinestring",
    6: "multipolygon",
    7: "collection",
}
_CODE = {v: k for k, v in _KIND.items()}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


# --- parse -------------------------------------------------------------------


def _parse_geom(buf: bytes, off: int):
    """Parse one (possibly nested) WKB geometry starting at ``off``.
    Returns (components, new_off, srid) where components is a flat list
    of (kind, has_z, is_hole, ring) and ring is a list of (x, y)."""
    order = buf[off]
    off += 1
    if order not in (0, 1):
        raise ValueError(f"WKB: bad byte-order byte {order!r} at {off - 1}")
    bo = "<" if order == 1 else ">"
    (t,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    has_z = bool(t & _EWKB_Z)
    has_m = bool(t & _EWKB_M)
    srid = None
    if t & _EWKB_SRID:
        (srid,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
    base = t & 0x0FFFFFFF
    if base >= 3000:  # ISO ZM
        has_z = has_m = True
        base -= 3000
    elif base >= 2000:  # ISO M
        has_m = True
        base -= 2000
    elif base >= 1000:  # ISO Z
        has_z = True
        base -= 1000
    kind = _KIND.get(base)
    if kind is None:
        raise ValueError(f"WKB: unknown geometry type {t}")
    dim = 2 + has_z + has_m

    def read_pts(n, off):
        vals = struct.unpack_from(bo + "d" * (n * dim), buf, off)
        return [(vals[i * dim], vals[i * dim + 1]) for i in range(n)], off + 8 * n * dim

    if kind == "point":
        ring, off = read_pts(1, off)
        return [("point", has_z, False, ring)], off, srid
    if kind == "linestring":
        (n,) = struct.unpack_from(bo + "I", buf, off)
        ring, off = read_pts(n, off + 4)
        return [("linestring", has_z, False, ring)], off, srid
    if kind == "polygon":
        (nrings,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        comps = []
        for ri in range(nrings):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            ring, off = read_pts(n, off + 4)
            comps.append(("polygon", has_z, ri > 0, ring))
        return comps, off, srid
    # multi* / collection: count + nested full geometries
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    comps = []
    for _ in range(n):
        sub, off, sub_srid = _parse_geom(buf, off)
        srid = srid if srid is not None else sub_srid
        comps.extend(sub)
    if kind == "multipoint":  # collapse n nested points into ONE part
        pts = [c[3][0] for c in comps]
        comps = [("multipoint", has_z or any(c[1] for c in comps), False, pts)]
    elif kind in ("multilinestring", "multipolygon"):
        comps = [(kind, hz or has_z, hole, ring) for _k, hz, hole, ring in comps]
    # collection: members keep their own kinds
    return comps, off, srid


def parse_wkb(buf: bytes):
    """WKB/EWKB blob -> (components, srid). components is a flat list of
    (kind, has_z, is_hole, ring); multi-geometry members appear in order
    (part index = list position); polygon ring 0 is the outer ring, the
    rest are holes (is_hole=True) per OGC 06-103r4 §8.2.6."""
    comps, off, srid = _parse_geom(bytes(buf), 0)
    if off != len(buf):
        raise ValueError(f"WKB: {len(buf) - off} trailing bytes after geometry")
    return comps, srid


# --- write -------------------------------------------------------------------


def write_wkb(kind: str, parts, has_z: bool = False, z: float = 0.0,
              srid: int | None = None, byteorder: str = "<") -> bytes:
    """Fixture/export writer. ``parts`` semantics per kind: point →
    [[(x,y)]]; linestring/multipoint → [pts]; polygon → [outer, *holes];
    multilinestring → [line, ...]; multipolygon → [[outer, *holes], ...]
    (one entry per member polygon). Points may be (x, y) or (x, y, z);
    2-tuples get ``z`` when has_z. SRID set → PostGIS EWKB flag encoding;
    otherwise ISO (+1000 for Z). GeometryCollection is parse-only."""
    bo = byteorder
    if bo not in ("<", ">"):
        raise ValueError("byteorder must be '<' or '>'")
    obyte = b"\x01" if bo == "<" else b"\x00"

    def type_word(base: int) -> bytes:
        if srid is not None:
            t = base | _EWKB_SRID | (_EWKB_Z if has_z else 0)
            return struct.pack(bo + "II", t, srid)
        return struct.pack(bo + "I", base + (1000 if has_z else 0))

    def sub_type_word(base: int) -> bytes:  # nested geoms never carry SRID
        if srid is not None:
            return struct.pack(bo + "I", base | (_EWKB_Z if has_z else 0))
        return struct.pack(bo + "I", base + (1000 if has_z else 0))

    def pts_bytes(pts) -> bytes:
        out = bytearray()
        for p in pts:
            out += struct.pack(bo + "dd", float(p[0]), float(p[1]))
            if has_z:
                out += struct.pack(bo + "d", float(p[2]) if len(p) > 2 else float(z))
        return bytes(out)

    if kind == "point":
        return obyte + type_word(1) + pts_bytes(parts[0][:1])
    if kind == "linestring":
        pts = parts[0]
        return obyte + type_word(2) + struct.pack(bo + "I", len(pts)) + pts_bytes(pts)
    if kind == "polygon":
        body = struct.pack(bo + "I", len(parts))
        for ring in parts:
            body += struct.pack(bo + "I", len(ring)) + pts_bytes(ring)
        return obyte + type_word(3) + body
    if kind == "multipoint":
        pts = parts[0]
        body = struct.pack(bo + "I", len(pts))
        for p in pts:
            body += obyte + sub_type_word(1) + pts_bytes([p])
        return obyte + type_word(4) + body
    if kind == "multilinestring":
        body = struct.pack(bo + "I", len(parts))
        for line in parts:
            body += (obyte + sub_type_word(2)
                     + struct.pack(bo + "I", len(line)) + pts_bytes(line))
        return obyte + type_word(5) + body
    if kind == "multipolygon":
        body = struct.pack(bo + "I", len(parts))
        for rings in parts:
            pbody = struct.pack(bo + "I", len(rings))
            for ring in rings:
                pbody += struct.pack(bo + "I", len(ring)) + pts_bytes(ring)
            body += obyte + sub_type_word(3) + pbody
        return obyte + type_word(6) + body
    raise ValueError(f"write_wkb: unsupported kind {kind!r}")


# --- Spark operators ---------------------------------------------------------

_GEO_SCHEMA = ("geom_id long, kind string, has_z boolean, srid int, "
               "part int, is_hole boolean, ring array<struct<lon:double,lat:double>>")


def wkb_geometries(df: DataFrame, id_col: str = "geom_id",
                   wkb_col: str = "geometry") -> DataFrame:
    """Decode a WKB binary column -> one row per geometry component:
    (geom_id, kind, has_z, srid, part, is_hole, ring). Runs executor-side
    per Arrow batch (mapInPandas) over Spark's normal columnar parquet
    scan — blobs never transit the driver; column pruning keeps the scan
    to (id, geometry)."""
    import pandas as pd

    def gen(batches):
        for b in batches:
            rows = []
            for gid, buf in zip(b["_gid"], b["_wkb"]):
                comps, srid = parse_wkb(bytes(buf))
                for pi, (kind, hz, hole, ring) in enumerate(comps):
                    rows.append((
                        int(gid), kind, hz,
                        None if srid is None else int(srid), pi, hole,
                        [{"lon": float(x), "lat": float(y)} for x, y in ring],
                    ))
            yield pd.DataFrame(
                rows,
                columns=["geom_id", "kind", "has_z", "srid", "part",
                         "is_hole", "ring"],
            )

    src = df.select(F.col(id_col).cast("long").alias("_gid"),
                    F.col(wkb_col).alias("_wkb"))
    return src.mapInPandas(gen, _GEO_SCHEMA)


def wkb_polygons_df(df: DataFrame, id_col: str = "geom_id",
                    wkb_col: str = "geometry") -> DataFrame:
    """Collapse WKB polygons/multipolygons to the (poly_id, ring)
    broadcast shape pip_join / apply_cutline consume — holes and
    multipolygon members are extra rings of the same poly_id (even-odd
    semantics handle both without special casing)."""
    g = wkb_geometries(df, id_col=id_col, wkb_col=wkb_col)
    return g.filter(F.col("kind").isin("polygon", "multipolygon")).select(
        F.col("geom_id").cast("string").alias("poly_id"), "ring"
    )


def read_geoparquet(spark: SparkSession, path: str,
                    geometry_col: str | None = None,
                    id_col: str = "geom_id") -> DataFrame:
    """GeoParquet -> decoded component rows. The ``geo`` footer JSON
    (primary_column + encoding, GeoParquet v1.0) is read driver-side via
    pyarrow from one footer; the data scan + WKB decode are distributed.
    Fails loudly on a non-WKB encoding rather than mis-decoding."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(path) else [path]
    meta = pq.read_schema(files[0]).metadata or {}
    if b"geo" in meta:
        geo = json.loads(meta[b"geo"])
        if geometry_col is None:
            geometry_col = geo.get("primary_column", "geometry")
        enc = geo.get("columns", {}).get(geometry_col, {}).get("encoding", "WKB")
        if enc != "WKB":
            raise NotImplementedError(
                f"GeoParquet encoding {enc!r} for column {geometry_col!r} — "
                "only WKB (v1.0) is supported")
    elif geometry_col is None:
        geometry_col = "geometry"
    return wkb_geometries(spark.read.parquet(path), id_col=id_col,
                          wkb_col=geometry_col)
