"""ESRI Shapefile container reader/writer (SURVEY.md §2.1 vector-ingest
family beside WKT/GeoJSON/KML; format per the public ESRI Shapefile
Technical Description whitepaper, 1998 [SPEC]).

Why it exists: the shapefile triplet (.shp geometry, .shx record index,
.dbf attributes) is still the most common interchange format for the
polygon/boundary sets this engine broadcasts into PIP joins and cutline
masks — a user pointing the vector side at real-world data hits .shp
before GeoJSON.

Format facts implemented (all from the whitepaper):

* .shp: 100-byte header — file code 9994 (BIG-endian i32 at offset 0),
  file length in 16-bit words (BE at 24), version 1000 (LE at 28), shape
  type (LE at 32), double bbox xmin/ymin/xmax/ymax (LE at 36) + Z/M
  ranges. Records: 8-byte BE header (1-based record number, content
  length in words) then LE content starting with the per-record shape
  type.
* shapes: Null (0), Point (1), PolyLine (3), Polygon (5), MultiPoint
  (8) and their Z/M variants (11/13/15/18, 21/23/25/28) — Z and M
  arrays are parsed past (XY extracted, has_z flagged) since the engine
  is 2-D. Polygon ring orientation per spec: outer rings CLOCKWISE,
  holes counter-clockwise — exposed as `is_hole` via the shoelace sign
  (the engine's PIP is even-odd, so holes need no special casing there).
* .shx: same 100-byte header, then per record (offset_words BE,
  content_length_words BE) — the record index that makes the read
  DISTRIBUTABLE: executors pread exactly their records' byte ranges.
* .dbf (dBase III): version byte 0x03, u32le record count, u16le header
  /record sizes, 32-byte field descriptors (11-byte name, type C/N/F/L/D,
  length, decimal count) terminated by 0x0D; fixed-width ASCII records,
  first byte '*' marks deletion. N with 0 decimals -> BIGINT, N/F with
  decimals -> DOUBLE, C/D -> VARCHAR, L -> BOOLEAN.

Scale strategy: the .shx index parses on the driver (8 bytes/record),
record spans become a DataFrame, and geometry bytes are fetched + parsed
EXECUTOR-side per batch (mapInPandas pread) — the .shp payload never
transits the driver. Attributes join on fid. For the broadcast-side
polygon contract (small sets) `shapefile_polygons_df` collapses to the
same (poly_id, ring) shape as `wkt_polygons_df`.

Correctness pinning: the reader is pinned against HANDCRAFTED spec bytes
(tests/test_shapefile.py assembles a .shp/.shx/.dbf byte-by-byte with
offsets from the whitepaper), so the symmetric writer+reader pair used by
the oracle gate cannot hide a shared layout bug.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8

_BASE_TYPE = {
    0: "null", 1: "point", 3: "polyline", 5: "polygon", 8: "multipoint",
    11: "point", 13: "polyline", 15: "polygon", 18: "multipoint",  # Z
    21: "point", 23: "polyline", 25: "polygon", 28: "multipoint",  # M
}
_HAS_Z = {11, 13, 15, 18}
_HAS_M = {21, 23, 25, 28}


# --- .shp --------------------------------------------------------------------


def _parse_record_content(data: bytes) -> tuple[str, bool, list[list[tuple[float, float]]]]:
    """One record's content (starting at its LE shape type) ->
    (kind, has_z, parts) where parts is a list of (x, y) point lists
    (points/multipoints become one part)."""
    (stype,) = struct.unpack_from("<i", data, 0)
    if stype == SHAPE_NULL:
        return "null", False, []
    kind = _BASE_TYPE.get(stype)
    if kind is None:
        raise NotImplementedError(f"shapefile shape type {stype} not supported")
    has_z = stype in _HAS_Z
    if kind == "point":
        x, y = struct.unpack_from("<2d", data, 4)
        return kind, has_z, [[(x, y)]]
    if kind == "multipoint":
        (npts,) = struct.unpack_from("<i", data, 36)  # after 4-double bbox
        pts = struct.unpack_from(f"<{2 * npts}d", data, 40)
        return kind, has_z, [[(pts[2 * i], pts[2 * i + 1]) for i in range(npts)]]
    # polyline / polygon: bbox(4d) numparts numpoints parts[] points[]
    nparts, npts = struct.unpack_from("<2i", data, 36)
    starts = list(struct.unpack_from(f"<{nparts}i", data, 44))
    pts_off = 44 + 4 * nparts
    flat = struct.unpack_from(f"<{2 * npts}d", data, pts_off)
    pts = [(flat[2 * i], flat[2 * i + 1]) for i in range(npts)]
    bounds = starts + [npts]
    parts = [pts[bounds[i]:bounds[i + 1]] for i in range(nparts)]
    return kind, has_z, parts


def parse_shp(data: bytes):
    """Whole-file parse (driver/test path). Returns (header, records):
    header = dict(shape_type, bbox); records = [(fid, kind, has_z,
    parts)] with fid the spec's 1-based record number."""
    if len(data) < 100:
        raise ValueError("truncated shapefile")
    (code,) = struct.unpack_from(">i", data, 0)
    if code != 9994:
        raise ValueError(f"bad shapefile file code {code} (want 9994)")
    (flen_words,) = struct.unpack_from(">i", data, 24)
    version, stype = struct.unpack_from("<2i", data, 28)
    if version != 1000:
        raise ValueError(f"bad shapefile version {version}")
    bbox = struct.unpack_from("<4d", data, 36)
    if flen_words * 2 != len(data):
        raise ValueError(f"file length mismatch: header says {flen_words * 2}, got {len(data)}")
    records = []
    pos = 100
    while pos < len(data):
        fid, clen_words = struct.unpack_from(">2i", data, pos)
        content = data[pos + 8:pos + 8 + clen_words * 2]
        kind, has_z, parts = _parse_record_content(content)
        records.append((fid, kind, has_z, parts))
        pos += 8 + clen_words * 2
    return {"shape_type": stype, "bbox": tuple(bbox)}, records


def parse_shx(data: bytes):
    """.shx -> [(fid, byte_offset, content_byte_length)] (1-based fids,
    offsets converted from the spec's 16-bit words; offset points at the
    8-byte record header)."""
    if len(data) < 100 or struct.unpack_from(">i", data, 0)[0] != 9994:
        raise ValueError("bad .shx")
    n = (len(data) - 100) // 8
    out = []
    for i in range(n):
        off_w, len_w = struct.unpack_from(">2i", data, 100 + 8 * i)
        out.append((i + 1, off_w * 2, len_w * 2))
    return out


def ring_is_hole(ring) -> bool:
    """Spec orientation rule: outer rings clockwise, holes counter-
    clockwise. Shoelace sum (x2-x1)(y2+y1): positive = clockwise in a
    y-up coordinate system = outer; negative = hole."""
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:]):
        s += (x2 - x1) * (y2 + y1)
    return s < 0.0


# --- .shp/.shx writers (export + test fixtures) ------------------------------


def _record_content(kind: str, parts) -> bytes:
    if kind == "point":
        (x, y) = parts[0][0]
        return struct.pack("<i2d", SHAPE_POINT, x, y)
    pts = [p for part in parts for p in part]
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    bbox = (min(xs), min(ys), max(xs), max(ys))
    if kind == "multipoint":
        return struct.pack(
            f"<i4di{2 * len(pts)}d", SHAPE_MULTIPOINT, *bbox, len(pts),
            *[c for p in pts for c in p],
        )
    stype = SHAPE_POLYGON if kind == "polygon" else SHAPE_POLYLINE
    starts = []
    acc = 0
    for part in parts:
        starts.append(acc)
        acc += len(part)
    return struct.pack(
        f"<i4d2i{len(parts)}i{2 * len(pts)}d", stype, *bbox,
        len(parts), len(pts), *starts, *[c for p in pts for c in p],
    )


def write_shp(records, shape_kind: str) -> tuple[bytes, bytes]:
    """records: [parts] per feature (fids assigned 1..N in order) ->
    (.shp bytes, .shx bytes). Orientation is the CALLER's contract
    (outer CW / holes CCW per spec); use ensure_orientation below."""
    stype = {"point": 1, "polyline": 3, "polygon": 5, "multipoint": 8}[shape_kind]
    contents = [_record_content(shape_kind, parts) for parts in records]
    all_pts = [p for parts in records for part in parts for p in part]
    if not all_pts:
        raise ValueError("empty shapefile")
    xs = [p[0] for p in all_pts]
    ys = [p[1] for p in all_pts]
    bbox = (min(xs), min(ys), max(xs), max(ys))
    body = b""
    shx_body = b""
    pos = 100
    for i, c in enumerate(contents):
        body += struct.pack(">2i", i + 1, len(c) // 2) + c
        shx_body += struct.pack(">2i", pos // 2, len(c) // 2)
        pos += 8 + len(c)

    def header(total_len: int) -> bytes:
        return (
            struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total_len // 2)
            + struct.pack("<2i", 1000, stype) + struct.pack("<4d", *bbox)
            + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
        )

    shp = header(100 + len(body)) + body
    shx = header(100 + len(shx_body)) + shx_body
    return shp, shx


def ensure_orientation(parts):
    """Flip rings so part 0 is outer-CW and later parts are hole-CCW —
    the writer-side convenience for the spec's orientation rule."""
    out = []
    for i, ring in enumerate(parts):
        hole = ring_is_hole(ring)
        want_hole = i > 0
        out.append(list(reversed(ring)) if hole != want_hole else list(ring))
    return out


# --- .dbf --------------------------------------------------------------------


def parse_dbf(data: bytes):
    """dBase III parse -> (fields, rows): fields = [(name, type, length,
    decimals)], rows = list of dicts with typed values (deleted records
    skipped). Fails loud on non-dBase-III version bytes."""
    if not data or data[0] not in (0x03, 0x83):
        raise ValueError(f"not a dBase III .dbf (version byte {data[0]:#x})")
    n_rec, hdr_size, rec_size = struct.unpack_from("<IHH", data, 4)
    fields = []
    pos = 32
    while data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        fdec = data[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    for i in range(n_rec):
        off = hdr_size + i * rec_size
        rec = data[off:off + rec_size]
        if rec[:1] == b"*":
            continue  # deleted
        row = {}
        fpos = 1
        for name, ftype, flen, fdec in fields:
            raw = rec[fpos:fpos + flen].decode("ascii", "replace")
            fpos += flen
            if ftype in ("C", "D"):
                row[name] = raw.strip() or None
            elif ftype in ("N", "F"):
                txt = raw.strip()
                if not txt:
                    row[name] = None
                elif ftype == "N" and fdec == 0:
                    row[name] = int(txt)
                else:
                    row[name] = float(txt)
            elif ftype == "L":
                row[name] = {"T": True, "Y": True, "F": False, "N": False}.get(
                    raw.strip().upper() or "?", None
                )
            else:
                raise NotImplementedError(f"dbf field type {ftype!r} not supported")
        rows.append(row)
    return fields, rows


def write_dbf(fields, rows) -> bytes:
    """fields: [(name, type, length, decimals)]; rows: list of dicts.
    Deterministic bytes (fixed 2026-01-01 update stamp)."""
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<B3BIHH", 0x03, 126, 1, 1, len(rows), hdr_size, rec_size)
    out += b"\x00" * 20
    for name, ftype, flen, fdec in fields:
        nm = name.encode("ascii")
        if len(nm) > 10:
            raise ValueError(f"dbf field name too long: {name}")
        out += nm.ljust(11, b"\x00") + ftype.encode("ascii") + b"\x00" * 4
        out += bytes([flen, fdec]) + b"\x00" * 14
    out += b"\x0d"
    for row in rows:
        out += b" "
        for name, ftype, flen, fdec in fields:
            v = row.get(name)
            if v is None:
                txt = ""
            elif ftype in ("N", "F"):
                txt = f"{v:.{fdec}f}" if fdec else str(int(v))
            elif ftype == "L":
                txt = "T" if v else "F"
            else:
                txt = str(v)
            enc = txt.encode("ascii")
            if len(enc) > flen:
                raise ValueError(f"value {txt!r} overflows {name}({flen})")
            out += enc.rjust(flen, b" ") if ftype in ("N", "F") else enc.ljust(flen, b" ")
    out += b"\x1a"
    return bytes(out)


def write_shapefile(path_base: str, shape_kind: str, records, fields=None, rows=None) -> str:
    """Write the .shp/.shx(/.dbf) triplet next to `path_base` (no
    extension). Returns the .shp path."""
    shp, shx = write_shp(records, shape_kind)
    with open(path_base + ".shp", "wb") as f:
        f.write(shp)
    with open(path_base + ".shx", "wb") as f:
        f.write(shx)
    if fields is not None:
        with open(path_base + ".dbf", "wb") as f:
            f.write(write_dbf(fields, rows or []))
    return path_base + ".shp"


# --- Spark integration --------------------------------------------------------

_GEO_SCHEMA = (
    "fid long, shape string, has_z boolean, part int, is_hole boolean, "
    "ring array<struct<lon:double,lat:double>>"
)


def read_shapefile(spark: SparkSession, shp_path: str) -> DataFrame:
    """Shapefile -> one row per geometry part: (fid, shape, has_z, part,
    is_hole, ring) joined with typed .dbf attribute columns when a .dbf
    sidecar exists. Record spans come from the .shx index on the driver
    (8 bytes per record); geometry bytes are pread + parsed EXECUTOR-side
    (mapInPandas), so the .shp payload never transits the driver."""
    import pandas as pd

    base = os.path.splitext(shp_path)[0]
    shx_path = base + ".shx"
    if not os.path.exists(shx_path):
        raise FileNotFoundError(f"{shx_path} missing — the record index is required "
                                "for the distributed read")
    with open(shx_path, "rb") as f:
        spans = parse_shx(f.read())
    spans_df = spark.createDataFrame(
        pd.DataFrame(spans, columns=["fid", "_off", "_len"]),
        "fid long, _off long, _len long",
    )

    def fetch(batches):
        with open(shp_path, "rb") as f:
            for b in batches:
                rows = []
                for fid, off, ln in zip(b["fid"], b["_off"], b["_len"]):
                    f.seek(int(off) + 8)  # skip the 8-byte record header
                    kind, has_z, parts = _parse_record_content(f.read(int(ln)))
                    for pi, ring in enumerate(parts):
                        rows.append((
                            int(fid), kind, has_z, pi,
                            kind == "polygon" and ring_is_hole(ring),
                            [{"lon": float(x), "lat": float(y)} for x, y in ring],
                        ))
                yield pd.DataFrame(
                    rows, columns=["fid", "shape", "has_z", "part", "is_hole", "ring"]
                )

    geo = spans_df.mapInPandas(fetch, _GEO_SCHEMA)
    dbf_path = base + ".dbf"
    if not os.path.exists(dbf_path):
        return geo
    with open(dbf_path, "rb") as f:
        fields, rows = parse_dbf(f.read())
    sql_type = {
        "C": "string", "D": "string", "L": "boolean",
    }
    cols, ddl = [], []
    for name, ftype, _l, fdec in fields:
        cols.append(name)
        if ftype in ("N", "F"):
            ddl.append(f"{name} {'bigint' if ftype == 'N' and fdec == 0 else 'double'}")
        else:
            ddl.append(f"{name} {sql_type[ftype]}")
    attrs = spark.createDataFrame(
        [tuple([i + 1] + [r.get(c) for c in cols]) for i, r in enumerate(rows)],
        "fid long, " + ", ".join(ddl),
    )
    return geo.join(attrs, "fid", "left")


def shapefile_polygons_df(spark: SparkSession, shp_path: str) -> DataFrame:
    """Collapse a polygon shapefile to the (poly_id, ring) shape that
    pip_join / apply_cutline consume (even-odd semantics: holes are just
    extra rings of the same poly_id) — the third vector input driver
    beside WKT and GeoJSON."""
    geo = read_shapefile(spark, shp_path)
    from pyspark.sql import functions as F

    return geo.filter(F.col("shape") == "polygon").select(
        F.col("fid").cast("string").alias("poly_id"), "ring"
    )
