"""Chart-georeferencing parsers + GCP affine fit — the map2gdal role
(SURVEY.md §2.1 rows 7-9, §2.2 row 13; M8).

The engine's primary georef is the deterministic §1.5 derivation; these
parsers exist for parity with the reference's reader backends: given a row
carrying an OziExplorer `.map` or BSB/KAP header as text/bytes, extract
GCPs (pixel -> lon/lat) and the border polygon, and fit a least-squares
affine in EPSG:3857 (the gdal_translate -gcp + gdalwarp role).

Formats are published de-facto standards [R]/[SPEC-adjacent]; the reference
checkout is absent (SURVEY.md §0.1), so field layouts follow the public
format docs and are unit-tested on synthetic headers.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from . import tilemath as tm

# ---------------------------------------------------------------------------
# OziExplorer .map
# ---------------------------------------------------------------------------


def _dms(deg: str, minutes: str, hemi: str) -> float:
    v = float(deg) + float(minutes) / 60.0
    return -v if hemi.strip().upper() in ("S", "W") else v


def parse_ozi_map(text: str) -> dict:
    """Parse Point01.., MMPXY, MMPLL lines -> {gcps, border_xy, border_ll}.

    gcps: list of (px, py, lon, lat). border_xy: pixel-space ring;
    border_ll: lon/lat ring.
    """
    gcps = []
    border_xy = []
    border_ll = []
    for line in text.splitlines():
        parts = [p.strip() for p in line.split(",")]
        if not parts:
            continue
        if re.match(r"^Point\d+$", parts[0] or "") and len(parts) >= 17:
            if parts[2] == "" or parts[3] == "" or parts[6] == "":
                continue  # unused point slot
            px, py = float(parts[2]), float(parts[3])
            lat = _dms(parts[6], parts[7], parts[8])
            lon = _dms(parts[9], parts[10], parts[11])
            gcps.append((px, py, lon, lat))
        elif parts[0] == "MMPXY" and len(parts) >= 4:
            border_xy.append((float(parts[2]), float(parts[3])))
        elif parts[0] == "MMPLL" and len(parts) >= 4:
            border_ll.append((float(parts[2]), float(parts[3])))
    return {"gcps": gcps, "border_xy": border_xy, "border_ll": border_ll}


# ---------------------------------------------------------------------------
# BSB / KAP header
# ---------------------------------------------------------------------------


def parse_kap_header(data: bytes) -> dict:
    """Parse the text header of a BSB/KAP chart (up to the 0x1A control
    byte): REF/ GCPs and PLY/ border."""
    end = data.find(b"\x1a")
    text = data[: end if end >= 0 else len(data)].decode("ascii", "replace")
    # join continuation lines (leading whitespace)
    lines = []
    for raw in text.splitlines():
        if raw[:1].isspace() and lines:
            lines[-1] += raw.strip()
        else:
            lines.append(raw.strip())
    gcps = []
    border_ll = []
    name = None
    for line in lines:
        if line.startswith("REF/"):
            f = line[4:].split(",")
            if len(f) >= 5:
                # REF/n,px,py,lat,lon
                gcps.append((float(f[1]), float(f[2]), float(f[4]), float(f[3])))
        elif line.startswith("PLY/"):
            f = line[4:].split(",")
            if len(f) >= 3:
                border_ll.append((float(f[2]), float(f[1])))  # PLY/n,lat,lon
        elif line.startswith("BSB/"):
            m = re.search(r"NA=([^,]+)", line)
            name = m.group(1) if m else None
    return {"gcps": gcps, "border_ll": border_ll, "name": name}


# ---------------------------------------------------------------------------
# GEO/NOS sidecar (.geo text header for NOS charts) — SURVEY.md §2.1 row 9
# ---------------------------------------------------------------------------


def parse_geo_nos(text: str) -> dict:
    """Parse a Maptech/SoftChart `.geo` sidecar (the GEO/NOS pair):
    `PointNN=px,py,lat,lon` GCP lines, `VertexNN=lat,lon` border lines,
    `Name=`/`Bitmap=` metadata. Field order follows the public de-facto
    format docs; flagged [R]-low-confidence like the Ozi/KAP layouts
    (reference checkout absent — SURVEY.md §0.1)."""
    gcps = []
    border_ll = []
    name = None
    bitmap = None
    for line in text.splitlines():
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip()
        parts = [p.strip() for p in val.split(",")]
        if re.match(r"^Point\d+$", key) and len(parts) >= 4:
            px, py, lat, lon = (float(p) for p in parts[:4])
            gcps.append((px, py, lon, lat))
        elif re.match(r"^Vertex\d+$", key) and len(parts) >= 2:
            border_ll.append((float(parts[1]), float(parts[0])))  # -> (lon, lat)
        elif key == "Name":
            name = val.strip()
        elif key == "Bitmap":
            bitmap = val.strip()
    return {"gcps": gcps, "border_ll": border_ll, "name": name, "bitmap": bitmap}


# ---------------------------------------------------------------------------
# KML GroundOverlay (SURVEY.md §2.1 row 9) — published OGC KML [SPEC]
# ---------------------------------------------------------------------------


def parse_kml_overlay(text: str) -> dict:
    """Parse the first <GroundOverlay> of a KML document: LatLonBox
    north/south/east/west (+ optional rotation, must be ~0 for the
    north-up render path), Icon href, name."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)

    def local(tag):
        return tag.rsplit("}", 1)[-1]

    overlay = None
    for el in root.iter():
        if local(el.tag) == "GroundOverlay":
            overlay = el
            break
    if overlay is None:
        raise ValueError("no GroundOverlay element")
    out = {"name": None, "href": None, "rotation": 0.0}
    for el in overlay.iter():
        t = local(el.tag)
        if t == "name":
            out["name"] = (el.text or "").strip()
        elif t == "href":
            out["href"] = (el.text or "").strip()
        elif t in ("north", "south", "east", "west", "rotation"):
            out[t] = float((el.text or "0").strip())
    for side in ("north", "south", "east", "west"):
        if side not in out:
            raise ValueError(f"LatLonBox missing {side}")
    return out


def kml_overlay_to_georef(d: dict, w: int, h: int, tol: float = 0.01) -> dict:
    """LatLonBox -> engine georef dict (SURVEY.md §1.5 shape). The render
    path assumes square pixels and north-up: rotation must be ~0 and the
    per-axis gsds within `tol` relative difference."""
    if abs(d.get("rotation", 0.0)) > 1e-9:
        raise ValueError("rotated GroundOverlay not supported by the north-up render path")
    mx0, my1 = (float(v[0]) for v in tm.merc_np(np.array([d["west"]]), np.array([d["north"]])))
    mx1, my0 = (float(v[0]) for v in tm.merc_np(np.array([d["east"]]), np.array([d["south"]])))
    gsd_x = (mx1 - mx0) / w
    gsd_y = (my1 - my0) / h
    if abs(gsd_x - gsd_y) > tol * max(abs(gsd_x), abs(gsd_y)):
        raise ValueError(f"non-square pixels: gsd_x={gsd_x:.3f} gsd_y={gsd_y:.3f}")
    gsd = (gsd_x + gsd_y) / 2.0
    return {"gsd": gsd, "mx0": mx0, "my1": my1, "mx1": mx0 + gsd * w, "my0": my1 - gsd * h}


# ---------------------------------------------------------------------------
# GCP -> affine least squares (gdal_translate -gcp analog, row 13)
# ---------------------------------------------------------------------------


def fit_affine_3857(gcps) -> np.ndarray:
    """>=3 GCPs (px, py, lon, lat) -> affine A (2x3) with
    [mx, my]^T = A @ [px, py, 1]^T in EPSG:3857 meters (np.linalg.lstsq).
    """
    g = np.asarray(gcps, dtype=np.float64)
    if g.shape[0] < 3:
        raise ValueError("need >= 3 GCPs for an affine fit")
    mx, my = tm.merc_np(g[:, 2], g[:, 3])
    X = np.column_stack([g[:, 0], g[:, 1], np.ones(len(g))])
    ax, *_ = np.linalg.lstsq(X, mx, rcond=None)
    ay, *_ = np.linalg.lstsq(X, my, rcond=None)
    return np.vstack([ax, ay])


def fit_poly2_3857(gcps) -> np.ndarray:
    """>=6 GCPs (px, py, lon, lat) -> order-2 polynomial P (2x6) with
    [mx, my]^T = P @ [1, px, py, px^2, px*py, py^2]^T in EPSG:3857 meters
    (the gdal_translate/gdalwarp `-order 2` analog; least squares)."""
    g = np.asarray(gcps, dtype=np.float64)
    if g.shape[0] < 6:
        raise ValueError("need >= 6 GCPs for an order-2 polynomial fit")
    mx, my = tm.merc_np(g[:, 2], g[:, 3])
    px, py = g[:, 0], g[:, 1]
    X = np.column_stack([np.ones(len(g)), px, py, px * px, px * py, py * py])
    cx, *_ = np.linalg.lstsq(X, mx, rcond=None)
    cy, *_ = np.linalg.lstsq(X, my, rcond=None)
    return np.vstack([cx, cy])


def apply_poly2(P: np.ndarray, px, py):
    """Evaluate the order-2 polynomial at pixel coords (vectorized)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    X = np.stack([np.ones_like(px), px, py, px * px, px * py, py * py])
    return P[0] @ X, P[1] @ X


def affine_to_georef(A: np.ndarray, w: int, h: int) -> dict:
    """North-up affine -> the engine georef dict (SURVEY.md §1.5 shape).
    Requires negligible rotation terms (|offdiag| << diag)."""
    gsd_x = A[0, 0]
    gsd_y = -A[1, 1]
    if not (abs(A[0, 1]) < 1e-6 * abs(gsd_x) and abs(A[1, 0]) < 1e-6 * abs(gsd_y)):
        raise ValueError("rotated affine not supported by the north-up render path")
    # GCPs use corner-based pixel coords (Ozi/KAP convention), so the
    # affine translation IS the top-left corner in meters
    mx0 = A[0, 2]
    my1 = A[1, 2]
    gsd = (abs(gsd_x) + abs(gsd_y)) / 2.0
    return {
        "gsd": gsd,
        "mx0": mx0,
        "my1": my1,
        "mx1": mx0 + gsd * w,
        "my0": my1 - gsd * h,
    }


def parse_world_file(text: str) -> np.ndarray:
    """ESRI/GDAL world file (.wld/.tfw/.pgw/.jgw — the 'png+world' input
    driver of SURVEY.md §2.1 row 1) -> 2x3 north-up affine in the engine's
    CORNER convention.

    Published 6-line format [SPEC]: A (x pixel size), D (y rotation),
    B (x rotation), E (y pixel size, negative for north-up), C, F
    (map coordinates of the CENTER of the upper-left pixel). The engine's
    georef uses the UL corner, so the translation is shifted back half a
    pixel step: corner = (C - (A+B)/2, F - (D+E)/2).

    Fail-loud contract (same policy as the GeoTIFF CRS gate): rotation
    terms (B, D) must be zero and pixels square (|E| == A within 1e-9
    relative) — a rotated or anisotropic world file cannot enter the
    north-up render path and raises instead of mis-tiling silently.
    """
    vals = [float(v) for v in text.split()]
    if len(vals) != 6:
        raise ValueError(f"world file needs exactly 6 numbers, got {len(vals)}")
    a, d, b, e, c, f = vals
    if b != 0.0 or d != 0.0:
        raise ValueError("rotated world file not supported by the north-up render path")
    if not (a > 0.0 and e < 0.0):
        raise ValueError("world file not north-up (need A > 0, E < 0)")
    if abs(abs(e) - a) > 1e-9 * a:
        raise ValueError("anisotropic pixels not supported (|E| must equal A)")
    return np.array([[a, b, c - (a + b) / 2.0], [d, e, f - (d + e) / 2.0]], np.float64)


# Web-Mercator recognition for sidecar .prj / srs text: a world file carries
# no CRS, so the companion .prj (or an explicit 'EPSG:3857' tag) must
# declare EPSG:3857 before the georef may enter the north-up contract —
# the same auditable-NaN policy as the GeoTIFF GeoKey gate (ADVICE r4).
_PRJ_3857 = re.compile(
    r"""(?:\bEPSG[:"',\s]*3857\b|Web[_ ]?Mercator|Pseudo[_ -]?Mercator)""",
    re.IGNORECASE,
)


def prj_is_web_mercator(prj: str | None) -> bool:
    """True iff the sidecar .prj WKT / srs string declares EPSG:3857
    (authority code, or the published names 'Web Mercator' /
    'Pseudo-Mercator'). Missing/empty -> False: an un-declared CRS never
    enters the mercator render contract."""
    return bool(prj) and bool(_PRJ_3857.search(prj))


def parse_world_udf():
    """pandas UDF factory: (world_text, prj_text, w, h) -> georef struct.
    Arrow-batched; any parse failure, rotation, anisotropy, or
    non-EPSG:3857 .prj yields the auditable NaN row (policy identical to
    parse_georef_udf)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("gsd", DoubleType()),
            StructField("mx0", DoubleType()),
            StructField("my0", DoubleType()),
            StructField("mx1", DoubleType()),
            StructField("my1", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(
        world: pd.Series, prj: pd.Series, w: pd.Series, h: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for wt, pt, ww, hh in zip(world, prj, w, h):
            try:
                if not prj_is_web_mercator(pt):
                    raise ValueError(
                        "world file without an EPSG:3857 .prj; reproject "
                        "upstream (out of engine scope)"
                    )
                A = parse_world_file(wt)
                g = affine_to_georef(A, int(ww), int(hh))
                rows.append((g["gsd"], g["mx0"], g["my0"], g["mx1"], g["my1"]))
            except Exception:
                rows.append((float("nan"),) * 5)
        return pd.DataFrame(rows, columns=["gsd", "mx0", "my0", "mx1", "my1"])

    return udf


def parse_georef_udf(kind: str = "ozi"):
    """pandas UDF factory: text/bytes column -> georef struct columns.
    Arrow-batched (BASELINE.json:15), one parse per row inside the batch.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        [
            StructField("gsd", DoubleType()),
            StructField("mx0", DoubleType()),
            StructField("my0", DoubleType()),
            StructField("mx1", DoubleType()),
            StructField("my1", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(header: pd.Series, w: pd.Series, h: pd.Series) -> pd.DataFrame:
        rows = []
        for hd, ww, hh in zip(header, w, h):
            try:
                if kind == "kml":
                    g = kml_overlay_to_georef(parse_kml_overlay(hd), int(ww), int(hh))
                elif kind == "geotiff":
                    from . import tiffcodec

                    # tags-only parse: never decompress pixel strips just
                    # to read four georef tags (a multi-hundred-MB LZW
                    # chart would cost minutes per row otherwise)
                    g = tiffcodec.read_tiff_tags(bytes(hd))["geo"]
                    if g is None:
                        raise ValueError("TIFF without GeoTIFF tags")
                    # CRS gate: the engine's north-up render contract
                    # takes model coordinates as EPSG:3857 METERS. A
                    # GeoTIFF in EPSG:4326 (degrees) or UTM (zone meters)
                    # — both common GDAL outputs — would otherwise be
                    # silently mis-tiled; reprojection is out of scope
                    # (gdalwarp upstream), so any other / missing CRS key
                    # becomes an auditable NaN row, same as a parse fail.
                    if g.get("epsg") != 3857:
                        raise ValueError(
                            f"GeoTIFF CRS EPSG:{g.get('epsg')} is not EPSG:3857; "
                            "reproject upstream (out of engine scope)"
                        )
                else:
                    if kind == "ozi":
                        parsed = parse_ozi_map(hd)
                    elif kind == "geo":
                        parsed = parse_geo_nos(hd)
                    else:
                        parsed = parse_kap_header(bytes(hd))
                    A = fit_affine_3857(parsed["gcps"])
                    g = affine_to_georef(A, int(ww), int(hh))
                rows.append((g["gsd"], g["mx0"], g["my0"], g["mx1"], g["my1"]))
            except Exception:
                rows.append((float("nan"),) * 5)
        return pd.DataFrame(rows, columns=["gsd", "mx0", "my0", "mx1", "my1"])

    return udf


def tiff_dims_udf():
    """pandas UDF factory: TIFF bytes -> (w, h) ints from a tags-only
    parse (no strip decode); (-1, -1) for unparseable rows so failures
    stay auditable like the NaN-georef convention."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([StructField("w", IntegerType()), StructField("h", IntegerType())])

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.DataFrame:
        from . import tiffcodec

        rows = []
        for b in blobs:
            try:
                t = tiffcodec.read_tiff_tags(bytes(b))
                rows.append((int(t["w"]), int(t["h"])))
            except Exception:
                rows.append((-1, -1))
        return pd.DataFrame(rows, columns=["w", "h"])

    return udf


# ---------------------------------------------------------------------------
# WKT polygons (published OGC Simple Features well-known text [SPEC]) —
# input-format widening for the PIP/cutline polygon side
# ---------------------------------------------------------------------------

_WKT_RING = re.compile(r"\(([^()]+)\)")


def parse_wkt_polygon(wkt: str) -> list[list[tuple[float, float]]]:
    """POLYGON/MULTIPOLYGON WKT -> list of rings, each an OPEN vertex list
    of (x, y) i.e. (lon, lat) tuples (the WKT-mandated closing vertex —
    first == last — is dropped to match the engine's open-ring
    convention; spatial.pip_join treats extra rings of one poly_id as
    holes via even-odd). MULTIPOLYGON rings are flattened: even-odd
    containment over the flattened set equals per-part containment for
    disjoint parts."""
    head = wkt.strip().upper()
    if not (head.startswith("POLYGON") or head.startswith("MULTIPOLYGON")):
        raise ValueError(f"not a POLYGON/MULTIPOLYGON WKT: {wkt[:40]!r}")
    rings = []
    for body in _WKT_RING.findall(wkt):
        verts = []
        for pair in body.split(","):
            parts = pair.split()
            if len(parts) < 2:
                raise ValueError(f"bad WKT coordinate {pair!r}")
            verts.append((float(parts[0]), float(parts[1])))
        if len(verts) >= 2 and verts[0] == verts[-1]:
            verts = verts[:-1]
        if len(verts) < 3:
            raise ValueError("WKT ring with fewer than 3 distinct vertices")
        rings.append(verts)
    if not rings:
        raise ValueError("WKT polygon with no rings")
    return rings


def parse_geojson_polygon(geom: dict) -> list[list[tuple[float, float]]]:
    """GeoJSON Polygon/MultiPolygon geometry (RFC 7946 [SPEC]) -> the same
    open-ring list shape as `parse_wkt_polygon` (closing vertex dropped;
    MULTI parts flattened — even-odd containment over the flattened set
    equals per-part containment for disjoint parts; holes = extra rings)."""
    t = geom.get("type")
    if t == "Polygon":
        polys = [geom["coordinates"]]
    elif t == "MultiPolygon":
        polys = geom["coordinates"]
    else:
        raise ValueError(f"not a Polygon/MultiPolygon geometry: {t!r}")
    rings = []
    for poly in polys:
        for ring in poly:
            verts = [(float(p[0]), float(p[1])) for p in ring]
            if len(verts) >= 2 and verts[0] == verts[-1]:
                verts = verts[:-1]
            if len(verts) < 3:
                raise ValueError("GeoJSON ring with fewer than 3 distinct vertices")
            rings.append(verts)
    if not rings:
        raise ValueError("GeoJSON polygon with no rings")
    return rings


def parse_geojson_features(text: str) -> list[tuple[str, list]]:
    """GeoJSON document text -> [(feature_id, rings)]. Accepts a
    FeatureCollection, a single Feature, or a bare geometry; feature ids
    come from `id`, then `properties.id` / `properties.name`, else the
    0-based index. Non-polygon geometries are skipped (gdaltindex-style
    warn-and-skip is the caller's log line)."""
    import json as _json

    doc = _json.loads(text)
    t = doc.get("type")
    if t == "FeatureCollection":
        feats = doc.get("features", [])
    elif t == "Feature":
        feats = [doc]
    else:
        return [("0", parse_geojson_polygon(doc))]
    out = []
    seen: set = set()
    for i, f in enumerate(feats):
        geom = f.get("geometry") or {}
        if geom.get("type") not in ("Polygon", "MultiPolygon"):
            continue
        props = f.get("properties") or {}
        fid = str(f.get("id", props.get("id", props.get("name", i))))
        # ids must stay unique: two features collapsing into one poly_id
        # would make pip_join's even-odd rule read one polygon as a hole
        # in the other — suffix duplicates with the feature index
        if fid in seen:
            fid = f"{fid}#{i}"
        seen.add(fid)
        out.append((fid, parse_geojson_polygon(geom)))
    return out


def tiff_decode_stats_udf():
    """pandas UDF factory: TIFF bytes -> full-decode stats (w, h, bands,
    pix_sum = sum of every uint8 sample AFTER decode — tiled or strip
    organization, 16-bit inputs through the documented round(v/257)
    scaling). Unlike tiff_dims_udf this DOES decompress pixel data; it is
    the driver-gate probe for the tiled/16-bit decode paths
    (a wrong tile seam, predictor restart, or scaling rule moves the
    sum). (-1, -1, -1, -1) for unparseable rows (NaN-row convention)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("bands", IntegerType()),
            StructField("pix_sum", LongType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(blobs: pd.Series) -> pd.DataFrame:
        import numpy as np

        from . import tiffcodec

        rows = []
        for b in blobs:
            try:
                arr, _geo = tiffcodec.decode_tiff(bytes(b))
                h, w = arr.shape[:2]
                bands = 1 if arr.ndim == 2 else arr.shape[2]
                rows.append((int(w), int(h), int(bands), int(np.sum(arr, dtype=np.int64))))
            except Exception:
                rows.append((-1, -1, -1, -1))
        return pd.DataFrame(rows, columns=["w", "h", "bands", "pix_sum"])

    return udf
