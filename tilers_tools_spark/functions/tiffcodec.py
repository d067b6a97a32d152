"""Minimal baseline TIFF 6.0 + GeoTIFF 1.1 codec (pure NumPy, [SPEC]).

The reference's primary raster input is GeoTIFF (gdal_tiler reads it via
GDAL; SURVEY.md §2.3 row 1-2). No imaging libs exist offline, so this
implements the published subset the tiling pipeline needs:

* reader: both byte orders, baseline uint8 gray/RGB/RGBA, Compression=1
  (none), strip-organized (any RowsPerStrip), PlanarConfiguration=1;
  GeoTIFF georef via ModelPixelScaleTag (33550) + ModelTiepointTag
  (33922) + GeoKeyDirectoryTag (34735: model type + projected CRS key).
* writer: little-endian, single-strip uncompressed, optional GeoTIFF
  tags — used by fixtures/tests; the reader is also pinned against
  HANDCRAFTED tag bytes (tests/test_tiffcodec.py) so a shared
  writer/reader bug cannot hide.

Out of scope (documented, like WebP): LZW/Deflate/JPEG-in-TIFF
compression, tiled organization, BigTIFF, >8-bit samples — all raise
with explicit messages rather than mis-decoding.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF field types -> (struct fmt char, byte size)
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 12: ("d", 8)}

TAG_WIDTH = 256
TAG_LENGTH = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_GEO_KEYS = 34735

_GT_MODEL_TYPE = 1024  # 1 = projected, 2 = geographic
_PROJECTED_CS = 3072  # EPSG code of the projected CRS
_GEOGRAPHIC_CS = 2048


def _read_values(data: bytes, bo: str, ftype: int, count: int, raw: bytes):
    fmt, size = _TYPES[ftype]
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = data[off : off + total]
    return list(struct.unpack(bo + fmt * count, buf))


def decode_tiff(data: bytes):
    """TIFF bytes -> (uint8 array (H,W) or (H,W,C), georef dict | None).

    georef (when GeoTIFF tags are present): {"gsd", "mx0", "my0", "mx1",
    "my1", "epsg"} — the north-up affine of the engine's render contract
    (tiepoint maps raster (0,0) to the model-space TOP-left; my0 < my1).
    """
    if len(data) < 8:
        raise ValueError("not a TIFF: too short")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic == 43:
        raise NotImplementedError("BigTIFF not supported")
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")
    (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n_entries):
        e = data[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        tag, ftype, count = struct.unpack(bo + "HHI", e[:8])
        if ftype in _TYPES:
            tags[tag] = _read_values(data, bo, ftype, count, e[8:12])

    w = int(tags[TAG_WIDTH][0])
    h = int(tags[TAG_LENGTH][0])
    comp = int(tags.get(TAG_COMPRESSION, [1])[0])
    if comp != 1:
        raise NotImplementedError(f"TIFF compression {comp} not supported (only 1=none)")
    spp = int(tags.get(TAG_SPP, [1])[0])
    bits = tags.get(TAG_BITS, [8] * spp)
    if any(int(b) != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit samples supported, got {bits}")
    if int(tags.get(TAG_PLANAR, [1])[0]) != 1:
        raise NotImplementedError("planar (separated) TIFF not supported")
    offsets = [int(v) for v in tags[TAG_STRIP_OFFSETS]]
    counts = [int(v) for v in tags[TAG_STRIP_COUNTS]]
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    need = w * h * spp
    if len(raw) < need:
        raise ValueError(f"TIFF strips truncated: {len(raw)} < {need}")
    arr = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(
        (h, w) if spp == 1 else (h, w, spp)
    )

    geo = None
    if TAG_MODEL_PIXEL_SCALE in tags and TAG_MODEL_TIEPOINT in tags:
        sx, sy = float(tags[TAG_MODEL_PIXEL_SCALE][0]), float(tags[TAG_MODEL_PIXEL_SCALE][1])
        tp = tags[TAG_MODEL_TIEPOINT]
        # (i, j, k, x, y, z): raster (i,j) -> model (x,y); top-left anchor
        i0, j0, _k, x0, y0 = (float(v) for v in tp[:5])
        mx0 = x0 - i0 * sx
        my1 = y0 + j0 * sy  # model y of the raster TOP edge
        epsg = None
        if TAG_GEO_KEYS in tags:
            gk = [int(v) for v in tags[TAG_GEO_KEYS]]
            # directory: (version, rev, minor, nkeys) then nkeys * (key,
            # location, count, value) with location 0 = inline value
            for k in range(4, len(gk) - 3, 4):
                key, loc, _cnt, val = gk[k : k + 4]
                if key in (_PROJECTED_CS, _GEOGRAPHIC_CS) and loc == 0:
                    epsg = val
        geo = {
            "gsd": sx,
            "mx0": mx0,
            "my0": my1 - h * sy,
            "mx1": mx0 + w * sx,
            "my1": my1,
            "epsg": epsg,
        }
    return arr, geo


def encode_tiff(arr: np.ndarray, geo: dict | None = None) -> bytes:
    """uint8 (H,W)/(H,W,3)/(H,W,4) -> little-endian single-strip
    uncompressed TIFF; `geo` = {"gsd", "mx0", "my1", ["epsg"]} adds
    GeoTIFF tags (pixel-scale, top-left tiepoint, projected-CRS geokey).
    Deterministic bytes (fixed tag order/layout)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported band count {c}")
    photometric = 1 if c == 1 else 2
    pixels = arr.tobytes()

    entries = []  # (tag, type, count, values)
    extra = b""  # out-of-line values, appended after the IFD
    bo = "<"

    def add(tag, ftype, values):
        entries.append((tag, ftype, values))

    add(TAG_WIDTH, 4, [w])
    add(TAG_LENGTH, 4, [h])
    add(TAG_BITS, 3, [8] * c)
    add(TAG_COMPRESSION, 3, [1])
    add(TAG_PHOTOMETRIC, 3, [photometric])
    add(TAG_STRIP_OFFSETS, 4, [0])  # patched below
    add(TAG_SPP, 3, [c])
    add(TAG_ROWS_PER_STRIP, 4, [h])
    add(TAG_STRIP_COUNTS, 4, [len(pixels)])
    add(TAG_PLANAR, 3, [1])
    if geo is not None:
        add(TAG_MODEL_PIXEL_SCALE, 12, [float(geo["gsd"]), float(geo["gsd"]), 0.0])
        add(TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, float(geo["mx0"]), float(geo["my1"]), 0.0])
        epsg = int(geo.get("epsg") or 3857)
        add(TAG_GEO_KEYS, 3, [1, 1, 0, 2, _GT_MODEL_TYPE, 0, 1, 1, _PROJECTED_CS, 0, 1, epsg])

    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4  # extra values start here
    out_entries = b""
    for tag, ftype, values in entries:
        fmt, size = _TYPES[ftype]
        total = size * len(values)
        if tag == TAG_STRIP_OFFSETS:
            values = [0xDEADBEEF]  # placeholder, patched after layout
        packed = struct.pack(bo + fmt * len(values), *values)
        if total <= 4:
            raw = packed.ljust(4, b"\0")
        else:
            raw = struct.pack(bo + "I", data_off + len(extra))
            extra += packed
        out_entries += struct.pack(bo + "HHI", tag, ftype, len(values)) + raw
    strip_off = data_off + len(extra)
    # patch StripOffsets (find its entry position by tag order)
    buf = bytearray(
        struct.pack(bo + "2sHI", b"II", 42, ifd_off)
        + struct.pack(bo + "H", n)
        + out_entries
        + struct.pack(bo + "I", 0)
        + extra
        + pixels
    )
    for i, (tag, ftype, values) in enumerate(entries):
        if tag == TAG_STRIP_OFFSETS:
            pos = ifd_off + 2 + 12 * i + 8
            buf[pos : pos + 4] = struct.pack(bo + "I", strip_off)
    return bytes(buf)
