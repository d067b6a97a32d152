"""Minimal baseline TIFF 6.0 + GeoTIFF 1.1 codec (pure NumPy, [SPEC]).

The reference's primary raster input is GeoTIFF (gdal_tiler reads it via
GDAL; SURVEY.md §2.3 row 1-2). No imaging libs exist offline, so this
implements the published subset the tiling pipeline needs:

* reader: both byte orders, baseline uint8 gray (BlackIsZero AND
  WhiteIsZero), RGB, RGBA, palette (ColorMap expanded to RGB like the
  PNG PLTE path), strip-organized (any RowsPerStrip),
  PlanarConfiguration=1;
  compression none(1)/LZW(5)/Deflate(8, 32946)/PackBits(32773) with
  horizontal Predictor(317)=2 — the combinations GDAL-written GeoTIFFs
  actually use; GeoTIFF georef via ModelPixelScaleTag (33550) +
  ModelTiepointTag (33922) + GeoKeyDirectoryTag (34735: model type +
  projected CRS key).
* writer: little-endian, single-strip, compression none or deflate,
  optional GeoTIFF tags — used by fixtures/tests; the reader is also
  pinned against HANDCRAFTED tag bytes (tests/test_tiffcodec.py) so a
  shared writer/reader bug cannot hide.

Out of scope (documented, like WebP): JPEG-in-TIFF, tiled organization,
BigTIFF, >8-bit samples, floating predictor — all raise with explicit
messages rather than mis-decoding.
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
TAG_COLOR_MAP = 320
TAG_MODEL_PIXEL_SCALE = 33550
TAG_MODEL_TIEPOINT = 33922
TAG_GEO_KEYS = 34735

_GT_MODEL_TYPE = 1024  # 1 = projected, 2 = geographic
_PROJECTED_CS = 3072  # EPSG code of the projected CRS
_GEOGRAPHIC_CS = 2048


TAG_PREDICTOR = 317


def _unpackbits(src: bytes) -> bytes:
    """Apple PackBits RLE (TIFF spec §9): n in 0..127 -> copy n+1 literal
    bytes; n in -127..-1 -> repeat next byte 1-n times; -128 no-op."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        i += 1
        if c < 128:
            out += src[i : i + c + 1]
            i += c + 1
        elif c > 128:
            out += src[i : i + 1] * (257 - c)
            i += 1
        # c == 128: no-op
    return bytes(out)


def _unlzw(src: bytes) -> bytes:
    """TIFF-variant LZW decode (TIFF spec §13): MSB-first bit packing,
    9->12-bit codes, ClearCode=256, EOI=257, table grows at entry
    4094 ('early change')."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    bitbuf = 0
    bitcnt = 0
    width = 9
    prev: bytes | None = None
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(src)
    while True:
        while bitcnt < width:
            if pos >= n:
                return bytes(out)  # truncated stream: return what we have
            bitbuf = (bitbuf << 8) | src[pos]
            pos += 1
            bitcnt += 8
        code = (bitbuf >> (bitcnt - width)) & ((1 << width) - 1)
        bitcnt -= width
        if code == CLEAR:
            reset()
            continue
        if code == EOI:
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        # 'early change' (TIFF spec §13): the encoder inserts its table
        # entry IMMEDIATELY after emitting, so its table runs one entry
        # ahead of ours — widen when OUR table is one short of the limit,
        # i.e. one code earlier than generic LZW
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _decompress_strip(raw: bytes, comp: int) -> bytes:
    if comp == 1:
        return raw
    if comp in (8, 32946):  # Deflate (Adobe) / Deflate (old code)
        import zlib

        return zlib.decompress(raw)
    if comp == 32773:
        return _unpackbits(raw)
    if comp == 5:
        return _unlzw(raw)
    raise NotImplementedError(
        f"TIFF compression {comp} not supported (1=none, 5=LZW, 8/32946=deflate, 32773=packbits)"
    )


def _read_values(data: bytes, bo: str, ftype: int, count: int, raw: bytes):
    fmt, size = _TYPES[ftype]
    total = size * count
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + "I", raw)
        buf = data[off : off + total]
    return list(struct.unpack(bo + fmt * count, buf))


def _parse_ifd(data: bytes) -> tuple[dict[int, list], str]:
    """Header + first IFD -> ({tag: values}, byte-order char). Cheap:
    touches only the directory and out-of-line tag values, never strips."""
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
    return tags, bo


def _georef_from_tags(tags: dict[int, list], h: int) -> dict | None:
    if TAG_MODEL_PIXEL_SCALE not in tags or TAG_MODEL_TIEPOINT not in tags:
        return None
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
    w = int(tags[TAG_WIDTH][0])
    return {
        "gsd": sx,
        "mx0": mx0,
        "my0": my1 - h * sy,
        "mx1": mx0 + w * sx,
        "my1": my1,
        "epsg": epsg,
    }


def read_tiff_tags(data: bytes) -> dict:
    """Tags-only parse: {"w", "h", "geo": georef-dict-or-None} WITHOUT
    touching (or decompressing) any pixel strip — the right call for
    georef/dimension extraction over large charts (map2gdal), where
    decoding a multi-hundred-MB LZW raster just to read four tags would
    waste minutes per file."""
    tags, _bo = _parse_ifd(data)
    w = int(tags[TAG_WIDTH][0])
    h = int(tags[TAG_LENGTH][0])
    return {"w": w, "h": h, "geo": _georef_from_tags(tags, h)}


def decode_tiff(data: bytes):
    """TIFF bytes -> (uint8 array (H,W) or (H,W,C), georef dict | None).

    georef (when GeoTIFF tags are present): {"gsd", "mx0", "my0", "mx1",
    "my1", "epsg"} — the north-up affine of the engine's render contract
    (tiepoint maps raster (0,0) to the model-space TOP-left; my0 < my1).
    """
    tags, _bo = _parse_ifd(data)
    w = int(tags[TAG_WIDTH][0])
    h = int(tags[TAG_LENGTH][0])
    comp = int(tags.get(TAG_COMPRESSION, [1])[0])
    spp = int(tags.get(TAG_SPP, [1])[0])
    bits = tags.get(TAG_BITS, [8] * spp)
    if any(int(b) != 8 for b in bits):
        raise NotImplementedError(f"only 8-bit samples supported, got {bits}")
    if int(tags.get(TAG_PLANAR, [1])[0]) != 1:
        raise NotImplementedError("planar (separated) TIFF not supported")
    photometric = int(tags.get(TAG_PHOTOMETRIC, [1])[0])
    if photometric not in (0, 1, 2, 3):
        # 5=CMYK, 6=YCbCr, ... — mis-decoding as gray/RGB would be silent
        raise NotImplementedError(f"TIFF photometric {photometric} not supported (0/1/2/3)")
    if photometric == 3 and spp != 1:
        raise NotImplementedError("palette TIFF must have 1 sample per pixel")
    predictor = int(tags.get(TAG_PREDICTOR, [1])[0])
    if predictor not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported (1 or 2)")
    offsets = [int(v) for v in tags[TAG_STRIP_OFFSETS]]
    counts = [int(v) for v in tags[TAG_STRIP_COUNTS]]
    raw = b"".join(_decompress_strip(data[o : o + c], comp) for o, c in zip(offsets, counts))
    need = w * h * spp
    if len(raw) < need:
        raise ValueError(f"TIFF strips truncated: {len(raw)} < {need}")
    arr = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(h, w, spp).copy()
    if predictor == 2:
        # horizontal differencing: each sample stored as delta from the
        # same sample one pixel left — undo with a wrap-around cumsum
        arr = np.cumsum(arr, axis=1, dtype=np.uint8)
    if photometric == 0:
        # WhiteIsZero: invert to the engine's BlackIsZero convention
        arr = (255 - arr).astype(np.uint8)
    elif photometric == 3:
        # palette: ColorMap (tag 320) holds 3 * 2^bits 16-bit values
        # (all reds, then greens, then blues); expand indices -> RGB,
        # scaling 16-bit palette entries to 8-bit like the PNG PLTE path
        if TAG_COLOR_MAP not in tags:
            raise ValueError("palette TIFF without ColorMap tag")
        cm = np.asarray(tags[TAG_COLOR_MAP], dtype=np.uint32)
        if cm.size % 3:
            raise ValueError(f"ColorMap length {cm.size} not divisible by 3")
        n_pal = cm.size // 3
        pal = (cm.reshape(3, n_pal).T >> 8).astype(np.uint8)  # (n_pal, 3)
        idx = arr.reshape(h, w)
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("palette index out of ColorMap range")
        return pal[idx], _georef_from_tags(tags, h)
    arr = arr.reshape((h, w) if spp == 1 else (h, w, spp))
    return arr, _georef_from_tags(tags, h)


def encode_tiff(arr: np.ndarray, geo: dict | None = None, compression: str = "none") -> bytes:
    """uint8 (H,W)/(H,W,3)/(H,W,4) -> little-endian single-strip TIFF;
    `compression` = 'none' | 'deflate'; `geo` = {"gsd", "mx0", "my1",
    ["epsg"]} adds GeoTIFF tags (pixel-scale, top-left tiepoint,
    projected-CRS geokey). Deterministic bytes (fixed tag order/layout,
    fixed zlib level)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported band count {c}")
    photometric = 1 if c == 1 else 2
    pixels = arr.tobytes()
    comp_code = 1
    if compression == "deflate":
        import zlib

        pixels = zlib.compress(pixels, 6)
        comp_code = 8
    elif compression != "none":
        raise ValueError(f"writer supports 'none' | 'deflate', got {compression!r}")

    entries = []  # (tag, type, count, values)
    extra = b""  # out-of-line values, appended after the IFD
    bo = "<"

    def add(tag, ftype, values):
        entries.append((tag, ftype, values))

    add(TAG_WIDTH, 4, [w])
    add(TAG_LENGTH, 4, [h])
    add(TAG_BITS, 3, [8] * c)
    add(TAG_COMPRESSION, 3, [comp_code])
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
