"""Minimal baseline TIFF 6.0 + GeoTIFF 1.1 codec (pure NumPy, [SPEC]).

The reference's primary raster input is GeoTIFF (gdal_tiler reads it via
GDAL; SURVEY.md §2.3 row 1-2). No imaging libs exist offline, so this
implements the published subset the tiling pipeline needs:

* reader: both byte orders, classic TIFF AND BigTIFF headers (magic
  42/43 — GDAL BIGTIFF=YES; u8 offsets, LONG8 types, 20-byte IFD
  entries), gray (BlackIsZero AND WhiteIsZero), RGB,
  RGBA, palette (ColorMap expanded to RGB like the PNG PLTE path);
  sample layouts uint8/uint16/Int16/Int32/Float32/Float64 via the
  SampleFormat tag (uint16 scales to the engine's uint8 contract with
  the documented round(v/257) rule; signed/float DEM rasters scale only
  through an EXPLICIT float_range, or surface raw — see decode_tiff);
  BOTH pixel organizations: strip (tags 273/278/279, any RowsPerStrip)
  and tiled (tags 322/323/324/325 — GDAL writes large rasters with
  TILED=YES, so real-world GeoTIFF archives hit this path first);
  the FULL IFD chain (GDAL internal overviews — decode_tiff(ifd=k)
  reads the k-th reduced level directly); PlanarConfiguration 1 AND 2
  (chunky and separated/INTERLEAVE=BAND — planes decoded independently
  and stacked);
  compression none(1)/LZW(5)/new-style JPEG(7, via the engine's own
  baseline jpegcodec incl. the shared JPEGTables tag 347)/Deflate(8,
  32946)/PackBits(32773) with horizontal Predictor(317)=2 (undone per
  strip row / per TILE row — differencing restarts at each tile's left
  edge) AND floating-point Predictor(317)=3 (TIFF TechNote 3 / libtiff
  fpDiff: per-row byte-plane split, most-significant plane first
  regardless of file byte order, then byte-wise horizontal differencing
  with lag = SamplesPerPixel — the layout GDAL writes for compressed
  Float32 DEMs with PREDICTOR=3) — the combinations GDAL-written
  GeoTIFFs actually use
  (COMPRESS=JPEG is the standard aerial-imagery layout); GeoTIFF
  georef via
  ModelPixelScaleTag (33550) + ModelTiepointTag (33922) +
  GeoKeyDirectoryTag (34735: model type + projected CRS key).
* writer: little-endian, single-strip OR tiled, 8- or 16-bit (plus the
  signed/float sample dtypes), compression none, deflate or jpeg with
  optional predictor 2/3, optional GeoTIFF tags, optional chained
  overview IFDs — used by fixtures/tests; the reader is also pinned
  against HANDCRAFTED tag bytes (tests/test_tiffcodec.py) so a shared
  writer/reader bug cannot hide.

Out of scope (documented, like WebP): old-style JPEG (compression 6,
deprecated by TIFF TechNote 2), predictor 2 on float samples (the spec
reserves horizontal differencing for integers; the float form is
predictor 3, supported), predictor 3 on integer samples, planar JPEG —
all raise with explicit messages rather than mis-decoding.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF field types -> (struct fmt char, byte size); 7 = UNDEFINED (raw
# bytes, used by JPEGTables); 16/17 are the BigTIFF LONG8/SLONG8 additions
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 7: ("B", 1), 12: ("d", 8),
          16: ("Q", 8), 17: ("q", 8)}

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
TAG_TILE_WIDTH = 322
TAG_TILE_LENGTH = 323
TAG_TILE_OFFSETS = 324
TAG_TILE_COUNTS = 325
TAG_JPEG_TABLES = 347
TAG_SAMPLE_FORMAT = 339  # 1=unsigned int, 2=signed int, 3=IEEE float
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
    4094 ('early change').

    Early-change anchoring (ADVICE r4): beyond the repo's own encoder,
    the decoder is paired against an INDEPENDENT test-local compressor
    written from libtiff's rules (tests/test_tiffcodec.py::
    test_unlzw_vs_independent_real_compressor — greedy table build,
    early-change at next_code == 2^width - 1, 4094 reset) across the
    9->10->11->12 transitions and a table reset. Residual debt, not
    closable offline: no fixture from an external BINARY encoder
    (libtiff/GDAL/Pillow absent); first online action remains to commit
    a gdal_translate LZW strip crossing the 510-entry boundary."""
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


def _read_values(data: bytes, bo: str, ftype: int, count: int, raw: bytes, inline_max: int = 4):
    fmt, size = _TYPES[ftype]
    total = size * count
    if total <= inline_max:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(bo + ("I" if inline_max == 4 else "Q"), raw[:inline_max])
        buf = data[off : off + total]
    return list(struct.unpack(bo + fmt * count, buf))


def _parse_ifds(data: bytes, max_ifds: int = 64) -> tuple[list[dict[int, list]], str]:
    """Header + the FULL IFD chain -> ([{tag: values}, ...], byte-order
    char). Cheap: touches only directories and out-of-line tag values,
    never pixel strips/tiles. IFDs past the first are how GDAL stores
    internal overviews (gdaladdo without -ro), so a chain-aware parse is
    what lets decode_tiff(ifd=k) pick a pre-reduced level instead of
    decoding the full raster to downsample it.

    Handles classic TIFF (magic 42: 12-byte entries, u4 counts/offsets,
    4-byte inline values, u4 next-IFD pointer) AND BigTIFF (magic 43,
    the GDAL BIGTIFF=YES variant: 20-byte entries, u8 counts/offsets,
    8-byte inline values, u8 next pointer, extra LONG8/SLONG8 types).
    A Spark binary cell caps a blob at 2 GiB so >4 GiB archives arrive
    windowed anyway, but GDAL also emits small BigTIFFs when BIGTIFF is
    forced or estimated. Chain walk stops at offset 0, any out-of-range
    or already-seen offset (cycle guard), or max_ifds."""
    if len(data) < 8:
        raise ValueError("not a TIFF: too short")
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    (magic,) = struct.unpack(bo + "H", data[2:4])
    big = magic == 43
    if big:  # BigTIFF ([SPEC] BigTIFF design, libtiff 4.x)
        offsize, reserved = struct.unpack(bo + "HH", data[4:8])
        if offsize != 8 or reserved != 0:
            raise ValueError(f"bad BigTIFF header (offset size {offsize}, reserved {reserved})")
        (ifd_off,) = struct.unpack(bo + "Q", data[8:16])
    elif magic == 42:
        (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    else:
        raise ValueError("not a TIFF: bad magic")
    ifds: list[dict[int, list]] = []
    seen: set[int] = set()
    while ifd_off and ifd_off not in seen and len(ifds) < max_ifds:
        seen.add(ifd_off)
        if ifd_off + (8 if big else 2) > len(data):
            break  # truncated chain: keep what parsed
        tags: dict[int, list] = {}
        if big:
            (n_entries,) = struct.unpack(bo + "Q", data[ifd_off : ifd_off + 8])
            base = ifd_off + 8
            for i in range(n_entries):
                e = data[base + 20 * i : base + 20 * (i + 1)]
                tag, ftype = struct.unpack(bo + "HH", e[:4])
                (count,) = struct.unpack(bo + "Q", e[4:12])
                if ftype in _TYPES:
                    tags[tag] = _read_values(data, bo, ftype, count, e[12:20], inline_max=8)
            nxt_pos = base + 20 * n_entries
            (ifd_off,) = struct.unpack(bo + "Q", data[nxt_pos : nxt_pos + 8]) if nxt_pos + 8 <= len(data) else (0,)
        else:
            (n_entries,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
            base = ifd_off + 2
            for i in range(n_entries):
                e = data[base + 12 * i : base + 12 * (i + 1)]
                tag, ftype, count = struct.unpack(bo + "HHI", e[:8])
                if ftype in _TYPES:
                    tags[tag] = _read_values(data, bo, ftype, count, e[8:12])
            nxt_pos = base + 12 * n_entries
            (ifd_off,) = struct.unpack(bo + "I", data[nxt_pos : nxt_pos + 4]) if nxt_pos + 4 <= len(data) else (0,)
        ifds.append(tags)
    if not ifds:
        raise ValueError("TIFF with no parseable IFD")
    return ifds, bo


def _parse_ifd(data: bytes) -> tuple[dict[int, list], str]:
    """First IFD only (the full-resolution image)."""
    ifds, bo = _parse_ifds(data, max_ifds=1)
    return ifds[0], bo


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
    """Tags-only parse: {"w", "h", "geo": georef-dict-or-None, "n_ifds",
    "ifds": [{"w", "h"}, ...]} WITHOUT touching (or decompressing) any
    pixel strip — the right call for georef/dimension extraction over
    large charts (map2gdal), where decoding a multi-hundred-MB LZW raster
    just to read four tags would waste minutes per file. IFDs past the
    first are GDAL internal overviews; pick the closest pre-reduced level
    with ``decode_tiff(data, ifd=k)`` instead of decoding and
    downsampling the full raster."""
    ifds, _bo = _parse_ifds(data)
    tags = ifds[0]
    w = int(tags[TAG_WIDTH][0])
    h = int(tags[TAG_LENGTH][0])
    dims = []
    for t in ifds:
        try:
            d = {"w": int(t[TAG_WIDTH][0]), "h": int(t[TAG_LENGTH][0])}
        except KeyError:
            d = {"w": -1, "h": -1}  # malformed overview IFD stays visible
        # structural facts the COG-layout checker needs (still tags-only)
        d["tiled"] = TAG_TILE_OFFSETS in t
        offs = t.get(TAG_TILE_OFFSETS) or t.get(TAG_STRIP_OFFSETS) or []
        d["data0"] = min((int(v) for v in offs), default=-1)
        d["tile_w"] = int(t[TAG_TILE_WIDTH][0]) if TAG_TILE_WIDTH in t else -1
        d["tile_h"] = int(t[TAG_TILE_LENGTH][0]) if TAG_TILE_LENGTH in t else -1
        dims.append(d)
    comp = int(tags.get(TAG_COMPRESSION, [1])[0])
    return {
        "w": w,
        "h": h,
        "geo": _georef_from_tags(tags, h),
        "n_ifds": len(ifds),
        "ifds": dims,
        # gdalinfo-report fields (all from the directory; pixel strips
        # stay untouched)
        "bands": int(tags.get(TAG_SPP, [1])[0]),
        "bits": int(tags.get(TAG_BITS, [1])[0]),
        "sample_format": int(tags.get(TAG_SAMPLE_FORMAT, [1])[0]),
        "compression": _COMP_NAMES.get(comp, str(comp)),
        "organization": "tiled" if TAG_TILE_OFFSETS in tags else "strip",
        "photometric": int(tags.get(TAG_PHOTOMETRIC, [1])[0]),
    }


_COMP_NAMES = {1: "none", 5: "lzw", 7: "jpeg", 8: "deflate", 32773: "packbits"}


def rewrite_georef(
    data: bytes,
    gsd: float | None = None,
    mx0: float | None = None,
    my1: float | None = None,
    dx: float = 0.0,
    dy: float = 0.0,
) -> bytes:
    """`gdal_edit.py -a_ullr` / `gdalmove` parity: rewrite the GeoTIFF
    georeferencing IN PLACE — pixel strips/tiles are never touched, so
    the output is byte-identical to the input outside the two 8-byte-
    double tag value blocks (the whole point of gdal_edit vs a
    re-encode). ``gsd``/``mx0``/``my1`` set absolute values (requires a
    (0,0)-anchored tiepoint, the layout GDAL and this engine write);
    ``dx``/``dy`` translate the model anchor (gdalmove), valid for any
    anchor. Classic and BigTIFF, both byte orders. Raises if the file
    carries no ModelPixelScale/ModelTiepoint pair."""
    if len(data) < 8:
        raise ValueError("not a TIFF: too short")
    bo = "<" if data[:2] == b"II" else ">"
    (magic,) = struct.unpack(bo + "H", data[2:4])
    big = magic == 43
    out = bytearray(data)
    ifd_off = struct.unpack(bo + ("Q" if big else "I"), data[8:16] if big else data[4:8])[0]
    esz, hdr = (20, 8) if big else (12, 2)
    n_entries = struct.unpack(bo + ("Q" if big else "H"), data[ifd_off : ifd_off + hdr])[0]
    found = {}
    for i in range(n_entries):
        e0 = ifd_off + hdr + esz * i
        tag, ftype = struct.unpack(bo + "HH", data[e0 : e0 + 4])
        if tag in (TAG_MODEL_PIXEL_SCALE, TAG_MODEL_TIEPOINT):
            if ftype != 12:
                raise ValueError(f"georef tag {tag} is not DOUBLE")
            count = struct.unpack(bo + ("Q" if big else "I"), data[e0 + 4 : e0 + (12 if big else 8)])[0]
            # count*8 bytes always exceeds the inline slot -> value offset
            voff = struct.unpack(
                bo + ("Q" if big else "I"),
                data[e0 + (12 if big else 8) : e0 + (20 if big else 12)],
            )[0]
            found[tag] = (int(voff), int(count))
    if TAG_MODEL_PIXEL_SCALE not in found or TAG_MODEL_TIEPOINT not in found:
        raise ValueError("TIFF has no ModelPixelScale/ModelTiepoint georef to edit")
    soff, scount = found[TAG_MODEL_PIXEL_SCALE]
    toff, tcount = found[TAG_MODEL_TIEPOINT]
    scale = list(struct.unpack(bo + f"{scount}d", data[soff : soff + 8 * scount]))
    tp = list(struct.unpack(bo + f"{tcount}d", data[toff : toff + 8 * tcount]))
    if gsd is not None:
        scale[0] = scale[1] = float(gsd)
    if mx0 is not None or my1 is not None:
        if tp[0] != 0.0 or tp[1] != 0.0:
            raise ValueError(
                "absolute ullr edit needs a (0,0)-anchored tiepoint; use dx/dy translation"
            )
        if mx0 is not None:
            tp[3] = float(mx0)
        if my1 is not None:
            tp[4] = float(my1)
    tp[3] += float(dx)
    tp[4] += float(dy)
    out[soff : soff + 8 * scount] = struct.pack(bo + f"{scount}d", *scale)
    out[toff : toff + 8 * tcount] = struct.pack(bo + f"{tcount}d", *tp)
    return bytes(out)


def _fp_undiff_rows(raw: bytes, rows: int, w: int, spp: int, dtype) -> np.ndarray:
    """Undo floating-point Predictor=3 over `rows` scanlines of `w` pixels
    x `spp` samples (TIFF TechNote 3; libtiff tif_predict.c fpAcc). Each
    row independently: (1) byte-wise wrap-around cumulative sum with lag
    = spp across the row buffer, (2) de-interleave the byte planes — the
    row buffer holds plane 0 = most significant byte of every sample,
    then plane 1, ... (MSB-first ALWAYS, independent of the file byte
    order), (3) reinterpret the per-sample big-endian bytes as floats.
    Returns (rows, w, spp) in native byte order."""
    itemsize = dtype.itemsize
    rowbytes = w * spp * itemsize
    need = rows * rowbytes
    if len(raw) < need:
        raise ValueError(f"TIFF predictor-3 data truncated: {len(raw)} < {need}")
    buf = np.frombuffer(raw, dtype=np.uint8, count=need).reshape(rows, rowbytes)
    # lag-spp byte cumsum mod 256 (uint64 accumulator cannot overflow:
    # 255 * rowbytes fits for any real raster width)
    b = buf.reshape(rows, rowbytes // spp, spp)
    b = np.cumsum(b, axis=1, dtype=np.uint64).astype(np.uint8)
    wc = w * spp
    planes = b.reshape(rows, itemsize, wc)
    be = np.ascontiguousarray(np.transpose(planes, (0, 2, 1)))  # (rows, wc, itemsize)
    out = be.reshape(rows * wc * itemsize).view(np.dtype(">" + dtype.str[-2:]))
    return out.astype(np.dtype("=" + dtype.str[-2:])).reshape(rows, w, spp)


def _assemble_strips(data: bytes, tags: dict, dtype, w: int, h: int, spp: int,
                     comp: int, predictor: int) -> np.ndarray:
    offsets = [int(v) for v in tags[TAG_STRIP_OFFSETS]]
    counts = [int(v) for v in tags[TAG_STRIP_COUNTS]]
    raw = b"".join(_decompress_strip(data[o : o + c], comp) for o, c in zip(offsets, counts))
    need = w * h * spp
    if len(raw) < need * dtype.itemsize:
        raise ValueError(f"TIFF strips truncated: {len(raw)} < {need * dtype.itemsize}")
    if predictor == 3:
        # per-ROW transform, and strip boundaries split rows, so undoing
        # over the joined buffer is identical to per-strip
        return _fp_undiff_rows(raw, h, w, spp, dtype)
    arr = np.frombuffer(raw, dtype=dtype, count=need).reshape(h, w, spp).copy()
    if predictor == 2:
        # horizontal differencing: each sample stored as delta from the
        # same sample one pixel left — undo with a wrap-around cumsum
        # (strip boundaries split ROWS, so the full-image per-row cumsum
        # is identical to per-strip)
        arr = np.cumsum(arr, axis=1, dtype=dtype)
    return arr


def _assemble_tiles(data: bytes, tags: dict, dtype, w: int, h: int, spp: int,
                    comp: int, predictor: int) -> np.ndarray:
    """Tiled organization (TIFF 6.0 §15, tags 322-325): the raster is a
    grid of tw x tl tiles, left-to-right then top-to-bottom, each tile
    compressed independently and PADDED to full tile size at the right
    and bottom edges. Predictor 2 differencing restarts at each tile's
    left edge, so it is undone per tile BEFORE assembly (a full-image
    cumsum would bleed deltas across vertical tile seams)."""
    tw = int(tags[TAG_TILE_WIDTH][0])
    tl = int(tags[TAG_TILE_LENGTH][0])
    if tw <= 0 or tl <= 0:
        raise ValueError(f"bad TIFF tile size {tw}x{tl}")
    offsets = [int(v) for v in tags[TAG_TILE_OFFSETS]]
    counts = [int(v) for v in tags[TAG_TILE_COUNTS]]
    across = (w + tw - 1) // tw
    down = (h + tl - 1) // tl
    if len(offsets) != across * down or len(counts) != len(offsets):
        raise ValueError(
            f"TIFF tile count mismatch: {len(offsets)} offsets for {across}x{down} grid"
        )
    out = np.zeros((down * tl, across * tw, spp), dtype=dtype)
    per_tile = tw * tl * spp
    for i, (o, c) in enumerate(zip(offsets, counts)):
        raw = _decompress_strip(data[o : o + c], comp)
        if len(raw) < per_tile * dtype.itemsize:
            raise ValueError(f"TIFF tile {i} truncated: {len(raw)} < {per_tile * dtype.itemsize}")
        if predictor == 3:
            tile = _fp_undiff_rows(raw, tl, tw, spp, dtype)
        else:
            tile = np.frombuffer(raw, dtype=dtype, count=per_tile).reshape(tl, tw, spp)
            if predictor == 2:
                tile = np.cumsum(tile, axis=1, dtype=dtype)
        r, col = divmod(i, across)
        out[r * tl : (r + 1) * tl, col * tw : (col + 1) * tw] = tile
    return np.ascontiguousarray(out[:h, :w])  # crop edge-tile padding


def _planar_subtags(tags: dict, spp: int, off_tag: int, cnt_tag: int):
    """PlanarConfiguration=2 (GDAL INTERLEAVE=BAND): chunk offsets/counts
    are PLANE-MAJOR — all chunks of sample 0, then sample 1, ... Yield a
    per-plane tags view whose offsets/counts cover one plane, so each
    plane decodes through the ordinary spp=1 assembly path (predictor
    differencing is per sample plane by construction)."""
    offs = tags[off_tag]
    cnts = tags[cnt_tag]
    if len(offs) % spp or len(cnts) != len(offs):
        raise ValueError(
            f"planar TIFF chunk count {len(offs)} not divisible by SamplesPerPixel {spp}"
        )
    per = len(offs) // spp
    for sidx in range(spp):
        sub = dict(tags)
        sub[off_tag] = offs[sidx * per : (sidx + 1) * per]
        sub[cnt_tag] = cnts[sidx * per : (sidx + 1) * per]
        yield sub


def _assemble_jpeg(data: bytes, tags: dict, w: int, h: int, spp: int) -> np.ndarray:
    """New-style JPEG-in-TIFF (compression 7, TIFF/EP — the standard
    GDAL COMPRESS=JPEG aerial-imagery layout): every strip/tile is an
    independent baseline JPEG stream decoded with the engine's own
    jpegcodec; a JPEGTables tag (347) holds an abbreviated tables-only
    stream (SOI [DQT/DHT...] EOI) shared by all chunks, spliced in after
    each chunk's SOI (libtiff's merge rule — in-stream tables appearing
    later simply override, which a sequential segment parser honors).
    Strip chunks are full-width images RowsPerStrip tall; tile chunks
    are TileWidth x TileLength; both may be MCU-padded at the edges, so
    each decoded chunk is clipped to the region it covers."""
    from .jpegcodec import decode_jpeg

    tables = b""
    if TAG_JPEG_TABLES in tags:
        tb = bytes(bytearray(int(v) & 0xFF for v in tags[TAG_JPEG_TABLES]))
        if len(tb) >= 4 and tb[:2] == b"\xff\xd8" and tb[-2:] == b"\xff\xd9":
            tables = tb[2:-2]  # strip SOI/EOI, keep the table segments

    def _decode(chunk: bytes) -> np.ndarray:
        if chunk[:2] != b"\xff\xd8":
            raise ValueError("JPEG-in-TIFF chunk without SOI marker")
        arr = decode_jpeg(b"\xff\xd8" + tables + chunk[2:] if tables else chunk)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[2] != spp:
            raise ValueError(f"JPEG chunk has {arr.shape[2]} bands, SamplesPerPixel={spp}")
        return arr

    out = np.zeros((h, w, spp), dtype=np.uint8)
    tiled = TAG_TILE_WIDTH in tags or TAG_TILE_OFFSETS in tags
    if tiled:
        tw = int(tags[TAG_TILE_WIDTH][0])
        tl = int(tags[TAG_TILE_LENGTH][0])
        offsets = [int(v) for v in tags[TAG_TILE_OFFSETS]]
        counts = [int(v) for v in tags[TAG_TILE_COUNTS]]
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        if len(offsets) != across * down:
            raise ValueError(
                f"TIFF tile count mismatch: {len(offsets)} offsets for {across}x{down} grid"
            )
        for i, (o, c) in enumerate(zip(offsets, counts)):
            dec = _decode(data[o : o + c])
            r, col = divmod(i, across)
            r0, c0 = r * tl, col * tw
            hh, ww = min(tl, h - r0), min(tw, w - c0)
            if dec.shape[0] < hh or dec.shape[1] < ww:
                raise ValueError(f"JPEG tile {i} smaller than its grid cell")
            out[r0 : r0 + hh, c0 : c0 + ww] = dec[:hh, :ww]
    else:
        offsets = [int(v) for v in tags[TAG_STRIP_OFFSETS]]
        counts = [int(v) for v in tags[TAG_STRIP_COUNTS]]
        rps = int(tags.get(TAG_ROWS_PER_STRIP, [h])[0])
        for i, (o, c) in enumerate(zip(offsets, counts)):
            dec = _decode(data[o : o + c])
            r0 = i * rps
            hh = min(rps, h - r0)
            if hh <= 0:
                break
            if dec.shape[0] < hh or dec.shape[1] < w:
                raise ValueError(f"JPEG strip {i} smaller than its row band")
            out[r0 : r0 + hh] = dec[:hh, :w]
    return out


def scale_range_to_8bit(arr: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Signed-int/float raster -> uint8 via an EXPLICIT linear range (the
    GDAL ``-ot Byte -scale <vmin> <vmax> 0 255`` mapping): clip to
    [vmin, vmax], scale linearly, round half up. DEM-style rasters have
    no universal range, so the caller must supply one — there is no
    silent default."""
    if not (vmax > vmin):
        raise ValueError(f"scale range must satisfy vmax > vmin, got ({vmin}, {vmax})")
    x = np.clip(arr.astype(np.float64), vmin, vmax)
    return np.floor((x - vmin) * (255.0 / (vmax - vmin)) + 0.5).astype(np.uint8)


def scale_16bit_to_8bit(arr: np.ndarray) -> np.ndarray:
    """uint16 -> uint8 with the documented rule: linear 0..65535 ->
    0..255, round half up — floor(v * 255 / 65535 + 0.5) = round(v/257),
    the GDAL ``gdal_translate -ot Byte -scale 0 65535 0 255`` mapping.
    Exact at the endpoints (0 -> 0, 65535 -> 255) and monotone; NOT the
    truncating ``v >> 8`` (which maps 129 -> 0 where this rounds to 1,
    and reaches 255 only at 65280 instead of 65407)."""
    a = arr.astype(np.uint32)
    return ((a * 255 + 32767) // 65535).astype(np.uint8)


def decode_tiff(
    data: bytes,
    scale_16bit: bool = True,
    ifd: int = 0,
    float_range: tuple[float, float] | None = None,
):
    """TIFF bytes -> (uint8 array (H,W) or (H,W,C), georef dict | None).

    georef (when GeoTIFF tags are present): {"gsd", "mx0", "my0", "mx1",
    "my1", "epsg"} — the north-up affine of the engine's render contract
    (tiepoint maps raster (0,0) to the model-space TOP-left; my0 < my1).

    Handles both strip and tiled pixel organization (GDAL TILED=YES) and
    chunky/separated planes. Sample layouts beyond uint8 (SampleFormat
    tag 339): uint16 scales to the engine's uint8 contract via
    ``scale_16bit_to_8bit`` (round(v/257) — the GDAL ``-ot Byte -scale 0
    65535 0 255`` equivalent); Int16/Int32/Float32/Float64 DEM-style
    rasters have NO universal range, so scaling them requires an
    explicit ``float_range=(vmin, vmax)`` (``scale_range_to_8bit``,
    clip + linear + round half up) — without one the call raises rather
    than guessing. ``scale_16bit=False`` returns the RAW samples in the
    file's dtype for ANY >8-bit layout (what a DEM consumer wants).

    ``ifd`` selects an image from the IFD chain: 0 (default) is the full
    raster, k >= 1 the k-th GDAL internal overview (gdaladdo). Overview
    IFDs usually carry no georef tags — compose the level's geotransform
    from IFD 0's georef scaled by the dimension ratio.
    """
    ifds, bo = _parse_ifds(data)
    if not 0 <= ifd < len(ifds):
        raise ValueError(f"TIFF has {len(ifds)} IFD(s), requested ifd={ifd}")
    tags = ifds[ifd]
    w = int(tags[TAG_WIDTH][0])
    h = int(tags[TAG_LENGTH][0])
    comp = int(tags.get(TAG_COMPRESSION, [1])[0])
    spp = int(tags.get(TAG_SPP, [1])[0])
    bits = [int(b) for b in tags.get(TAG_BITS, [8] * spp)]
    sfmt = [int(v) for v in tags.get(TAG_SAMPLE_FORMAT, [1] * spp)]
    if len(set(bits)) != 1 or len(set(sfmt)) != 1:
        raise NotImplementedError(f"mixed sample layouts unsupported: bits={bits} fmt={sfmt}")
    # (BitsPerSample, SampleFormat) -> numpy dtype; decompressed sample
    # bytes follow the FILE byte order
    _DTYPES = {
        (8, 1): "u1",
        (16, 1): "u2",
        (16, 2): "i2",  # Int16 DEM (GDAL gdal_translate -ot Int16)
        (32, 2): "i4",
        (32, 3): "f4",  # Float32 DEM — the common gdaldem/SRTM form
        (64, 3): "f8",
    }
    key = (bits[0], sfmt[0])
    if key not in _DTYPES:
        raise NotImplementedError(
            f"unsupported sample layout bits={bits[0]} format={sfmt[0]} "
            f"(supported: {sorted(_DTYPES)})"
        )
    dtype = np.dtype(bo + _DTYPES[key]) if bits[0] > 8 else np.dtype(np.uint8)
    planar = int(tags.get(TAG_PLANAR, [1])[0])
    if planar not in (1, 2):
        raise NotImplementedError(f"TIFF planar configuration {planar} not supported (1 or 2)")
    photometric = int(tags.get(TAG_PHOTOMETRIC, [1])[0])
    if comp == 7:
        # new-style JPEG-in-TIFF: chunks are JPEG streams, not sample
        # bytes; photometric 6 (YCbCr) is the normal GDAL COMPRESS=JPEG
        # color form and the codec hands back RGB
        if dtype.itemsize != 1:
            raise NotImplementedError("JPEG-in-TIFF requires 8-bit samples")
        if int(tags.get(TAG_PLANAR, [1])[0]) != 1:
            raise NotImplementedError("JPEG-in-TIFF with planar configuration 2 not supported")
        if photometric not in (1, 2, 6):
            raise NotImplementedError(
                f"JPEG-in-TIFF photometric {photometric} not supported (1/2/6)"
            )
        arr = _assemble_jpeg(data, tags, w, h, spp)
        arr = arr.reshape((h, w) if spp == 1 else (h, w, spp))
        return arr, _georef_from_tags(tags, h)
    if photometric not in (0, 1, 2, 3):
        # 5=CMYK, 6=YCbCr (outside comp 7), ... — mis-decoding as
        # gray/RGB would be silent
        raise NotImplementedError(f"TIFF photometric {photometric} not supported (0/1/2/3)")
    if photometric == 3 and (spp != 1 or dtype.itemsize != 1):
        raise NotImplementedError("palette TIFF must have 1 sample per pixel, 8-bit")
    predictor = int(tags.get(TAG_PREDICTOR, [1])[0])
    if predictor not in (1, 2, 3):
        raise NotImplementedError(f"TIFF predictor {predictor} not supported (1, 2 or 3)")
    if predictor == 2 and dtype.kind == "f":
        # spec: horizontal differencing is integer-only (the float form
        # is predictor 3) — wraparound cumsum on float bytes would
        # silently corrupt
        raise NotImplementedError("predictor 2 on float samples is invalid (use predictor 3)")
    if predictor == 3 and dtype.kind != "f":
        # TechNote 3 defines the floating-point predictor for float
        # samples only; mis-applying the byte-plane transform to ints
        # would silently corrupt
        raise NotImplementedError("predictor 3 on non-float samples not supported")
    tiled = TAG_TILE_WIDTH in tags or TAG_TILE_OFFSETS in tags
    if tiled and TAG_STRIP_OFFSETS in tags:
        raise ValueError("TIFF with both strip and tile offsets")
    assemble = _assemble_tiles if tiled else _assemble_strips
    if planar == 2 and spp > 1:
        # separated planes (GDAL INTERLEAVE=BAND): decode each plane via
        # the ordinary spp=1 path over its plane-major chunk slice, then
        # stack — predictor/compression semantics are per plane
        off_tag, cnt_tag = (
            (TAG_TILE_OFFSETS, TAG_TILE_COUNTS) if tiled else (TAG_STRIP_OFFSETS, TAG_STRIP_COUNTS)
        )
        planes = [
            assemble(data, sub, dtype, w, h, 1, comp, predictor)
            for sub in _planar_subtags(tags, spp, off_tag, cnt_tag)
        ]
        arr = np.concatenate(planes, axis=2)
    else:
        arr = assemble(data, tags, dtype, w, h, spp, comp, predictor)
    if photometric == 0:
        # WhiteIsZero: invert to the engine's BlackIsZero convention —
        # well-defined only for unsigned samples
        if dtype.kind != "u":
            raise NotImplementedError("WhiteIsZero with signed/float samples not supported")
        maxv = (1 << (8 * dtype.itemsize)) - 1
        arr = (maxv - arr).astype(dtype)
    if dtype.itemsize > 1 and scale_16bit:
        if dtype.kind == "u" and dtype.itemsize == 2:
            arr = scale_16bit_to_8bit(arr)
        elif float_range is not None:
            arr = scale_range_to_8bit(arr, float_range[0], float_range[1])
        else:
            raise ValueError(
                f"{dtype} raster has no universal 8-bit mapping: pass "
                "float_range=(vmin, vmax) to scale, or scale_16bit=False for raw samples"
            )
    if photometric == 3:
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


def _fp_diff_rows(block: np.ndarray) -> bytes:
    """Apply floating-point Predictor=3 to one chunk (TIFF TechNote 3;
    libtiff tif_predict.c fpDiff): per row, split samples into byte
    planes (most significant plane first), then byte-wise horizontal
    differencing with lag = samples-per-pixel, mod 256."""
    rows, w, c = block.shape
    itemsize = block.dtype.itemsize
    be = np.ascontiguousarray(block.astype(np.dtype(">" + block.dtype.str[-2:])))
    byts = be.view(np.uint8).reshape(rows, w * c, itemsize)
    planes = np.transpose(byts, (0, 2, 1)).reshape(rows, -1, c).astype(np.int16)
    d = np.empty_like(planes)
    d[:, 0] = planes[:, 0]
    d[:, 1:] = planes[:, 1:] - planes[:, :-1]
    return (d & 0xFF).astype(np.uint8).tobytes()


def _prep_image(arr: np.ndarray, geo: dict | None, compression: str,
                tile: int | tuple[int, int] | None, predictor: int = 1):
    """First pass of the writer for ONE image: normalize the array,
    compress chunks, build the (tag, type, values) entry list (offsets
    entry marked with values=None) and compute the deterministic sizes
    the layout pass needs."""
    a = np.asarray(arr)
    # recognized sample dtypes pass through (little-endian on disk, with
    # a SampleFormat tag when signed/float); anything else keeps the
    # legacy behavior of casting to uint8
    _WRITE_DTYPES = {
        np.dtype(np.uint16): ("<u2", 1),
        np.dtype(np.int16): ("<i2", 2),
        np.dtype(np.int32): ("<i4", 2),
        np.dtype(np.float32): ("<f4", 3),
        np.dtype(np.float64): ("<f8", 3),
    }
    if a.dtype in _WRITE_DTYPES:
        code, sfmt = _WRITE_DTYPES[a.dtype]
        sample_dtype = np.dtype(code)
    else:
        sample_dtype, sfmt = np.dtype(np.uint8), 1
    bits = 8 * sample_dtype.itemsize
    arr = np.ascontiguousarray(a, dtype=sample_dtype)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3, 4):
        raise ValueError(f"unsupported band count {c}")
    photometric = 1 if c == 1 else 2
    jpeg = compression == "jpeg"
    if jpeg:
        if bits != 8 or c == 4:
            raise ValueError("jpeg compression supports 8-bit gray/RGB only")
        photometric = 1 if c == 1 else 6  # YCbCr (the GDAL COMPRESS=JPEG form)

    if predictor not in (1, 2, 3):
        raise ValueError(f"writer predictor must be 1, 2 or 3, got {predictor}")
    if predictor != 1 and jpeg:
        raise ValueError("predictor is meaningless with jpeg compression")
    if predictor == 2 and sample_dtype.kind == "f":
        raise ValueError("predictor 2 is integer-only; use predictor 3 for floats")
    if predictor == 3 and sample_dtype.kind != "f":
        raise ValueError("predictor 3 is float-only")

    def _predict(block: np.ndarray) -> bytes:
        if predictor == 3:
            return _fp_diff_rows(block)
        if predictor == 2:
            d = block.copy()
            d[:, 1:] = block[:, 1:] - block[:, :-1]  # wraps mod 2^bits
            return d.tobytes()
        return block.tobytes()

    def _compress(block: np.ndarray) -> bytes:
        if jpeg:
            from .jpegcodec import encode_jpeg

            return encode_jpeg(block.squeeze() if c == 1 else block)
        raw = _predict(block)
        if compression == "deflate":
            import zlib

            return zlib.compress(raw, 6)
        if compression != "none":
            raise ValueError(
                f"writer supports 'none' | 'deflate' | 'jpeg', got {compression!r}"
            )
        return raw

    comp_code = {"deflate": 8, "jpeg": 7}.get(compression, 1)
    if tile is not None:
        tw, tl = (tile, tile) if isinstance(tile, int) else (int(tile[0]), int(tile[1]))
        if tw <= 0 or tl <= 0:
            raise ValueError(f"bad tile size {tw}x{tl}")
        across = (w + tw - 1) // tw
        down = (h + tl - 1) // tl
        padded = np.zeros((down * tl, across * tw, c), dtype=sample_dtype)
        padded[:h, :w] = arr
        chunks = [
            _compress(padded[r * tl : (r + 1) * tl, col * tw : (col + 1) * tw])
            for r in range(down)
            for col in range(across)
        ]
    else:
        chunks = [_compress(arr)]

    entries = []  # (tag, type, values); values None = offsets placeholder

    def add(tag, ftype, values):
        entries.append((tag, ftype, values))

    add(TAG_WIDTH, 4, [w])
    add(TAG_LENGTH, 4, [h])
    add(TAG_BITS, 3, [bits] * c)
    add(TAG_COMPRESSION, 3, [comp_code])
    add(TAG_PHOTOMETRIC, 3, [photometric])
    add(TAG_SPP, 3, [c])
    add(TAG_PLANAR, 3, [1])
    if predictor != 1:
        add(TAG_PREDICTOR, 3, [predictor])
    if sfmt != 1:
        add(TAG_SAMPLE_FORMAT, 3, [sfmt] * c)
    if tile is not None:
        add(TAG_TILE_WIDTH, 4, [tw])
        add(TAG_TILE_LENGTH, 4, [tl])
        add(TAG_TILE_OFFSETS, 4, None)
        add(TAG_TILE_COUNTS, 4, [len(ch) for ch in chunks])
    else:
        add(TAG_STRIP_OFFSETS, 4, None)
        add(TAG_ROWS_PER_STRIP, 4, [h])
        add(TAG_STRIP_COUNTS, 4, [len(chunks[0])])
    if geo is not None:
        add(TAG_MODEL_PIXEL_SCALE, 12, [float(geo["gsd"]), float(geo["gsd"]), 0.0])
        add(TAG_MODEL_TIEPOINT, 12, [0.0, 0.0, 0.0, float(geo["mx0"]), float(geo["my1"]), 0.0])
        epsg = int(geo.get("epsg") or 3857)
        # EPSG:4326 is a geographic CRS: model type 2 + GeographicTypeGeoKey
        # (GDAL writes the same pair for lon/lat rasters); everything else
        # stays projected model type 1 + ProjectedCSTypeGeoKey
        if epsg == 4326:
            add(TAG_GEO_KEYS, 3, [1, 1, 0, 2, _GT_MODEL_TYPE, 0, 1, 2, _GEOGRAPHIC_CS, 0, 1, epsg])
        else:
            add(TAG_GEO_KEYS, 3, [1, 1, 0, 2, _GT_MODEL_TYPE, 0, 1, 1, _PROJECTED_CS, 0, 1, epsg])

    entries.sort(key=lambda e: e[0])  # spec: ascending tag order
    extra_size = 0
    for tag, ftype, values in entries:
        count = len(chunks) if values is None else len(values)
        total = _TYPES[ftype][1] * count
        if total > 4:
            extra_size += total
    # segment = entry count (2) + entries (12n) + next-IFD ptr (4)
    #         + out-of-line values + chunk data
    seg_len = 2 + 12 * len(entries) + 4 + extra_size + sum(len(ch) for ch in chunks)
    return entries, chunks, extra_size, seg_len


def _pack_ifd_segment(entries, chunks, extra_size, base_off: int, next_off: int) -> bytes:
    """Second pass: pack one IFD segment at absolute offset `base_off`,
    with the next-IFD pointer set to `next_off` (0 terminates the chain)."""
    bo = "<"
    n = len(entries)
    data_off = base_off + 2 + 12 * n + 4  # out-of-line tag values start here
    chunk_start = data_off + extra_size
    offsets = []
    pos = chunk_start
    for ch in chunks:
        offsets.append(pos)
        pos += len(ch)
    out_entries = b""
    extra = b""
    for tag, ftype, values in entries:
        if values is None:
            values = offsets
        fmt, size = _TYPES[ftype]
        total = size * len(values)
        packed = struct.pack(bo + fmt * len(values), *values)
        if total <= 4:
            raw = packed.ljust(4, b"\0")
        else:
            raw = struct.pack(bo + "I", data_off + len(extra))
            extra += packed
        out_entries += struct.pack(bo + "HHI", tag, ftype, len(values)) + raw
    return (
        struct.pack(bo + "H", n)
        + out_entries
        + struct.pack(bo + "I", next_off)
        + extra
        + b"".join(chunks)
    )


def encode_tiff(
    arr: np.ndarray,
    geo: dict | None = None,
    compression: str = "none",
    tile: int | tuple[int, int] | None = None,
    overviews: list[np.ndarray] | None = None,
    cog_layout: bool = False,
    predictor: int = 1,
) -> bytes:
    """uint8 or uint16 (H,W)/(H,W,3)/(H,W,4) -> little-endian TIFF;
    `compression` = 'none' | 'deflate'; `tile` = None (single-strip) or a
    tile size (int or (tw, tl)) for tiled organization (tags 322-325,
    edge tiles zero-padded per spec §15); `geo` = {"gsd", "mx0", "my1",
    ["epsg"]} adds GeoTIFF tags to IFD 0 (pixel-scale, top-left tiepoint,
    projected-CRS geokey); `overviews` = reduced-resolution arrays
    appended as chained IFDs (the GDAL internal-overview layout — no
    georef tags on overview IFDs, like gdaladdo). uint16 input writes
    BitsPerSample=16. Deterministic bytes (fixed tag order/layout, fixed
    zlib level). `predictor` = 1 (none) | 2 (horizontal differencing,
    integer samples) | 3 (TechNote-3 floating-point byte-plane
    differencing, float samples — the GDAL PREDICTOR=3 DEM layout);
    applied per strip/tile before compression and declared via tag 317."""
    images = [(arr, geo)] + [(ov, None) for ov in (overviews or [])]
    preps = [_prep_image(a, g, compression, tile, predictor) for a, g in images]
    n = len(preps)
    # physical segment order: normal = IFD-chain order (main first);
    # cog_layout = REVERSED (smallest overview's data first, full-res
    # last — the cloud-optimized streaming layout; the IFD chain still
    # reads main -> ov1 -> ov2 via absolute next-IFD pointers, which the
    # TIFF spec allows anywhere in the file)
    phys = list(range(n))[::-1] if cog_layout else list(range(n))
    base = 8
    bases: list[int] = [0] * n
    for idx in phys:
        bases[idx] = base
        base += preps[idx][3]
    out = [struct.pack("<2sHI", b"II", 42, bases[0])]
    for idx in phys:
        entries, chunks, extra_size, _seg_len = preps[idx]
        next_off = bases[idx + 1] if idx + 1 < n else 0
        out.append(_pack_ifd_segment(entries, chunks, extra_size, bases[idx], next_off))
    return b"".join(out)
