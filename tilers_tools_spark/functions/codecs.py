"""Pure-NumPy image codecs (no PIL/GDAL on this machine — SURVEY.md §7 [ENV]).

Plays the role of the reference's PIL/GDAL encode/decode
(``gdal_tiler.py::Pyramid.write_tile`` tile encoding, windowed ``ReadRaster``
decode — reference checkout absent, SURVEY.md §0.1; contract per
BASELINE.json:15: vectorized decode inside Arrow UDFs, decoded pixels exact
for lossless, PSNR>=40dB for lossy).

Formats (FIXTURES.md §4):
* ``raw``  — header ``b"RAW1" + pack("<HHB", w, h, nband)`` + C-order bytes.
* ``png``  — encoder: 8-bit RGB/RGBA/gray, filter 0 (or the Up fast path)
  on every scanline, one zlib stream, level 6 → byte-deterministic.
  Decoder additionally handles all five scanline filters, palette + tRNS,
  sub-8-bit (1/2/4) packed palette/gray rows, 16-bit samples (high
  byte), and Adam7 interlace, so foreign PNGs — palette-optimized tiles,
  16-bit DEM PNGs, legacy interlaced tiles — also decode.
* ``jpeg`` — baseline ITU T.81 (see ``jpegcodec.py``, M7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# RAW
# ---------------------------------------------------------------------------


def encode_raw(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return b"RAW1" + struct.pack("<HHB", w, h, c) + arr.astype(np.uint8).tobytes()


def decode_raw(data: bytes) -> np.ndarray:
    if data[:4] != b"RAW1":
        raise ValueError("not a RAW1 blob")
    w, h, c = struct.unpack("<HHB", data[4:9])
    return np.frombuffer(data, dtype=np.uint8, count=w * h * c, offset=9).reshape(h, w, c)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, level: int = 6, filter_type: int = 0) -> bytes:
    """uint8 (H,W), (H,W,3) or (H,W,4) -> PNG bytes. Fixed scanline filter
    (0 = None, 2 = Up) on every line, single IDAT, fixed compression level
    → byte-deterministic (FIXTURES.md §4 pins the fixture images at
    filter 0 / level 6; tile blobs use encode_tile_png below).

    The Up filter is both FASTER and smaller on continuous-tone imagery:
    row deltas deflate ~4x quicker than raw rows AND compress ~10x better
    (measured on rendered tiles: filter0/level1 2.5 ms/tile @ 62 KiB vs
    up/level3 1.1 ms/tile @ 8 KiB) — match finding in near-zero delta
    streams is cheap. Fixed-filter (not per-row adaptive) keeps the output
    a pure function of (pixels, level, filter_type).
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * c)
    lines = np.zeros((h, 1 + w * c), dtype=np.uint8)
    if filter_type == 0:
        lines[:, 1:] = raw
    elif filter_type == 2:  # Up: line minus prior line mod 256 (spec: row 0's
        # implicit prior row is zeros, so its filtered bytes equal the raw row)
        lines[:, 0] = 2
        lines[0, 1:] = raw[0]
        lines[1:, 1:] = raw[1:] - raw[:-1]  # uint8 wraps mod 256 natively
    else:
        raise ValueError(f"unsupported fixed filter {filter_type} (0 or 2)")
    idat = zlib.compress(lines.tobytes(), level)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_png_paletted(
    arr: np.ndarray, level: int = 6, max_colors: int = 256, bit_depth: str | int = 8
) -> bytes:
    """uint8 (H,W,3)/(H,W,4) -> paletted PNG (color type 3, PLTE [+ tRNS])
    when the image has <= max_colors distinct colors; falls back to
    encode_png otherwise. Palette order = sorted packed RGBA -> byte-
    deterministic. Decoder side: decode_png already expands palettes
    (SURVEY.md §2.3 row 20 paletted output; roundtrips via to_rgba).

    ``bit_depth``: 8 (default, the historical byte-stable output) or
    'min' — pick the smallest spec depth that fits the palette (1/2/4/8),
    packing indices MSB-first per scanline; 2-16-color tiles shrink
    ~2-8x before deflate even sees them.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] not in (3, 4):
        return encode_png(arr, level)
    h, w, c = arr.shape
    rgba = arr if c == 4 else np.dstack([arr, np.full((h, w), 255, np.uint8)])
    # pack RGBA arithmetically (R<<24|G<<16|B<<8|A) — endianness-independent,
    # so palette order (and thus the encoded bytes) match across hosts
    q = rgba.reshape(-1, 4).astype(np.uint32)
    packed = (q[:, 0] << 24) | (q[:, 1] << 16) | (q[:, 2] << 8) | q[:, 3]
    colors, inverse = np.unique(packed, return_inverse=True)
    if len(colors) > max_colors:
        return encode_png(arr, level)
    pal_rgba = np.stack(
        [(colors >> 24) & 255, (colors >> 16) & 255, (colors >> 8) & 255, colors & 255], axis=1
    ).astype(np.uint8)
    idx = inverse.astype(np.uint8).reshape(h, w)
    depth = 8
    if bit_depth == "min":
        n = len(colors)
        depth = 1 if n <= 2 else 2 if n <= 4 else 4 if n <= 16 else 8
    elif bit_depth != 8:
        raise ValueError(f"bit_depth must be 8 or 'min', got {bit_depth!r}")
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    plte = pal_rgba[:, :3].tobytes()
    if depth == 8:
        lines = np.zeros((h, 1 + w), dtype=np.uint8)
        lines[:, 1:] = idx
    else:  # MSB-first bit packing, row-padded to whole bytes
        bits = ((idx[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(h, -1)
        packed_rows = np.packbits(bits.astype(np.uint8), axis=1)
        lines = np.zeros((h, 1 + packed_rows.shape[1]), dtype=np.uint8)
        lines[:, 1:] = packed_rows
    idat = zlib.compress(lines.tobytes(), level)
    out = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", plte)
    alpha = pal_rgba[:, 3]
    if (alpha != 255).any() or c == 4:
        out += _chunk(b"tRNS", alpha.tobytes())
    return out + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# tile blobs: Up filter + level 3 — vs the old filter-0/level-1 tile
# encode this is ~2.3x faster AND ~7x smaller (see encode_png docstring
# for measurements); any fixed (level, filter) pair is byte-deterministic
# — engine and oracle share this one.
TILE_PNG_LEVEL = 3
TILE_PNG_FILTER = 2


def encode_tile_png(arr: np.ndarray) -> bytes:
    return encode_png(arr, level=TILE_PNG_LEVEL, filter_type=TILE_PNG_FILTER)


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. raw is (h, 1+stride) uint8 (filter byte + data)."""
    ftypes = raw[:, 0]
    if not ftypes.any():  # fast path: all filter 0
        return raw[:, 1:].copy()
    if (ftypes == 2).all():
        # fast path: all Up (our tile encoder) — reconstruction is a
        # per-column running sum mod 256, which uint8 cumsum computes
        # natively (wraparound accumulate)
        return np.cumsum(raw[:, 1:], axis=0, dtype=np.uint8)
    data = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = ftypes[r]
        line = data[r]
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                c_ = prev[i - bpp] if i >= bpp else 0
                b = prev[i]
                p = a + b - c_
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c_)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (H,W,C). Supports the non-interlaced spec bit
    depths: 8-bit gray/RGB/RGBA/gray+alpha/palette, sub-8-bit (1/2/4)
    palette and gray (MSB-first packed, row-padded; gray scales by the
    exact 255/(2^d-1) factor the PNG spec defines), and 16-bit samples
    reduced to their high byte (the same documented 16->8 convention as
    tiffcodec.scale_16bit_to_8bit's floor variant — PNG stores MSB
    first, so the high byte IS sample >> 8). Adam7 interlace raises."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = []
    palette = None
    trns = None
    w = h = bitdepth = color_type = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, bitdepth, color_type, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if interlace not in (0, 1):
                raise ValueError(f"PNG interlace method {interlace} invalid")
            legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                     4: (8, 16), 6: (8, 16)}
            if color_type not in legal or bitdepth not in legal[color_type]:
                raise ValueError(
                    f"PNG color type {color_type} / bit depth {bitdepth} invalid"
                )
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)

    def consume(buf: np.ndarray, w_: int, h_: int) -> tuple[int, np.ndarray]:
        """Decode h_ filtered scanlines of a w_-pixel (sub-)image from
        buf; returns (bytes consumed, uint8 [h_, w_, nch] samples —
        16-bit already reduced to the high byte, sub-8-bit gray scaled)."""
        if bitdepth == 8:
            s = w_ * nch
            take = h_ * (1 + s)
            o = _unfilter(buf[:take].reshape(h_, 1 + s), h_, s, nch).reshape(h_, w_, nch)
        elif bitdepth == 16:
            s = w_ * nch * 2
            take = h_ * (1 + s)
            unf = _unfilter(buf[:take].reshape(h_, 1 + s), h_, s, nch * 2)
            o = unf.reshape(h_, w_, nch, 2)[:, :, :, 0]  # big-endian: MSB first
        else:  # 1/2/4-bit gray or palette: filter unit is one byte (bpp=1)
            s = (w_ * bitdepth + 7) // 8
            take = h_ * (1 + s)
            unf = _unfilter(buf[:take].reshape(h_, 1 + s), h_, s, 1)
            bits = np.unpackbits(unf, axis=1)[:, : w_ * bitdepth]
            weights = (1 << np.arange(bitdepth - 1, -1, -1)).astype(np.uint8)
            idx = (bits.reshape(h_, w_, bitdepth) * weights).sum(axis=2).astype(np.uint8)
            if color_type == 0:
                idx = (idx.astype(np.uint16) * (255 // ((1 << bitdepth) - 1))).astype(np.uint8)
            o = idx.reshape(h_, w_, 1)
        return take, o

    if interlace == 0:
        _, out = consume(raw, w, h)
    else:  # Adam7: seven independent filtered sub-images, scattered back
        out = np.zeros((h, w, nch), np.uint8)
        pos = 0
        for xs, xst, ys, yst in (
            (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
            (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
        ):
            wp = (w - xs + xst - 1) // xst
            hp = (h - ys + yst - 1) // yst
            if wp <= 0 or hp <= 0:
                continue
            take, o = consume(raw[pos:], wp, hp)
            pos += take
            out[ys::yst, xs::xst] = o
    if color_type == 3:  # palette -> RGB(A) expand (LUT, SURVEY.md §1.3)
        rgb = palette[out[:, :, 0]]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[out[:, :, 0]]])
        return rgb
    return out


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def decode_pnm(data: bytes) -> np.ndarray:
    """Binary netpbm (GDAL's PNM driver; gdal_translate -of PNM): P5 gray /
    P6 RGB, 8-bit maxval only (the GDAL writer's default). Header = magic,
    width, height, maxval as whitespace/comment-separated ASCII tokens;
    the single whitespace byte after maxval starts the raster."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM (P5/P6 magic missing)")
    ch = 1 if data[:2] == b"P5" else 3
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        toks.append(int(data[i:j]))
        i = j
    w, h, maxval = toks
    if maxval != 255:
        raise ValueError(f"PNM maxval {maxval} unsupported (8-bit only)")
    i += 1  # the single whitespace after maxval
    n = w * h * ch
    if len(data) < i + n:
        raise ValueError("truncated PNM raster")
    arr = np.frombuffer(data[i : i + n], dtype=np.uint8).reshape(h, w, ch)
    return arr[:, :, 0] if ch == 1 else arr


def _bmp_rle_decode(d: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """BI_RLE8/BI_RLE4 to a bottom-up [h, w] index array (undefined
    pixels skipped by EOL/delta stay index 0, the Windows convention).
    Escapes: 00 00 = end of line, 00 01 = end of bitmap, 00 02 dx dy =
    delta, 00 n>=3 = absolute run (word-aligned). RLE4 runs alternate
    the two nibbles of the value byte; absolute mode packs nibbles."""
    out = np.zeros((h, w), np.uint8)
    row = col = 0
    i = 0
    while True:
        if i + 2 > len(d):
            raise ValueError("BMP RLE stream truncated (no end-of-bitmap)")
        n, v = d[i], d[i + 1]
        i += 2
        if n > 0:  # encoded run
            if row >= h or col + n > w:
                raise ValueError("BMP RLE run overflows the bitmap")
            if four_bit:
                pair = np.tile(np.array([v >> 4, v & 0x0F], np.uint8), (n + 1) // 2 + 1)
                out[row, col : col + n] = pair[:n]
            else:
                out[row, col : col + n] = v
            col += n
        elif v == 0:  # end of line
            row += 1
            col = 0
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if i + 2 > len(d):
                raise ValueError("BMP RLE delta truncated")
            col += d[i]
            row += d[i + 1]
            i += 2
        else:  # absolute mode: v pixels follow, word-aligned
            nbytes = (v + 1) // 2 if four_bit else v
            if i + nbytes > len(d):
                raise ValueError("BMP RLE absolute run truncated")
            if row >= h or col + v > w:
                raise ValueError("BMP RLE absolute run overflows the bitmap")
            chunk = np.frombuffer(d[i : i + nbytes], np.uint8)
            if four_bit:
                nib = np.empty(nbytes * 2, np.uint8)
                nib[0::2] = chunk >> 4
                nib[1::2] = chunk & 0x0F
                out[row, col : col + v] = nib[:v]
            else:
                out[row, col : col + v] = chunk
            col += v
            i += nbytes + (nbytes & 1)  # pad to word boundary
    return out


def decode_bmp(data: bytes) -> np.ndarray:
    """Windows BMP (the GDAL BMP driver's read surface): BITMAP
    INFO/V4/V5 headers; 1/4/8-bpp palette (packed rows), BI_RLE8/BI_RLE4
    compression, 24-bit BGR and 32-bit BGR(A) pixels with BI_RGB or
    byte-aligned BI_BITFIELDS masks; bottom-up or top-down rows, 4-byte
    row padding. Non-byte masks / truncated rasters fail loudly."""
    import struct as st

    if data[:2] != b"BM":
        raise ValueError("not a BMP (BM magic missing)")
    data_ofs = st.unpack("<I", data[10:14])[0]
    hsz = st.unpack("<I", data[14:18])[0]
    if hsz < 40:
        raise ValueError(f"BMP core header {hsz} unsupported (need BITMAPINFOHEADER+)")
    w, hh, _planes, bpp, comp = st.unpack("<iiHHI", data[18:34])
    top_down = hh < 0
    h = -hh if top_down else hh
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"BMP {bpp}-bpp unsupported (1/4/8/24/32 only)")
    if bpp <= 8:
        pal_ofs = 14 + hsz
        npal = (data_ofs - pal_ofs) // 4
        pal = np.frombuffer(data[pal_ofs : pal_ofs + 4 * npal], dtype=np.uint8).reshape(-1, 4)
        if comp in (1, 2):  # BI_RLE8 / BI_RLE4
            if (comp == 1) != (bpp == 8) or (comp == 2) != (bpp == 4):
                raise ValueError(f"BMP RLE{8 if comp == 1 else 4} needs {8 if comp == 1 else 4}-bpp, got {bpp}")
            if top_down:
                raise ValueError("BMP RLE with top-down rows is invalid")
            idx = _bmp_rle_decode(data[data_ofs:], w, h, four_bit=(comp == 2))[::-1]
        elif comp == 0:
            stride = (w * bpp + 31) // 32 * 4
            if len(data) < data_ofs + stride * h:
                raise ValueError("truncated BMP raster")
            rows = np.frombuffer(data[data_ofs : data_ofs + stride * h], np.uint8).reshape(h, stride)
            if bpp == 8:
                idx = rows[:, :w].copy()
            else:  # MSB-first packed 1/4-bit indices
                bits = np.unpackbits(rows, axis=1)[:, : w * bpp]
                weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
                idx = (bits.reshape(h, w, bpp) * weights).sum(axis=2).astype(np.uint8)
            if not top_down:
                idx = idx[::-1]
        else:
            raise ValueError(f"BMP compression {comp} invalid for {bpp}-bpp")
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError(
                f"BMP palette index {int(idx.max())} outside the {pal.shape[0]}-entry palette"
            )
        return pal[idx][:, :, [2, 1, 0]]  # BGRX quads -> RGB
    if comp == 3 and bpp == 32:
        # byte-aligned BI_BITFIELDS only: map each mask to its byte lane
        masks = st.unpack("<III", data[54:66]) if hsz >= 52 else (0xFF0000, 0xFF00, 0xFF)
        amask = st.unpack("<I", data[66:70])[0] if hsz >= 56 else 0
        lanes = []
        for m in (*masks, amask):
            if m == 0:
                lanes.append(None)
                continue
            if m not in (0xFF, 0xFF00, 0xFF0000, 0xFF000000):
                raise ValueError(f"BMP bitfield mask {m:#x} not byte-aligned")
            lanes.append({0xFF: 0, 0xFF00: 1, 0xFF0000: 2, 0xFF000000: 3}[m])
    elif comp == 0:
        lanes = [2, 1, 0, 3 if bpp == 32 else None]  # BGR(A) order
    else:
        raise ValueError(f"BMP compression {comp} unsupported (BI_RGB/byte BI_BITFIELDS)")
    stride = (w * (bpp // 8) + 3) // 4 * 4
    if len(data) < data_ofs + stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(data[data_ofs : data_ofs + stride * h], dtype=np.uint8)
    px = rows.reshape(h, stride)[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    if not top_down:
        px = px[::-1]
    r, g, b = px[:, :, lanes[0]], px[:, :, lanes[1]], px[:, :, lanes[2]]
    if bpp == 32 and lanes[3] is not None:
        return np.ascontiguousarray(np.dstack([r, g, b, px[:, :, lanes[3]]]))
    return np.ascontiguousarray(np.dstack([r, g, b]))


def encode_bmp(arr: np.ndarray) -> bytes:
    """Windows BMP writer, the inverse subset of decode_bmp: gray [h,w]
    -> 8-bpp with a 256-entry gray palette, RGB [h,w,3] -> 24-bpp BI_RGB,
    RGBA [h,w,4] -> 32-bpp BI_BITFIELDS (BITMAPV4HEADER, the standard
    byte-lane masks B=0xFF G=0xFF00 R=0xFF0000 A=0xFF000000). Bottom-up
    rows, 4-byte-padded stride. decode_bmp(encode_bmp(a)) is identity
    for RGB/RGBA; gray decodes back through the palette as its RGB
    expansion (BMP has no native gray pixel format)."""
    import struct as st

    a = np.asarray(arr, dtype=np.uint8)
    ch = 1 if a.ndim == 2 else a.shape[2]
    if a.ndim not in (2, 3) or ch not in (1, 3, 4):
        raise ValueError(f"BMP encoder needs gray/RGB/RGBA, got shape {a.shape}")
    h, w = a.shape[:2]
    if ch == 1:
        px = a.reshape(h, w, 1)
        pal = bytes(bytearray(v for g in range(256) for v in (g, g, g, 0)))
    elif ch == 3:
        px = a[:, :, ::-1]  # RGB -> BGR
        pal = b""
    else:
        px = a[:, :, [2, 1, 0, 3]]  # RGBA -> BGRA
        pal = b""
    stride = (w * ch + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * ch] = px.reshape(h, w * ch)
    raster = rows[::-1].tobytes()  # bottom-up storage
    if ch == 4:
        # BITMAPV4HEADER: size 108, BI_BITFIELDS masks + sRGB colorspace
        info = st.pack(
            "<IiiHHIIiiII4I", 108, w, h, 1, 32, 3, len(raster), 2835, 2835, 0, 0,
            0x00FF0000, 0x0000FF00, 0x000000FF, 0xFF000000,
        ) + st.pack("<I", 0x73524742) + bytes(48)  # LCS_sRGB
    else:
        info = st.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8 * ch, 0, len(raster), 2835, 2835,
            256 if ch == 1 else 0, 0,
        )
    data_ofs = 14 + len(info) + len(pal)
    hdr = b"BM" + st.pack("<IHHI", data_ofs + len(raster), 0, 0, data_ofs)
    return hdr + info + pal + raster


def sniff_fmt(data: bytes) -> str:
    """Container sniff by magic bytes: 'png' | 'raw' | 'jpeg'. Lets tile
    operators (cutline, re-encode) accept tile sets from any render path
    (render_pyramid(encode='raw') emits RAW1 blobs, the interop path PNG)."""
    if data[:8] == PNG_SIG:
        return "png"
    if data[:4] == b"RAW1":
        return "raw"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:2] in (b"II", b"MM") and len(data) >= 4 and data[2:4] in (
        b"*\x00", b"\x00*",  # classic TIFF (magic 42)
        b"+\x00", b"\x00+",  # BigTIFF (magic 43)
    ):
        return "tiff"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:2] in (b"P5", b"P6") and len(data) > 2 and data[2:3].isspace():
        return "pnm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"GIF8":
        return "gif"
    raise ValueError("unknown tile container (no PNG/RAW1/JPEG/TIFF/WEBP/PNM/BMP/GIF magic)")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode per fmt to uint8 (H,W,C); C in {1,2,3,4}."""
    if fmt == "raw":
        return decode_raw(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpeg":
        from . import jpegcodec

        return jpegcodec.decode_jpeg(data)
    if fmt == "tiff":
        from . import tiffcodec

        return tiffcodec.decode_tiff(data)[0]
    if fmt == "webp":
        from . import webpcodec

        return webpcodec.decode_webp(data)
    if fmt == "pnm":
        return decode_pnm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "gif":
        from . import gifcodec

        return gifcodec.decode_gif(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def to_rgba(arr: np.ndarray) -> np.ndarray:
    """Any decoded (H,W,C) -> RGBA uint8."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    out = np.empty((h, w, 4), dtype=np.uint8)
    if c == 1:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = arr[:, :, 0]
        out[:, :, 3] = 255
    elif c == 2:
        out[:, :, 0] = out[:, :, 1] = out[:, :, 2] = arr[:, :, 0]
        out[:, :, 3] = arr[:, :, 1]
    elif c == 3:
        out[:, :, :3] = arr
        out[:, :, 3] = 255
    else:
        out[:] = arr[:, :, :4]
    return out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (BASELINE.json:15 lossy invariant)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
