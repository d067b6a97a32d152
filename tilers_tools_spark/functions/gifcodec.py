"""GIF (87a/89a) codec — decode to the engine's uint8 RGB/RGBA contract.

Implements the published GIF89a specification: logical screen descriptor,
global/local color tables, graphic-control extension (transparency),
interlaced row order (the 8/8/4/2 four-pass scheme), and GIF-LZW —
variable-width codes packed LSB-FIRST into 255-byte-max sub-blocks
(the opposite bit order of TIFF LZW in functions/tiffcodec.py), width
growing when the decoder table reaches 2^width, capped at 12 bits until
a CLEAR code resets it.

Scope (matching the GDAL GIF driver's read contract): the FIRST image
frame is the raster; animation frames after it are ignored. A frame
with transparency decodes to RGBA (alpha 0 at the transparent index),
otherwise RGB. Unknown extension blocks are skipped by their sub-block
structure. Anything structurally off — missing color table, bad LZW
code, truncated stream — fails loudly; no silent mis-decode.

The encoder writes single-frame GIFs using the documented
"uncompressed GIF" technique: only literal root codes are emitted while
mirroring the decoder's table growth for the width schedule, with a
CLEAR whenever the table would exceed 12 bits. Larger than real LZW
output but bit-exact on decode by construction — it exists for
roundtrips and the tile-container pass-through path, not compression.
"""

from __future__ import annotations

import numpy as np

_TRAILER = 0x3B
_EXTENSION = 0x21
_IMAGE_SEP = 0x2C
_GCE = 0xF9


class _BitReaderLSB:
    """LSB-first bit reader over concatenated data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF LZW stream truncated")
            self.bitbuf |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.bitbuf & ((1 << width) - 1)
        self.bitbuf >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-LZW to index bytes. Stops once n_pixels are produced (some
    writers omit the explicit EOI); raises on a code beyond the table."""
    if not (2 <= min_code_size <= 8):
        raise ValueError(f"GIF LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _BitReaderLSB(data)
    out = bytearray()

    table: list[bytes] = []
    width = 0

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset()
    prev: int | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError(f"GIF LZW first code {code} not a root")
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError(f"GIF LZW code {code} beyond table {len(table)}")
            out += entry
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = code
    if len(out) < n_pixels:
        raise ValueError(f"GIF LZW produced {len(out)} of {n_pixels} pixels")
    return out[:n_pixels]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Inverse of the GIF 4-pass interlace: stored row order is passes
    0,8,16.. / 4,12.. / 2,6.. / 1,3,5.. of the display image."""
    h = rows.shape[0]
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order, dtype=np.int64)] = rows
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF to uint8 [h, w, 3] (or [h, w, 4] when the
    graphic-control extension declares a transparent index)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (GIF87a/GIF89a magic missing)")
    pos = 6
    packed = data[pos + 4]
    has_gct = bool(packed & 0x80)
    gct_n = 2 << (packed & 0x07)
    pos += 7  # logical screen descriptor
    gct = None
    if has_gct:
        if len(data) < pos + 3 * gct_n:
            raise ValueError("GIF global color table truncated")
        gct = np.frombuffer(data[pos : pos + 3 * gct_n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * gct_n

    transparent: int | None = None
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated before an image frame")
        b = data[pos]
        pos += 1
        if b == _TRAILER:
            raise ValueError("GIF has no image frame")
        if b == _EXTENSION:
            label = data[pos]
            pos += 1
            if label == _GCE:
                sz = data[pos]
                if sz != 4:
                    raise ValueError(f"GIF graphic-control block size {sz} != 4")
                flags = data[pos + 1]
                if flags & 0x01:
                    transparent = data[pos + 4]
            # skip this and any extension's sub-blocks
            while True:
                sz = data[pos]
                pos += 1 + sz
                if sz == 0:
                    break
            continue
        if b != _IMAGE_SEP:
            raise ValueError(f"GIF unknown block 0x{b:02x}")
        break

    if pos + 9 > len(data):
        raise ValueError("GIF image descriptor truncated")
    w = int.from_bytes(data[pos + 4 : pos + 6], "little")
    h = int.from_bytes(data[pos + 6 : pos + 8], "little")
    ipacked = data[pos + 8]
    pos += 9
    if w < 1 or h < 1:
        raise ValueError(f"GIF frame {w}x{h} invalid")
    interlaced = bool(ipacked & 0x40)
    pal = gct
    if ipacked & 0x80:  # local color table wins
        lct_n = 2 << (ipacked & 0x07)
        if len(data) < pos + 3 * lct_n:
            raise ValueError("GIF local color table truncated")
        pal = np.frombuffer(data[pos : pos + 3 * lct_n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * lct_n
    if pal is None:
        raise ValueError("GIF frame has neither global nor local color table")

    min_code_size = data[pos]
    pos += 1
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF image data truncated (no block terminator)")
        sz = data[pos]
        pos += 1
        if sz == 0:
            break
        chunks.append(data[pos : pos + sz])
        if len(chunks[-1]) != sz:
            raise ValueError("GIF data sub-block truncated")
        pos += sz

    idx = np.frombuffer(
        bytes(_lzw_decode(b"".join(chunks), min_code_size, w * h)), dtype=np.uint8
    ).reshape(h, w)
    if interlaced:
        idx = _deinterlace(idx)
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError(
            f"GIF pixel index {int(idx.max())} outside the {pal.shape[0]}-entry palette"
        )
    rgb = pal[idx]
    if transparent is None:
        return rgb
    alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
    return np.dstack([rgb, alpha])


class _BitWriterLSB:
    def __init__(self):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.bitbuf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.nbits = 0
        return bytes(self.out)


def encode_gif(
    arr: np.ndarray,
    palette: np.ndarray | None = None,
    transparent: int | None = None,
    interlaced: bool = False,
) -> bytes:
    """Single-frame GIF89a. `arr` is either [h, w] uint8 palette indices
    (with `palette` [n, 3] uint8) or an [h, w, 3] uint8 RGB image with at
    most 256 distinct colors (palette derived, row-major first-seen
    order). Root-codes-only LZW (decoder-mirrored width schedule)."""
    a = np.asarray(arr)
    if a.ndim == 3 and a.shape[2] == 3:
        flat = a.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if pal.shape[0] > 256:
            raise ValueError(f"GIF needs <= 256 colors, image has {pal.shape[0]}")
        palette = pal.astype(np.uint8)
        idx = inv.astype(np.uint8).reshape(a.shape[:2])
    elif a.ndim == 2:
        if palette is None:
            raise ValueError("index input needs an explicit palette")
        palette = np.asarray(palette, dtype=np.uint8)
        idx = a.astype(np.uint8)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of range")
    else:
        raise ValueError(f"GIF encoder needs [h,w] indices or [h,w,3] RGB, got {a.shape}")
    h, w = idx.shape
    n = max(2, palette.shape[0])
    size_pow = max(1, int(n - 1).bit_length())  # table size 2^size_pow >= n
    pal_full = np.zeros((2 << (size_pow - 1), 3), np.uint8)
    pal_full[: palette.shape[0]] = palette

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | ((size_pow - 1) & 0x07))  # GCT present, size
    out += b"\x00\x00"  # bg index, aspect
    out += pal_full.tobytes()
    if transparent is not None:
        out += bytes([_EXTENSION, _GCE, 4, 0x01, 0, 0, transparent & 0xFF, 0])
    out.append(_IMAGE_SEP)
    out += b"\x00\x00\x00\x00" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x40 if interlaced else 0x00)

    mcs = max(2, size_pow)
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriterLSB()
    width = mcs + 1
    table_len = eoi + 1
    bw.write(clear, width)
    rows = idx
    if interlaced:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = idx[np.asarray(order, dtype=np.int64)]
    first = True
    for v in rows.reshape(-1).tolist():
        bw.write(int(v), width)
        if first:  # decoder adds no entry for the first post-clear code
            first = False
            continue
        table_len += 1  # mirror the decoder's table growth
        if table_len == (1 << width):
            if width < 12:
                width += 1
            else:
                bw.write(clear, width)
                width = mcs + 1
                table_len = eoi + 1
                first = True
    bw.write(eoi, width)
    payload = bw.flush()

    out.append(mcs)
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += bytes([0, _TRAILER])
    return bytes(out)
