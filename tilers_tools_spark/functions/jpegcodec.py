"""Baseline JPEG (ITU T.81) encoder/decoder in NumPy + stdlib — M7
(SURVEY.md §7): exercises the PSNR>=40dB lossy invariant (BASELINE.json:15)
with no PIL/libjpeg on the box [ENV].

Encoder: 8-bit 4:4:4 (or grayscale), JFIF YCbCr, Annex-K quant tables
scaled to quality (libjpeg scaling), standard Huffman tables, single
interleaved scan, byte-stuffed entropy data. Block DCT/quantization is
vectorized over all blocks (einsum); only the entropy coding loops are
Python (documented slow path — tile-sized images are fine).

Decoder: reads DQT/DHT/SOF0/SOS from the stream (so correctness is
self-contained even against other baseline encoders with embedded tables),
16-bit-peek Huffman LUTs, vectorized dequant + IDCT, JFIF YCbCr->RGB.
Supports baseline, non-progressive, 1x1 sampling (what the encoder emits),
optional restart markers.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K quantization tables (natural order)
_QL = np.array(
    [16,11,10,16,24,40,51,61, 12,12,14,19,26,58,60,55, 14,13,16,24,40,57,69,56,
     14,17,22,29,51,87,80,62, 18,22,37,56,68,109,103,77, 24,35,55,64,81,104,113,92,
     49,64,78,87,103,121,120,101, 72,92,95,98,112,100,103,99], dtype=np.int32).reshape(8, 8)
_QC = np.array(
    [17,18,24,47,99,99,99,99, 18,21,26,66,99,99,99,99, 24,26,56,99,99,99,99,99,
     47,66,99,99,99,99,99,99, 99,99,99,99,99,99,99,99, 99,99,99,99,99,99,99,99,
     99,99,99,99,99,99,99,99, 99,99,99,99,99,99,99,99], dtype=np.int32).reshape(8, 8)

# standard Huffman specs: (bits[1..16], values)
_DC_L = ([0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0], list(range(12)))
_DC_C = ([0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0], list(range(12)))
_AC_L = (
    [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,125],
    [0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,0x07,
     0x22,0x71,0x14,0x32,0x81,0x91,0xA1,0x08,0x23,0x42,0xB1,0xC1,0x15,0x52,0xD1,0xF0,
     0x24,0x33,0x62,0x72,0x82,0x09,0x0A,0x16,0x17,0x18,0x19,0x1A,0x25,0x26,0x27,0x28,
     0x29,0x2A,0x34,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,0x46,0x47,0x48,0x49,
     0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,0x65,0x66,0x67,0x68,0x69,
     0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x83,0x84,0x85,0x86,0x87,0x88,0x89,
     0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,0x9A,0xA2,0xA3,0xA4,0xA5,0xA6,0xA7,
     0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,0xC4,0xC5,
     0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,0xE1,0xE2,
     0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,0xE9,0xEA,0xF1,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,
     0xF9,0xFA],
)
_AC_C = (
    [0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,119],
    [0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,0x61,0x71,
     0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xA1,0xB1,0xC1,0x09,0x23,0x33,0x52,0xF0,
     0x15,0x62,0x72,0xD1,0x0A,0x16,0x24,0x34,0xE1,0x25,0xF1,0x17,0x18,0x19,0x1A,0x26,
     0x27,0x28,0x29,0x2A,0x35,0x36,0x37,0x38,0x39,0x3A,0x43,0x44,0x45,0x46,0x47,0x48,
     0x49,0x4A,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5A,0x63,0x64,0x65,0x66,0x67,0x68,
     0x69,0x6A,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7A,0x82,0x83,0x84,0x85,0x86,0x87,
     0x88,0x89,0x8A,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,0x9A,0xA2,0xA3,0xA4,0xA5,
     0xA6,0xA7,0xA8,0xA9,0xAA,0xB2,0xB3,0xB4,0xB5,0xB6,0xB7,0xB8,0xB9,0xBA,0xC2,0xC3,
     0xC4,0xC5,0xC6,0xC7,0xC8,0xC9,0xCA,0xD2,0xD3,0xD4,0xD5,0xD6,0xD7,0xD8,0xD9,0xDA,
     0xE2,0xE3,0xE4,0xE5,0xE6,0xE7,0xE8,0xE9,0xEA,0xF2,0xF3,0xF4,0xF5,0xF6,0xF7,0xF8,
     0xF9,0xFA],
)

_ZIGZAG = np.array(
    [0,1,8,16,9,2,3,10,17,24,32,25,18,11,4,5,12,19,26,33,40,48,41,34,27,20,13,6,7,14,
     21,28,35,42,49,56,57,50,43,36,29,22,15,23,30,37,44,51,58,59,52,45,38,31,39,46,53,
     60,61,54,47,55,62,63], dtype=np.int64)

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(1 / 8) if _k == 0 else 0.5) * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits, values):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _rgb_to_ycc(rgb: np.ndarray):
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) -> (nb, 8, 8), edge-replicated to multiples of 8, row-major MCUs."""
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    p = np.empty((H, W), dtype=np.float64)
    p[:h, :w] = plane
    p[h:, :w] = plane[-1:, :]
    p[:h, w:] = p[:h, w - 1 : w]
    p[h:, w:] = p[h - 1, w - 1]
    return p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def _encode_value(v: int):
    a = abs(v)
    n = a.bit_length()
    return n, (v if v >= 0 else v + (1 << n) - 1)


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge replication on odd dims."""
    h, w = plane.shape
    if h & 1 or w & 1:
        p = np.empty((h + (h & 1), w + (w & 1)), dtype=np.float64)
        p[:h, :w] = plane
        if h & 1:
            p[h, :w] = plane[-1]
        if w & 1:
            p[:h, w] = plane[:, -1]
        if h & 1 and w & 1:
            p[h, w] = plane[-1, -1]
        plane = p
    return (plane[0::2, 0::2] + plane[1::2, 0::2] + plane[0::2, 1::2] + plane[1::2, 1::2]) / 4.0


def encode_jpeg(rgb: np.ndarray, quality: int = 90, subsampling: str = "444") -> bytes:
    """uint8 (H,W,3) RGB (or (H,W)/(H,W,1) gray) -> baseline JFIF bytes.

    subsampling: "444" (default — byte-stable with all pinned goldens) or
    "420" (2x2 box-averaged chroma in T.81 A.2.3 interleaved-MCU order —
    ~25-40% smaller for photographic tiles; the scale path for
    bandwidth-bound JPEG tile sets)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling {subsampling!r} not in ('444', '420')")
    gray = rgb.ndim == 2 or rgb.shape[2] == 1
    if rgb.ndim == 3 and rgb.shape[2] == 1:
        rgb = rgb[:, :, 0]
    h, w = rgb.shape[:2]
    sub420 = subsampling == "420" and not gray
    ql = _scale_q(_QL, quality)
    qc = _scale_q(_QC, quality)
    if gray:
        planes = [(rgb.astype(np.float64), ql, 0)]
    elif sub420:
        y, cb, cr = _rgb_to_ycc(rgb)
        # luma edge-padded to the 16px MCU grid so its block grid is
        # exactly (2*mcuy, 2*mcux); chroma halved then padded to 8
        mcux = (w + 15) // 16
        mcuy = (h + 15) // 16
        ypad = np.empty((mcuy * 16, mcux * 16), dtype=np.float64)
        ypad[:h, :w] = y
        ypad[h:, :w] = y[-1:, :]
        ypad[:, w:] = ypad[:, w - 1 : w]
        planes = [(ypad, ql, 0), (_box2(cb), qc, 1), (_box2(cr), qc, 1)]
    else:
        y, cb, cr = _rgb_to_ycc(rgb)
        planes = [(y, ql, 0), (cb, qc, 1), (cr, qc, 1)]
    # vectorized DCT + quant per plane
    quantized = []
    for plane, q, _tid in planes:
        blocks = _blocks(plane) - 128.0
        coeff = np.einsum("kn,bnm,lm->bkl", _C, blocks, _C)
        qv = np.round(coeff / q).astype(np.int32)
        quantized.append(qv.reshape(-1, 64)[:, _ZIGZAG])
    dc_l = _canonical_codes(*_DC_L)
    ac_l = _canonical_codes(*_AC_L)
    dc_c = _canonical_codes(*_DC_C)
    ac_c = _canonical_codes(*_AC_C)
    bw = _BitWriter()
    preds = [0] * len(planes)

    def emit(ci, blk):
        dct, act = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
        diff = int(blk[0]) - preds[ci]
        preds[ci] = int(blk[0])
        n, bitsv = _encode_value(diff)
        c, ln = dct[n]
        bw.write(c, ln)
        if n:
            bw.write(bitsv, n)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = act[0xF0]
                bw.write(c, ln)
                run -= 16
            n, bitsv = _encode_value(v)
            c, ln = act[(run << 4) | n]
            bw.write(c, ln)
            bw.write(bitsv, n)
            run = 0
        if last < 63:
            c, ln = act[0x00]
            bw.write(c, ln)

    if sub420:
        # interleaved-MCU order (T.81 A.2.3): per MCU, the 2x2 luma
        # blocks raster-ordered, then one Cb, one Cr. _blocks() laid the
        # luma grid out row-major over (2*mcuy, 2*mcux) blocks.
        mcux = (w + 15) // 16
        mcuy = (h + 15) // 16
        ybw = 2 * mcux
        for mi in range(mcux * mcuy):
            my, mx = divmod(mi, mcux)
            for v in range(2):
                for u in range(2):
                    emit(0, quantized[0][(2 * my + v) * ybw + (2 * mx + u)])
            emit(1, quantized[1][mi])
            emit(2, quantized[2][mi])
    else:
        nblocks = quantized[0].shape[0]
        for bi in range(nblocks):
            for ci, zz in enumerate(quantized):
                emit(ci, zz[bi])
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(ql.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qc.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        samp = 0x22 if (sub420 and ci == 0) else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tclass, tid, spec):
        bits, vals = spec
        return seg(0xC4, bytes([tclass << 4 | tid]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _DC_L) + dht(1, 0, _AC_L)
    if not gray:
        out += dht(0, 1, _DC_C) + dht(1, 1, _AC_C)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _build_lut(bits, vals):
    """16-bit-peek LUT: lut[peek16] = (symbol << 5) | codelen."""
    lut = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            lo = code << (16 - ln)
            hi = (code + 1) << (16 - ln)
            lut[lo:hi] = (vals[k] << 5) | ln
            code += 1
            k += 1
        code <<= 1
    return lut


def _entropy_segment(data: bytes, i: int) -> tuple[bytes, int]:
    """Unstuff entropy bytes from offset i up to the next true marker
    (0xFF00 unstuffed, RSTn markers dropped — restart boundaries are
    recovered by interval counting, which byte-aligns identically).
    Returns (bitdata + 4 pad bytes, offset of the terminating marker)."""
    raw = bytearray()
    while i < len(data) - 1:
        b = data[i]
        if b == 0xFF:
            nb = data[i + 1]
            if nb == 0x00:
                raw.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nb <= 0xD7:
                i += 2
                continue
            break
        raw.append(b)
        i += 1
    return bytes(raw) + b"\x00\x00\x00\x00", i


def _color_mode(comps, adobe_transform) -> str:
    """JPEG color interpretation (Adobe tech note #5116 + libjpeg default
    heuristics): 3 components are YCbCr unless APP14 says transform=0 or
    the SOF component ids literally spell 'R','G','B' (both conventions
    real encoders emit — treating such files as YCbCr silently produces
    garbage). 4-component CMYK/YCCK fails loudly per the capability-gate
    policy."""
    nc = len(comps)
    if nc == 1:
        return "gray"
    if nc != 3:
        raise ValueError(f"{nc}-component JPEG (CMYK/YCCK) unsupported")
    if adobe_transform == 0:
        return "rgb"
    if adobe_transform in (None, 1):
        if tuple(c["id"] for c in comps) == (0x52, 0x47, 0x42):  # 'R','G','B'
            return "rgb"
        return "ycc"
    raise ValueError(f"Adobe color transform {adobe_transform} unsupported")


def _reconstruct(coeffs, comps, qt, h, w, hmax, vmax, color="ycc") -> np.ndarray:
    """Zigzag int32 coefficient arrays -> uint8 image (shared by the
    baseline and progressive paths): dequant + vectorized IDCT, crop each
    component to its own extent (ceil(dim*factor/max) — T.81 A.1.1),
    replication chroma upsample, YCbCr -> RGB."""
    planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        zz = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)
        zz[:, _ZIGZAG] = coeffs[ci]
        blocks = zz.reshape(-1, 8, 8) * q
        pix = np.einsum("nk,bkl,ml->bnm", _C.T, blocks, _C.T) + 128.0
        plane = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        if c["v"] != vmax:
            plane = plane.repeat(vmax // c["v"], axis=0)
        if c["h"] != hmax:
            plane = plane.repeat(hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    if color == "rgb":
        return np.clip(np.round(np.dstack(planes)), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def _decode_progressive(data, entropy_pos, payload, comps, h, w, qt, huff, dri, color="ycc"):
    """Progressive (SOF2) scan loop — T.81 G.2, semantics mirrored from the
    published libjpeg jdphuff contract. Coefficients accumulate across
    scans in zigzag order (matching the shared _reconstruct layout):
    DC-first codes diffs at 2^al precision, DC-refine ORs in one bit per
    block, AC-first codes (run, value<<al) bands with EOB-run lengths,
    AC-refine interleaves newly-nonzero +-2^al values with one correction
    bit per already-nonzero coefficient. `entropy_pos` points at the first
    scan's entropy bytes; `payload` is that scan's SOS segment. Huffman /
    quant / DRI segments between scans update in document order."""
    nc = len(comps)
    if nc == 1:
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        # non-interleaved scans walk the component's OWN ceil grid, which
        # can be narrower than the MCU-padded grid (T.81 B.2.3)
        c["cw"] = (-(-w * c["h"] // hmax) + 7) // 8
        c["ch"] = (-(-h * c["v"] // vmax) + 7) // 8
    coeffs = [np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32) for c in comps]
    by_id = {c["id"]: ci for ci, c in enumerate(comps)}

    pos = entropy_pos
    while True:
        ns = payload[0]
        scomps = []  # (component index, dc table id, ac table id)
        for si in range(ns):
            cid, tt = payload[1 + 2 * si : 3 + 2 * si]
            scomps.append((by_id[cid], tt >> 4, tt & 0xF))
        ss, se, a = payload[1 + 2 * ns], payload[2 + 2 * ns], payload[3 + 2 * ns]
        ah, al = a >> 4, a & 0xF
        bitdata, pos = _entropy_segment(data, pos)
        state = {"pos": 0, "eobrun": 0}

        def peek16():
            p = state["pos"]
            chunk = int.from_bytes(bitdata[p >> 3 : (p >> 3) + 4], "big")
            return (chunk >> (16 - (p & 7))) & 0xFFFF

        def get_bits(n):
            if n == 0:
                return 0
            p = state["pos"]
            state["pos"] = p + n
            chunk = int.from_bytes(bitdata[p >> 3 : (p >> 3) + 4], "big")
            return (chunk >> (32 - (p & 7) - n)) & ((1 << n) - 1)

        def hdecode(lut):
            e = int(lut[peek16()])
            sym, ln = e >> 5, e & 31
            if ln == 0:
                raise ValueError("bad Huffman code")
            state["pos"] += ln
            return sym

        def extend(v, n):
            return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v

        p1 = 1 << al
        m1 = -1 << al

        def ac_first(blk, alut):
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                sym = hdecode(alut)
                r, s = sym >> 4, sym & 0xF
                if s:
                    k += r
                    if k > se:
                        break
                    blk[k] = extend(get_bits(s), s) << al
                    k += 1
                else:
                    if r != 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += get_bits(r)
                        break
                    k += 16

        def ac_refine(blk, alut):
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    sym = hdecode(alut)
                    r, s = sym >> 4, sym & 0xF
                    if s:
                        # s must be 1: a newly-nonzero coefficient +-2^al
                        val = p1 if get_bits(1) else m1
                    else:
                        if r != 15:
                            state["eobrun"] = 1 << r
                            if r:
                                state["eobrun"] += get_bits(r)
                            break
                        val = 0  # ZRL: skip 16 zero-history coefficients
                    # advance over r zero-history coefficients, appending a
                    # correction bit to every nonzero one passed on the way
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if get_bits(1) and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val and k <= se:
                        blk[k] = val
                    k += 1
            if state["eobrun"] > 0:
                # EOB region: correction bits for remaining nonzeros
                while k <= se:
                    cur = int(blk[k])
                    if cur != 0:
                        if get_bits(1) and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                state["eobrun"] -= 1

        preds = [0] * nc

        def align_reset():
            state["pos"] = (state["pos"] + 7) // 8 * 8
            state["eobrun"] = 0
            for i in range(nc):
                preds[i] = 0

        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan with se != 0")
            if ns > 1:
                # interleaved DC scan: MCU walk over the global grid
                for mi in range(mcux * mcuy):
                    if dri and mi and mi % dri == 0:
                        align_reset()
                    my, mx = divmod(mi, mcux)
                    for ci, dct, _act in scomps:
                        c = comps[ci]
                        dlut = huff[(0, dct)]
                        for v in range(c["v"]):
                            for u in range(c["h"]):
                                bi = (my * c["v"] + v) * c["bw"] + (mx * c["h"] + u)
                                blk = coeffs[ci][bi]
                                if ah == 0:
                                    sym = hdecode(dlut)
                                    preds[ci] += extend(get_bits(sym), sym)
                                    blk[0] = preds[ci] << al
                                else:
                                    if get_bits(1):
                                        blk[0] = int(blk[0]) | p1
            else:
                ci, dct, _act = scomps[0]
                c = comps[ci]
                dlut = huff[(0, dct)]
                n_blk = c["ch"] * c["cw"]
                for b in range(n_blk):
                    if dri and b and b % dri == 0:
                        align_reset()
                    row, col = divmod(b, c["cw"])
                    blk = coeffs[ci][row * c["bw"] + col]
                    if ah == 0:
                        sym = hdecode(dlut)
                        preds[ci] += extend(get_bits(sym), sym)
                        blk[0] = preds[ci] << al
                    else:
                        if get_bits(1):
                            blk[0] = int(blk[0]) | p1
        else:
            if ns != 1:
                raise ValueError("progressive AC scan must be non-interleaved")
            ci, _dct, act = scomps[0]
            c = comps[ci]
            alut = huff[(1, act)]
            n_blk = c["ch"] * c["cw"]
            fn = ac_first if ah == 0 else ac_refine
            for b in range(n_blk):
                if dri and b and b % dri == 0:
                    align_reset()
                row, col = divmod(b, c["cw"])
                fn(coeffs[ci][row * c["bw"] + col], alut)

        # walk markers to the next SOS (tables may be redefined between
        # scans) or EOI
        payload = None
        while pos < len(data) - 1:
            if data[pos] != 0xFF:
                pos += 1
                continue
            m = data[pos + 1]
            if m == 0xD9:
                break
            if m == 0x01 or 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            pl = data[pos + 4 : pos + 2 + ln]
            pos += 2 + ln
            if m == 0xC4:
                i = 0
                while i < len(pl):
                    tc, th = pl[i] >> 4, pl[i] & 0xF
                    bits = list(pl[i + 1 : i + 17])
                    nv = sum(bits)
                    huff[(tc, th)] = _build_lut(bits, list(pl[i + 17 : i + 17 + nv]))
                    i += 17 + nv
            elif m == 0xDB:
                i = 0
                while i < len(pl):
                    if pl[i] >> 4 != 0:
                        raise ValueError("16-bit quant tables unsupported")
                    tab = np.zeros(64, dtype=np.int32)
                    tab[_ZIGZAG] = np.frombuffer(pl[i + 1 : i + 65], dtype=np.uint8)
                    qt[pl[i] & 0xF] = tab.reshape(8, 8)
                    i += 65
            elif m == 0xDD:
                dri = struct.unpack(">H", pl[:2])[0]
            elif m == 0xDA:
                payload = pl
                break
        if payload is None:
            break
    return _reconstruct(coeffs, comps, qt, h, w, hmax, vmax, color)


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt = {}
    huff = {}
    comps = []
    h = w = None
    restart_interval = 0
    scan = None
    progressive = False
    adobe_transform = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:
            i = 0
            while i < len(payload):
                pq, tq = payload[i] >> 4, payload[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = np.frombuffer(payload[i + 1 : i + 65], dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(payload):
                tc, th = payload[i] >> 4, payload[i] & 0xF
                bits = list(payload[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(payload[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_lut(bits, vals)
                i += 17 + nv
            # noqa
        elif marker in (0xC0, 0xC1, 0xC2):
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline")
            progressive = marker == 0xC2
            comps = []
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    # baseline factors 1-2 cover 4:4:4 / 4:2:2 / 4:4:0 /
                    # 4:2:0 — every layout mainstream encoders emit; 4:1:1
                    # (hi=4) is a DV-tape relic, fail loudly
                    raise ValueError(f"sampling {hi}x{vi} unsupported")
                comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
        elif marker == 0xC3 or (0xC5 <= marker <= 0xCF and marker != 0xC8):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xEE and payload[:5] == b"Adobe":
            adobe_transform = payload[11]
        elif marker == 0xDA:
            color = _color_mode(comps, adobe_transform)
            if progressive:
                return _decode_progressive(
                    data, pos, payload, comps, h, w, qt, huff, restart_interval, color
                )
            ns = payload[0]
            for si in range(ns):
                cid, tt = payload[1 + 2 * si : 3 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tt >> 4
                        c["ac"] = tt & 0xF
            scan = pos
            break
    if scan is None or h is None:
        raise ValueError("truncated JPEG")
    bitdata, _ = _entropy_segment(data, scan)
    # windowed bit reader: O(1) per op (a single big-int stream would cost
    # O(stream) per shift -> O(n^2) decode)
    state = {"pos": 0}

    def peek16():
        p = state["pos"]
        chunk = int.from_bytes(bitdata[p >> 3 : (p >> 3) + 4], "big")
        return (chunk >> (16 - (p & 7))) & 0xFFFF

    def get_bits(n):
        if n == 0:
            return 0
        p = state["pos"]
        state["pos"] = p + n
        chunk = int.from_bytes(bitdata[p >> 3 : (p >> 3) + 4], "big")
        return (chunk >> (32 - (p & 7) - n)) & ((1 << n) - 1)

    def extend(v, n):
        return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v

    nc = len(comps)
    # single-component scans ignore sampling factors (T.81 A.2.2: the MCU
    # is one block); interleaved scans tile MCUs of Hmax x Vmax luma-space
    # 8x8 blocks, each component contributing h x v blocks per MCU
    if nc == 1:
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
    coeffs = [np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32) for c in comps]
    preds = [0] * nc

    def decode_block(ci, c, blk):
        dlut = huff[(0, c["dc"])]
        alut = huff[(1, c["ac"])]
        e = int(dlut[peek16()])
        sym, ln = e >> 5, e & 31
        if ln == 0:
            raise ValueError("bad Huffman code")
        state["pos"] += ln
        diff = extend(get_bits(sym), sym)
        preds[ci] += diff
        blk[0] = preds[ci]
        k = 1
        while k < 64:
            e = int(alut[peek16()])
            sym, ln = e >> 5, e & 31
            if ln == 0:
                raise ValueError("bad Huffman code")
            state["pos"] += ln
            if sym == 0x00:
                break
            if sym == 0xF0:
                k += 16
                continue
            run, size = sym >> 4, sym & 0xF
            k += run
            if k > 63:
                break
            blk[k] = extend(get_bits(size), size)
            k += 1

    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            # byte-align and reset DC predictors at restart boundary
            # (the interval counts MCUs — T.81 B.2.4.4)
            state["pos"] = (state["pos"] + 7) // 8 * 8
            preds = [0] * nc
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            for v in range(c["v"]):
                for u in range(c["h"]):
                    bi = (my * c["v"] + v) * c["bw"] + (mx * c["h"] + u)
                    decode_block(ci, c, coeffs[ci][bi])
    # replication chroma upsample in _reconstruct is libjpeg's
    # do_fancy_upsampling=FALSE contract — simple, deterministic, and
    # exact for the DC-uniform case the KAT pins
    return _reconstruct(coeffs, comps, qt, h, w, hmax, vmax, color)
