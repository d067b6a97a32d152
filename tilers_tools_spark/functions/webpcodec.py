"""Pure-NumPy/stdlib WebP **lossless** (VP8L) codec.

Reference checkout absent (SURVEY.md §0.1); this closes the "WebP" entry
of the round-4 verdict's missing-formats list from public knowledge only:
the VP8L bitstream is specified in RFC 9649 ("WebP Image Format",
lossless section) and every constant below (signature 0x2f, transform
ids, prefix-code layout, code-length-code order, LZ77 prefix coding,
the 120-entry short-distance map, color-cache multiplier 0x1e35a7bd)
is from that spec. No code is taken from libwebp.

Scope
-----
* ``decode_webp``: full VP8L feature set — all four transforms
  (predictor, color, subtract-green, color-indexing with pixel
  bundling), color cache, meta-prefix groups, LZ77 backward
  references, simple and normal prefix codes. Lossy VP8 and
  animation/VP8X-extended features raise ``NotImplementedError``
  (a DCT/bool-coder decoder is out of scope offline — documented
  deviation, same policy as audio/video).
* ``encode_webp``: deterministic lossless encoder. Images with <= 256
  distinct colors use the color-indexing transform (with bundling);
  otherwise subtract-green + per-channel canonical prefix codes.
  No LZ77 / color cache on the encode side (entropy coding only) —
  byte-deterministic output, single pass, vectorized bit packing.

Bit conventions (RFC 9649): bytes are consumed little-endian,
bits LSB-first; ``read(n)`` assembles n bits LSB-first; prefix codes
are read one bit at a time, first bit = most-significant bit of the
canonical code (deflate convention). Canonical code assignment is the
deflate rule (shorter lengths first, ties by symbol order).

Caveat (same epistemic position as the LZW note in ADVICE round 5):
offline there is no external encoder to disconfirm a shared
mis-reading of the spec; the handcrafted bitstreams in
tests/test_webpcodec.py anchor this module to the spec text as
written. First online action item: pin a libwebp-produced fixture.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# spec constants
# --------------------------------------------------------------------------

_SIG = 0x2F
_T_PREDICTOR, _T_COLOR, _T_SUB_GREEN, _T_INDEXING = 0, 1, 2, 3
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_CACHE_MUL = 0x1E35A7BD
_GREEN_BASE = 256 + 24  # literal + length-prefix symbols, before cache

# RFC 9649: the 120 closest (x, y) offsets used by distance codes 1..120
# (code > 120 means distance = code - 120).
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _palette_width_bits(n: int) -> int:
    if n <= 2:
        return 3
    if n <= 4:
        return 2
    if n <= 16:
        return 1
    return 0


# --------------------------------------------------------------------------
# bit io
# --------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader over bytes (RFC 9649 bit order)."""

    __slots__ = ("data", "pos", "acc", "nbits", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.pos] if self.pos < self.n else 0
            if self.pos >= self.n + 8:
                raise ValueError("VP8L bitstream truncated")
            self.acc |= b << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


class _BitWriter:
    """Collects (value, nbits) fields, assembles LSB-first vectorized.

    Prefix-code emission pre-reverses codes so every field is a plain
    LSB-first integer; final assembly ORs each field's bytes into place
    with ``np.bitwise_or.at`` (bit ranges are disjoint by construction,
    so bytewise OR is exact)."""

    def __init__(self):
        self._vals: list[np.ndarray] = []
        self._bits: list[np.ndarray] = []

    def write(self, value: int, nbits: int) -> None:
        assert 0 <= value < (1 << nbits) or nbits == 0
        self._vals.append(np.array([value], np.int64))
        self._bits.append(np.array([nbits], np.int64))

    def write_many(self, values: np.ndarray, nbits: np.ndarray) -> None:
        self._vals.append(values.astype(np.int64, copy=False).ravel())
        self._bits.append(nbits.astype(np.int64, copy=False).ravel())

    def getvalue(self) -> bytes:
        vals = np.concatenate(self._vals) if self._vals else np.zeros(0, np.int64)
        bits = np.concatenate(self._bits) if self._bits else np.zeros(0, np.int64)
        offs = np.zeros(len(bits), np.int64)
        np.cumsum(bits[:-1], out=offs[1:] if len(bits) else offs[:0])
        total = int(bits.sum())
        nbytes = (total + 7) >> 3
        out = np.zeros(nbytes + 8, np.uint8)
        b = offs >> 3
        sh = offs & 7
        v = (vals.astype(np.uint64)) << sh.astype(np.uint64)
        for k in range(4):
            np.bitwise_or.at(out, b + k, ((v >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8))
        return out[:nbytes].tobytes()


# --------------------------------------------------------------------------
# canonical prefix codes
# --------------------------------------------------------------------------


def _canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Deflate canonical code assignment from code lengths."""
    max_l = int(lengths.max()) if len(lengths) else 0
    codes = np.zeros(len(lengths), np.int64)
    if max_l == 0:
        return codes
    bl = np.bincount(lengths, minlength=max_l + 1)
    bl[0] = 0
    next_code = [0] * (max_l + 1)
    code = 0
    for l in range(1, max_l + 1):
        code = (code + int(bl[l - 1])) << 1
        next_code[l] = code
    for s in range(len(lengths)):
        l = int(lengths[s])
        if l:
            codes[s] = next_code[l]
            next_code[l] += 1
    return codes


def _reverse_bits(code: int, n: int) -> int:
    r = 0
    for _ in range(n):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


def _huffman_lengths(freqs: np.ndarray, max_len: int) -> np.ndarray:
    """Length-limited optimal code lengths via boundary package-merge.

    Produces a Kraft-complete code (sum 2^-l == 1) whenever >= 2 symbols
    are used — asserted, because VP8L decoders require complete codes."""
    lengths = np.zeros(len(freqs), np.int32)
    nz = np.nonzero(freqs)[0]
    if len(nz) == 0:
        return lengths
    if len(nz) == 1:
        lengths[nz[0]] = 1
        return lengths
    if (1 << max_len) < len(nz):
        raise ValueError("alphabet too large for length limit")
    coins = sorted((int(freqs[s]), (int(s),)) for s in nz)
    cur = list(coins)
    for _ in range(max_len - 1):
        pk = [
            (cur[i][0] + cur[i + 1][0], cur[i][1] + cur[i + 1][1])
            for i in range(0, len(cur) - 1, 2)
        ]
        cur = sorted(coins + pk)
    for _, syms in cur[: 2 * (len(nz) - 1)]:
        for s in syms:
            lengths[s] += 1
    assert int(sum(1 << (max_len - int(lengths[s])) for s in nz)) == 1 << max_len
    return lengths


class _PrefixDecoder:
    """Decode one canonical prefix code bit-at-a-time (MSB of code first)."""

    __slots__ = ("table", "max_len", "const")

    def __init__(self, lengths):
        lengths = np.asarray(lengths, np.int32)
        nz = np.nonzero(lengths)[0]
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            # degenerate single-symbol code: zero bits per symbol
            self.const = int(nz[0])
            self.table = None
            self.max_len = 0
            return
        self.const = -1
        codes = _canonical_codes(lengths)
        self.table = {
            (int(lengths[s]) << 16) | int(codes[s]): int(s) for s in nz
        }
        self.max_len = int(lengths.max())

    @classmethod
    def simple(cls, symbols: list[int]):
        d = cls.__new__(cls)
        if len(symbols) == 1:
            d.const = symbols[0]
            d.table = None
            d.max_len = 0
        else:
            d.const = -1
            # two symbols: 1-bit codes in LISTED order (first -> 0)
            d.table = {(1 << 16) | 0: symbols[0], (1 << 16) | 1: symbols[1]}
            d.max_len = 1
        return d

    def decode(self, br: _BitReader) -> int:
        if self.const >= 0:
            return self.const
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = table.get((length << 16) | code)
            if sym is not None:
                return sym
            if length > self.max_len:
                raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixDecoder:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        is_8bit = br.read(1)
        sym0 = br.read(8 if is_8bit else 1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        return _PrefixDecoder.simple(syms)
    num_codes = br.read(4) + 4
    cl_lens = np.zeros(19, np.int32)
    for i in range(num_codes):
        cl_lens[_CL_ORDER[i]] = br.read(3)
    cl_dec = _PrefixDecoder(cl_lens)
    if br.read(1):  # explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = np.zeros(alphabet_size, np.int32)
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = cl_dec.decode(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev_len = code
        elif code == 16:
            rep, fill = 3 + br.read(2), prev_len
            lengths[symbol : symbol + rep] = fill
            symbol += rep
        elif code == 17:
            symbol += 3 + br.read(3)
        else:
            symbol += 11 + br.read(7)
    if symbol > alphabet_size:
        raise ValueError("code lengths overflow alphabet")
    return _PrefixDecoder(lengths)


# --------------------------------------------------------------------------
# decoding
# --------------------------------------------------------------------------


def _prefix_value(br: _BitReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _plane_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def _decode_entropy_image(br: _BitReader, w: int, h: int, level0: bool):
    """Decode one entropy-coded ARGB image -> (flat uint32 array, used a
    color cache?). level0 adds the meta-prefix layer (spatially-coded)."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("invalid color cache size")
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        meta_w = _subsample(w, meta_bits)
        meta_img = _decode_entropy_image(br, meta_w, _subsample(h, meta_bits), False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(br, _GREEN_BASE + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))
    n = w * h
    out = np.zeros(n, np.uint32)
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gi = int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        sym = g_green.decode(br)
        if sym < 256:
            r = g_red.decode(br)
            b = g_blue.decode(br)
            a = g_alpha.decode(br)
            px = (a << 24) | (r << 16) | (sym << 8) | b
            out[pos] = px
            if cache_bits:
                cache[(_CACHE_MUL * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
        elif sym < _GREEN_BASE:
            length = _prefix_value(br, sym - 256)
            dist = _plane_to_dist(_prefix_value(br, g_dist.decode(br)), w)
            if dist > pos or pos + length > n:
                raise ValueError("invalid LZ77 reference")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_bits:
                    cache[(_CACHE_MUL * px & 0xFFFFFFFF) >> cache_shift] = px
                pos += 1
        else:
            out[pos] = cache[sym - _GREEN_BASE]
            pos += 1
    return out


def _to_channels(px: np.ndarray):
    """flat uint32 ARGB -> int32 (n,) a, r, g, b."""
    px = px.astype(np.int64)
    return (
        (px >> 24) & 0xFF,
        (px >> 16) & 0xFF,
        (px >> 8) & 0xFF,
        px & 0xFF,
    )


def _from_channels(a, r, g, b) -> np.ndarray:
    return (
        ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)
    ).astype(np.uint32)


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    a, r, g, b = _to_channels(px)
    return _from_channels(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5, arithmetic shift."""
    ts = np.where(t > 127, t - 256, t)
    cs = np.where(c > 127, c - 256, c)
    return (ts * cs) >> 5


def _inv_color_transform(px: np.ndarray, w: int, h: int, bits: int, sub: np.ndarray):
    a, r, g, b = _to_channels(px)
    sw = _subsample(w, bits)
    xs = np.arange(w) >> bits
    ys = np.arange(h) >> bits
    cte = sub.astype(np.int64)[(ys[:, None] * sw + xs[None, :])].ravel()
    g2r = cte & 0xFF  # stored in the blue channel
    g2b = (cte >> 8) & 0xFF  # green channel
    r2b = (cte >> 16) & 0xFF  # red channel
    r = (r + _ct_delta(g2r, g)) & 0xFF
    b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    return _from_channels(a, r, g, b)


def _avg2(p, q):
    return tuple((p[c] + q[c]) >> 1 for c in range(4))


def _inv_predictor(px: np.ndarray, w: int, h: int, bits: int, sub: np.ndarray):
    """Sequential predictor inverse (scanline order; each pixel depends on
    reconstructed neighbors). TR of the last column is the linearized
    neighbor index i - w + 1 == first pixel of the current row."""
    n = w * h
    res = np.stack(_to_channels(px), axis=1).astype(np.int64)  # (n,4) ARGB
    out = np.zeros((n, 4), np.int64)
    modes = ((sub.astype(np.int64) >> 8) & 0xFF).tolist()
    sw = _subsample(w, bits)
    resl = res.tolist()
    outl = out.tolist()
    for i in range(n):
        x = i % w
        y = i // w
        if i == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = outl[i - 1]
        elif x == 0:
            pred = outl[i - w]
        else:
            mode = modes[(y >> bits) * sw + (x >> bits)]
            L = outl[i - 1]
            T = outl[i - w]
            if mode == 0:
                pred = (255, 0, 0, 0)
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = outl[i - w + 1]
            elif mode == 4:
                pred = outl[i - w - 1]
            elif mode == 5:
                pred = _avg2(_avg2(L, outl[i - w + 1]), T)
            elif mode == 6:
                pred = _avg2(L, outl[i - w - 1])
            elif mode == 7:
                pred = _avg2(L, T)
            elif mode == 8:
                pred = _avg2(outl[i - w - 1], T)
            elif mode == 9:
                pred = _avg2(T, outl[i - w + 1])
            elif mode == 10:
                TL = outl[i - w - 1]
                TR = outl[i - w + 1]
                pred = _avg2(_avg2(L, TL), _avg2(T, TR))
            elif mode == 11:
                TL = outl[i - w - 1]
                d = sum(abs(L[c] - TL[c]) - abs(T[c] - TL[c]) for c in range(4))
                pred = T if d <= 0 else L
            elif mode == 12:
                TL = outl[i - w - 1]
                pred = tuple(
                    min(255, max(0, L[c] + T[c] - TL[c])) for c in range(4)
                )
            elif mode == 13:
                TL = outl[i - w - 1]
                pred = []
                for c in range(4):
                    ave = (L[c] + T[c]) >> 1
                    d = ave - TL[c]
                    half = d // 2 if d >= 0 else -((-d) // 2)
                    pred.append(min(255, max(0, ave + half)))
            else:
                raise ValueError(f"invalid predictor mode {mode}")
        rr = resl[i]
        outl[i] = [(rr[c] + pred[c]) & 0xFF for c in range(4)]
    o = np.asarray(outl, np.int64)
    return _from_channels(o[:, 0], o[:, 1], o[:, 2], o[:, 3])


def _inv_color_indexing(px: np.ndarray, full_w: int, h: int, wb: int, palette: np.ndarray):
    if wb == 0:
        idx = ((px >> 8) & 0xFF).astype(np.int64)
    else:
        bits_per = 8 >> wb
        packed_w = _subsample(full_w, wb)
        g = ((px >> 8) & 0xFF).astype(np.int64).reshape(h, packed_w)
        xs = np.arange(full_w)
        k = (xs & ((1 << wb) - 1)) * bits_per
        idx = (g[:, xs >> wb] >> k[None, :]) & ((1 << bits_per) - 1)
        idx = idx.ravel()
    out = np.zeros(len(idx), np.uint32)
    ok = idx < len(palette)
    out[ok] = palette[idx[ok]]
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """WebP container -> RGBA uint8 (H,W,4). VP8L (lossless) only."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP magic missing)")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            payload = body
            break
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 decode not supported offline (no DCT/bool-coder "
                "codec on box); re-encode lossless upstream"
            )
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk in WebP container")
    br = _BitReader(payload)
    if br.read(8) != _SIG:
        raise ValueError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    cur_w = w
    transforms = []
    seen = set()
    while br.read(1):
        tt = br.read(2)
        if tt in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(tt)
        if tt in (_T_PREDICTOR, _T_COLOR):
            bits = br.read(3) + 2
            sub = _decode_entropy_image(
                br, _subsample(cur_w, bits), _subsample(h, bits), False
            )
            transforms.append((tt, bits, sub, cur_w))
        elif tt == _T_SUB_GREEN:
            transforms.append((tt, 0, None, cur_w))
        else:
            psize = br.read(8) + 1
            deltas = _decode_entropy_image(br, psize, 1, False)
            ch = np.stack(_to_channels(deltas), axis=1)
            pal = np.cumsum(ch, axis=0) & 0xFF
            palette = _from_channels(pal[:, 0], pal[:, 1], pal[:, 2], pal[:, 3])
            wb = _palette_width_bits(psize)
            transforms.append((tt, wb, palette, cur_w))
            cur_w = _subsample(cur_w, wb)
    px = _decode_entropy_image(br, cur_w, h, True)
    for tt, bits, aux, t_w in reversed(transforms):
        if tt == _T_INDEXING:
            px = _inv_color_indexing(px, t_w, h, bits, aux)
        elif tt == _T_SUB_GREEN:
            px = _inv_subtract_green(px)
        elif tt == _T_COLOR:
            px = _inv_color_transform(px, t_w, h, bits, aux)
        else:
            px = _inv_predictor(px, t_w, h, bits, aux)
    a, r, g, b = _to_channels(px)
    out = np.empty((h, w, 4), np.uint8)
    out[:, :, 0] = r.reshape(h, w)
    out[:, :, 1] = g.reshape(h, w)
    out[:, :, 2] = b.reshape(h, w)
    out[:, :, 3] = a.reshape(h, w)
    return out


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------


def _write_prefix_code(bw: _BitWriter, freqs: np.ndarray):
    """Emit one prefix-code description; return (rev_code, len) LUT arrays
    for symbol emission (codes pre-reversed for the LSB-first writer)."""
    alphabet = len(freqs)
    nz = np.nonzero(freqs)[0]
    rcodes = np.zeros(alphabet, np.int64)
    lens = np.zeros(alphabet, np.int64)
    if len(nz) <= 2 and (len(nz) == 0 or int(nz.max()) <= 255):
        bw.write(1, 1)  # simple
        syms = [int(s) for s in nz] or [0]
        bw.write(len(syms) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(syms[0], 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            rcodes[syms[0]], lens[syms[0]] = 0, 1
            rcodes[syms[1]], lens[syms[1]] = 1, 1
        return rcodes, lens
    lengths = _huffman_lengths(freqs, 15)
    codes = _canonical_codes(lengths)
    for s in nz:
        lens[s] = int(lengths[s])
        rcodes[s] = _reverse_bits(int(codes[s]), int(lengths[s]))
    # run-length ops over the full alphabet: literals + zero-runs (17/18)
    ops: list[tuple[int, int, int]] = []  # (cl_symbol, extra_val, extra_bits)
    i = 0
    while i < alphabet:
        if lengths[i] == 0:
            j = i
            while j < alphabet and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                r = min(run, 138)
                ops.append((18, r - 11, 7))
                run -= r
            while run >= 3:
                r = min(run, 10)
                ops.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                ops.append((0, 0, 0))
            i = j
        else:
            ops.append((int(lengths[i]), 0, 0))
            i += 1
    cl_freq = np.zeros(19, np.int64)
    for sym, _, _ in ops:
        cl_freq[sym] += 1
    cl_used = np.nonzero(cl_freq)[0]
    if len(cl_used) == 1:
        # pad to a complete 2-leaf code (spec-legal; one leaf unused)
        cl_lens = np.zeros(19, np.int32)
        s = int(cl_used[0])
        cl_lens[s] = 1
        cl_lens[0 if s != 0 else 1] = 1
    else:
        cl_lens = _huffman_lengths(cl_freq, 7)
    cl_codes = _canonical_codes(cl_lens)
    num_codes = max(
        4, max(i + 1 for i, s in enumerate(_CL_ORDER) if cl_lens[s]) if cl_lens.any() else 4
    )
    bw.write(0, 1)  # normal
    bw.write(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write(int(cl_lens[_CL_ORDER[i]]), 3)
    bw.write(0, 1)  # no explicit max-symbol
    for sym, extra_val, extra_bits in ops:
        bw.write(_reverse_bits(int(cl_codes[sym]), int(cl_lens[sym])), int(cl_lens[sym]))
        if extra_bits:
            bw.write(extra_val, extra_bits)
    return rcodes, lens


def _encode_entropy_image(bw: _BitWriter, px: np.ndarray, level0: bool):
    """Entropy-code a flat uint32 ARGB pixel array: no cache, no meta, no
    LZ77 — four per-channel canonical prefix codes + vectorized emission."""
    a, r, g, b = _to_channels(px)
    bw.write(0, 1)  # no color cache
    if level0:
        bw.write(0, 1)  # no meta-prefix image
    lut = []
    for chan, alphabet in ((g, _GREEN_BASE), (r, 256), (b, 256), (a, 256)):
        freqs = np.bincount(chan.astype(np.int64), minlength=alphabet)
        lut.append(_write_prefix_code(bw, freqs))
    _write_prefix_code(bw, np.zeros(40, np.int64))  # distance code: unused
    # emission order per pixel: green, red, blue, alpha
    order = (g, r, b, a)
    n = len(px)
    codes = np.empty((n, 4), np.int64)
    bits = np.empty((n, 4), np.int64)
    for k in range(4):
        rc, ln = lut[k]
        codes[:, k] = rc[order[k]]
        bits[:, k] = ln[order[k]]
    bw.write_many(codes.ravel(), bits.ravel())


def encode_webp(arr: np.ndarray) -> bytes:
    """uint8 (H,W) / (H,W,3) / (H,W,4) -> lossless WebP (VP8L) bytes.

    Deterministic: <= 256 distinct colors -> color-indexing transform
    (palette in first-seen scanline order, bundled when <= 16 entries);
    otherwise subtract-green. Entropy coding only (no LZ77/cache)."""
    from . import codecs

    rgba = codecs.to_rgba(np.asarray(arr))
    h, w = rgba.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("VP8L dimensions must be in [1, 16384]")
    px = _from_channels(
        rgba[:, :, 3].astype(np.int64).ravel(),
        rgba[:, :, 0].astype(np.int64).ravel(),
        rgba[:, :, 1].astype(np.int64).ravel(),
        rgba[:, :, 2].astype(np.int64).ravel(),
    )
    bw = _BitWriter()
    bw.write(_SIG, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(int((rgba[:, :, 3] != 255).any()), 1)
    bw.write(0, 3)  # version
    uniq, inv = np.unique(px, return_inverse=True)
    if len(uniq) <= 256:
        # palette in first-appearance order (scanline), like a real encoder
        first_pos = np.full(len(uniq), len(px), np.int64)
        np.minimum.at(first_pos, inv, np.arange(len(px)))
        order = np.argsort(first_pos, kind="stable")
        palette = uniq[order]
        remap = np.empty(len(uniq), np.int64)
        remap[order] = np.arange(len(uniq))
        idx = remap[inv]
        psize = len(palette)
        bw.write(1, 1)  # a transform follows
        bw.write(_T_INDEXING, 2)
        bw.write(psize - 1, 8)
        pal_ch = np.stack(_to_channels(palette), axis=1)
        deltas = np.diff(np.vstack([[[0, 0, 0, 0]], pal_ch]), axis=0) & 0xFF
        pal_px = _from_channels(deltas[:, 0], deltas[:, 1], deltas[:, 2], deltas[:, 3])
        _encode_entropy_image(bw, pal_px, level0=False)
        bw.write(0, 1)  # no more transforms
        wb = _palette_width_bits(psize)
        if wb:
            bits_per = 8 >> wb
            packed_w = _subsample(w, wb)
            gi = np.zeros((h, packed_w), np.int64)
            im = idx.reshape(h, w)
            for k in range(1 << wb):
                cols = np.arange(k, w, 1 << wb)
                gi[:, : len(cols)] |= im[:, cols] << (k * bits_per)
            green = gi.ravel()
        else:
            green = idx
        coded = _from_channels(
            np.full(len(green), 255, np.int64),
            np.zeros(len(green), np.int64),
            green,
            np.zeros(len(green), np.int64),
        )
        _encode_entropy_image(bw, coded, level0=True)
    else:
        bw.write(1, 1)
        bw.write(_T_SUB_GREEN, 2)
        bw.write(0, 1)  # no more transforms
        a, r, g, b = _to_channels(px)
        coded = _from_channels(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
        _encode_entropy_image(bw, coded, level0=True)
    payload = bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
