"""VP8L (lossless WebP) codec tests.

Two layers, same policy as tests/test_tiffcodec.py:

1. **Handcrafted spec bytes** — bitstreams composed bit-by-bit IN THIS
   FILE from RFC 9649's published layout (signature, 14-bit dims,
   simple/normal prefix codes, code-length-code order, LZ77 prefix
   values, short-distance map, color cache hash, all four transforms).
   The composer below is an independent 6-line LSB-first bit packer, so
   a writer/reader shared bug in the engine cannot hide.
2. **Roundtrips** — encode_webp -> decode_webp must be the identity on
   RGBA pixels for palette, subtract-green, bundled and non-bundled
   paths.

Offline caveat (mirrors the LZW note in ADVICE round 5): no external
encoder exists in this environment, so these KATs anchor the engine to
the spec *as read*; pinning a libwebp fixture is the first online
action item.
"""

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.functions import webpcodec as W


def bits_to_bytes(fields):
    """Independent LSB-first packer: fields = [(value, nbits), ...]."""
    acc = 0
    n = 0
    for v, nb in fields:
        assert 0 <= v < (1 << nb)
        acc |= v << n
        n += nb
    return acc.to_bytes((n + 7) // 8, "little")


def container(payload: bytes) -> bytes:
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def header(w, h, alpha=0):
    return [(0x2F, 8), (w - 1, 14), (h - 1, 14), (alpha, 1), (0, 3)]


def simple1(sym):
    """Simple prefix code, one symbol, 8-bit form -> zero bits/symbol."""
    return [(1, 1), (0, 1), (1, 1), (sym, 8)]


def simple2(s0, s1):
    """Simple prefix code, two symbols -> 1 bit each, listed order."""
    return [(1, 1), (1, 1), (1, 1), (s0, 8), (s1, 8)]


def no_transform_cache_meta():
    return [(0, 1), (0, 1), (0, 1)]  # transforms end, no cache, no meta


def test_kat_1x1_literal():
    # one red pixel; all five codes are 1-symbol -> pixel costs 0 bits
    f = header(1, 1)
    f += no_transform_cache_meta()
    f += simple1(0)  # green
    f += simple1(255)  # red
    f += simple1(0)  # blue
    f += simple1(255)  # alpha
    f += simple1(0)  # distance (unused)
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out.shape == (1, 1, 4)
    assert out[0, 0].tolist() == [255, 0, 0, 255]


def test_kat_two_symbol_listed_order():
    # 2x1; green simple code lists symbols [7, 3]: first listed -> bit 0.
    f = header(2, 1)
    f += no_transform_cache_meta()
    f += simple2(7, 3)  # green
    f += simple1(1)  # red
    f += simple1(2)  # blue
    f += simple1(255)  # alpha
    f += simple1(0)  # distance
    f += [(1, 1), (0, 1)]  # pixel0 green=3 (bit 1), pixel1 green=7 (bit 0)
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out[0, 0].tolist() == [1, 3, 2, 255]
    assert out[0, 1].tolist() == [1, 7, 2, 255]


def normal_green_code_two_syms(g_lit, high_sym, alphabet=280):
    """Normal prefix code over the green alphabet with exactly two 1-bit
    codes: green literal `g_lit` -> 0, `high_sym` -> 1.

    Code-length code: symbols {0, 1, 17, 18} all 2 bits -> canonical
    codes 00, 01, 10, 11 in symbol order. kOrder positions: 17@0, 18@1,
    0@2, 1@3 -> 4 entries. Prefix-code bits go into the LSB-first stream
    MSB-of-code first, so each code field below is the BIT-REVERSED
    canonical code: 0 -> 0b00, 1 -> 0b10, 17 -> 0b01, 18 -> 0b11.
    """
    f = [(0, 1)]  # not simple
    f += [(0, 4)]  # num_code_lengths = 4
    f += [(2, 3), (2, 3), (2, 3), (2, 3)]  # lens for 17, 18, 0, 1
    f += [(0, 1)]  # no explicit max-symbol
    ops = []

    def zeros(run):
        while run >= 11:
            r = min(run, 138)
            ops.append((3, 2))  # cl sym 18 -> code 11 reversed 11
            ops.append((r - 11, 7))
            run -= r
        while run >= 3:
            r = min(run, 10)
            ops.append((1, 2))  # cl sym 17 -> code 10 reversed 01
            ops.append((r - 3, 3))
            run -= r
        for _ in range(run):
            ops.append((0, 2))  # literal zero -> code 00

    zeros(g_lit)
    ops.append((2, 2))  # literal length 1 -> code 01 reversed 10
    zeros(high_sym - g_lit - 1)
    ops.append((2, 2))
    zeros(alphabet - high_sym - 1)
    return f + ops


def test_kat_lz77_short_distance():
    # 4x1: literal green=5 pixel, then length-3 copy at distance 1 via
    # plane code 2 = offset (1, 0) in the published short-distance map.
    # green symbol 258 -> length prefix code 2 -> length 3 (no extra bits);
    # distance simple code {1} -> prefix value 2 -> plane 2 -> dist 1.
    f = header(4, 1)
    f += no_transform_cache_meta()
    f += normal_green_code_two_syms(5, 258)
    f += simple1(10)  # red
    f += simple1(20)  # blue
    f += simple1(255)  # alpha
    f += simple1(1)  # distance
    f += [(0, 1), (1, 1)]  # green literal 5 (code 0), then symbol 258 (code 1)
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out.shape == (1, 4, 4)
    for x in range(4):
        assert out[0, x].tolist() == [10, 5, 20, 255]


def test_kat_lz77_long_distance_prefix():
    # 3x2: pixel row copied via plane code 121+3-1... uses code > 120:
    # distance = plane - 120. Want dist=3 (copy whole prior row at w=3):
    # plane 123 -> prefix: 123 in [97..128] -> prefix code 13, 5 extra
    # bits, value = 96 + extra + 1 -> extra = 26.
    f = header(3, 2)
    f += no_transform_cache_meta()
    f += normal_green_code_two_syms(9, 257)  # 257 -> length prefix 1 -> 2
    f += simple1(1)
    f += simple1(2)
    f += simple1(255)
    f += simple1(13)  # distance prefix symbol 13 (zero bits)
    # pixels: 3 literals, then symbol 257 (length 2) + 5 extra dist bits,
    # then literal for the final pixel
    f += [(0, 1), (0, 1), (0, 1), (1, 1), (26, 5), (0, 1)]
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert (out[1, :2] == out[0, :2]).all()
    assert out[1, 2].tolist() == [1, 9, 2, 255]


def test_kat_color_cache():
    # 2x1 with a 1-bit color cache: literal pixel, then cache hit.
    px = (255 << 24) | (77 << 16) | (200 << 8) | 3  # ARGB
    slot = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> 31
    # green alphabet = 280 + 2; used symbols: 200 (literal) and 280+slot
    f = header(2, 1)
    f += [(0, 1)]  # no transforms
    f += [(1, 1), (1, 4)]  # cache used, cache_bits = 1
    f += [(0, 1)]  # no meta
    f += normal_green_code_two_syms(200, 280 + slot, alphabet=282)
    f += simple1(77)
    f += simple1(3)
    f += simple1(255)
    f += simple1(0)
    f += [(0, 1), (1, 1)]  # literal, then cache reference
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out[0, 0].tolist() == [77, 200, 3, 255]
    assert out[0, 1].tolist() == [77, 200, 3, 255]


def sub_image_1px(a, r, g, b):
    """Entropy-coded 1x1 sub-image (no meta layer): no cache + 5 codes."""
    return (
        [(0, 1)]
        + simple1(g)
        + simple1(r)
        + simple1(b)
        + simple1(a)
        + simple1(0)
    )


def test_kat_subtract_green():
    # 1x1, subtract-green: stored (r', b') = (r-g, b-g) mod 256.
    f = header(1, 1)
    f += [(1, 1), (2, 2)]  # one transform: subtract green
    f += [(0, 1)]  # no more transforms
    f += [(0, 1), (0, 1)]  # no cache, no meta
    f += simple1(100)  # green
    f += simple1((30 - 100) % 256)  # red residual
    f += simple1((250 - 100) % 256)  # blue residual
    f += simple1(255)
    f += simple1(0)
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out[0, 0].tolist() == [30, 100, 250, 255]


def test_kat_predictor_mode_T():
    # 2x2, predictor transform, size_bits raw 0 -> 16x16 blocks -> one
    # mode cell with mode 2 (T) in its green channel. Only the green
    # channel varies; residual greens are [50, 7, 50, 7] so actuals are:
    #   (0,0): pred opaque black  -> g = 50
    #   (1,0): top row, pred = L  -> g = 57
    #   (0,1): col 0,  pred = T   -> g = 100
    #   (1,1): mode T, pred=(1,0) -> g = 57 + 7 = 64
    # A decoder wrongly using L at (1,1) would give 107, TL would give 57.
    f = header(2, 2)
    f += [(1, 1), (0, 2)]  # one transform: predictor
    f += [(0, 3)]  # size_bits - 2 = 0 -> 16x16 blocks -> 1x1 sub-image
    f += sub_image_1px(255, 0, 2, 0)  # mode 2 in green channel
    f += [(0, 1)]  # no more transforms
    f += [(0, 1), (0, 1)]  # no cache, no meta
    f += simple2(50, 7)  # green residuals
    f += simple1(0)  # red residual
    f += simple1(0)  # blue residual
    f += simple1(0)  # alpha residual (alpha base is 255 via black pred)
    f += simple1(0)  # distance
    f += [(0, 1), (1, 1), (0, 1), (1, 1)]  # greens 50, 7, 50, 7
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out[0, 0].tolist() == [0, 50, 0, 255]
    assert out[0, 1].tolist() == [0, 57, 0, 255]
    assert out[1, 0].tolist() == [0, 100, 0, 255]
    assert out[1, 1].tolist() == [0, 64, 0, 255]


def test_kat_color_transform():
    # 1x1 color transform: multipliers g2r=16 (blue ch), g2b=0, r2b=0.
    # delta = (int8)16 * (int8)g >> 5; g=64 -> 1024>>5 = 32.
    f = header(1, 1)
    f += [(1, 1), (1, 2)]  # color transform
    f += [(0, 3)]  # size_bits raw 0
    f += sub_image_1px(0, 0, 0, 16)  # g2r=16 in blue channel
    f += [(0, 1), (0, 1), (0, 1)]
    f += simple1(64)  # green
    f += simple1(100)  # red residual -> actual red = 100 + 32 = 132
    f += simple1(5)  # blue residual (g2b=r2b=0 -> unchanged)
    f += simple1(255)
    f += simple1(0)
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out[0, 0].tolist() == [132, 64, 5, 255]


def test_kat_palette_bundled():
    # 4x1, two palette colors -> width_bits=3, packed width 1: the single
    # coded pixel's green carries indices 1,0,0,1 -> 0b1001 = 9.
    # Palette deltas: color0 = (A=255,R=8,G=9,B=10); color1 = +1 each.
    f = header(4, 1)
    f += [(1, 1), (3, 2)]  # color-indexing transform
    f += [(1, 8)]  # palette size - 1 = 1
    # palette delta image: 2x1 pixels; per-channel two-symbol codes
    f += [(0, 1)]  # no cache
    f += simple2(9, 1)  # green deltas
    f += simple2(8, 1)  # red
    f += simple2(10, 1)  # blue
    f += simple2(255, 0)  # alpha
    f += simple1(0)
    f += [(0, 1)] * 4  # first delta: (9,8,10,255) all code-0
    f += [(1, 1)] * 4  # second delta: +1,+1,+1,+0
    f += [(0, 1)]  # no more transforms
    f += [(0, 1), (0, 1)]  # no cache, no meta (main image, packed 1x1)
    f += simple1(9)  # green = bundled indices
    f += simple1(0)
    f += simple1(0)
    f += simple1(255)
    f += simple1(0)
    out = W.decode_webp(container(bits_to_bytes(f)))
    assert out.shape == (1, 4, 4)
    assert out[0, 0].tolist() == [9, 10, 11, 255]
    assert out[0, 1].tolist() == [8, 9, 10, 255]
    assert out[0, 2].tolist() == [8, 9, 10, 255]
    assert out[0, 3].tolist() == [9, 10, 11, 255]


def test_container_errors():
    with pytest.raises(ValueError):
        W.decode_webp(b"NOPE" + b"\x00" * 20)
    lossy = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" + b"VP8 " + (0).to_bytes(4, "little")
    with pytest.raises(NotImplementedError):
        W.decode_webp(lossy)


def test_roundtrip_matrix():
    rng = np.random.default_rng(7)
    cases = [
        np.full((3, 3, 4), 200, np.uint8),
        (rng.integers(0, 2, (9, 13, 1)) * np.array([200, 10, 30, 255])).astype(np.uint8),
        (rng.integers(0, 4, (16, 17))[:, :, None] * np.array([[60, 30, 10]])).astype(np.uint8),
        (rng.integers(0, 16, (33, 31))[:, :, None] * np.array([[15, 7, 3]])).astype(np.uint8),
        rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),
        rng.integers(0, 256, (17, 23, 4), dtype=np.uint8),
        rng.integers(0, 256, (20, 20), dtype=np.uint8),
        rng.integers(0, 256, (1, 257, 3), dtype=np.uint8),
    ]
    pal = rng.integers(0, 256, (200, 4), dtype=np.uint8)
    cases.append(pal[rng.integers(0, 200, (40, 50))])
    for arr in cases:
        buf = W.encode_webp(arr)
        assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
        assert int.from_bytes(buf[4:8], "little") == len(buf) - 8
        out = W.decode_webp(buf)
        assert (out == codecs.to_rgba(arr)).all(), arr.shape


def test_roundtrip_fixture_images():
    from fixtures import gen

    for rec in gen.gen_images(6, fmts=("raw", "png")):
        arr = codecs.decode_image(rec["bytes"], rec["fmt"])
        out = W.decode_webp(W.encode_webp(arr))
        assert (out == codecs.to_rgba(arr)).all()


def test_palette_first_appearance_order_is_deterministic():
    img = np.array([[[5, 5, 5], [1, 1, 1], [5, 5, 5], [9, 9, 9]]], np.uint8)
    assert W.encode_webp(img) == W.encode_webp(img.copy())
    out = W.decode_webp(W.encode_webp(img))
    assert (out[:, :, :3] == img).all()


def test_external_lossy_vp8x_container_fails_loudly():
    """A real encoder's VP8X-wrapped LOSSY WebP (CPython stdlib test data,
    PSF-licensed) must walk the extended container and raise the documented
    capability-gate error at the VP8 chunk — not misparse. The synthetic
    raise tests never exercise a real VP8X/ALPH chunk sequence."""
    import os

    p = os.path.join(os.path.dirname(__file__), "golden", "external_writer_lossy.webp")
    b = open(p, "rb").read()
    assert b[12:16] == b"VP8X"
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        W.decode_webp(b)
