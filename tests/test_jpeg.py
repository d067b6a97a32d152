"""M7 — baseline JPEG codec: roundtrip PSNR >= 40dB (BASELINE.json:15),
marker structure, grayscale, and pipeline integration with fmt=jpeg.
"""

import numpy as np
import pytest

from fixtures import gen
from oracle import minitiler as mt
from tilers_tools_spark.functions import codecs, jpegcodec as J
from tilers_tools_spark.operators import render as rn

RNG = np.random.default_rng(9)


def test_psnr_invariant_on_fixture_pixels():
    pix = gen.make_pixels(7, 987654321, 320, 192)
    out = J.decode_jpeg(J.encode_jpeg(pix, quality=90))
    assert codecs.psnr(pix, out) >= 40.0


def test_smooth_image_high_psnr():
    x = np.linspace(0, 6 * np.pi, 200)
    sm = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 100 + 128).astype(np.uint8)
    img = np.dstack([sm, sm.T, sm // 2 + 30])
    out = J.decode_jpeg(J.encode_jpeg(img, quality=90))
    assert codecs.psnr(img, out) >= 42.0


def test_grayscale_roundtrip():
    g = RNG.integers(80, 170, (64, 48), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg(g, quality=95))
    assert out.shape == (64, 48, 1)
    assert codecs.psnr(g[:, :, None], out) >= 35.0


def test_markers_and_determinism():
    pix = gen.make_pixels(1, 42, 64, 64)
    d1 = J.encode_jpeg(pix)
    d2 = J.encode_jpeg(pix.copy())
    assert d1 == d2
    assert d1[:2] == b"\xff\xd8" and d1[-2:] == b"\xff\xd9"
    assert b"JFIF" in d1[:30]


def test_non_multiple_of_8_dims():
    pix = gen.make_pixels(2, 777, 61, 45)
    out = J.decode_jpeg(J.encode_jpeg(pix, quality=90))
    assert out.shape == (45, 61, 3)
    assert codecs.psnr(pix, out) >= 38.0


def test_pipeline_with_jpeg_fmt_matches_oracle():
    """fmt=jpeg rows flow through decode->tile->overview bit-identically
    (engine and oracle share the codec, so tiles are byte-equal)."""
    recs = [r for r in gen.gen_images(6, fmts=("jpeg",))]
    for rec in recs[:2]:
        o = {(r["z"], r["x"], r["y"]): r["rgba"] for r in mt.tile_image(rec)}
        e = rn.render_image_pyramid(rec)
        assert set(o) == set(e)
        for k in o:
            assert np.array_equal(o[k], e[k])
    # and the decoded source is close to the procedural original
    for i, rec in enumerate(recs[:2]):
        orig = gen.make_pixels(i, rec["phash"], rec["w"], rec["h"])
        dec = codecs.decode_image(rec["bytes"], "jpeg")
        assert codecs.psnr(orig, dec) >= 40.0


# ---------------------------------------------------------------------------
# Subsampled (4:2:0 / 4:2:2) decode — T.81 A.2.3 interleaved MCU order.
# The handcrafted KATs below are written by a TEST-SIDE encoder that shares
# no code with the engine (its own bit-writer + canonical-code builder from
# the T.81 table specs), and every expected pixel value is analytic: with an
# all-ones quant table and DC-only blocks, the orthonormal IDCT gives
# pixel = dc/8 + 128 uniformly over the block, and 128-valued chroma makes
# RGB == luma exactly. A block-order / axis / crop bug in the MCU walk
# cannot produce these constants in the right quadrants by accident.


def _kat_canonical(bits, values):
    codes, code, length = {}, 0, 0
    for n, b in enumerate(bits, start=1):
        code <<= n - length
        length = n
        for _ in range(b):
            codes[values[len(codes)]] = (code, n)
            code += 1
    return codes


class _KatBits:
    def __init__(self):
        self.acc, self.n, self.out = 0, 0, bytearray()

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8

    def done(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)

    def marker(self, m):
        # byte-align with 1-padding, then emit the marker RAW (a marker is
        # not entropy data — it must NOT get a stuffed 0x00)
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, m])


def _kat_jpeg(w, h, samplings, luma_dcs, dc_spec=None, restart_interval=0):
    """Minimal baseline JPEG: 3 components, all-ones quant table, DC-only
    blocks. samplings = [(h,v)] * 3; luma_dcs = flat list of luma DC VALUES
    (not diffs) in T.81 interleaved-MCU block order; chroma DC = 0.
    restart_interval > 0 emits a DRI segment and RSTn markers every that
    many MCUs (B.2.4.4: predictors reset, entropy stream byte-aligns)."""
    import struct as st

    dc_spec = dc_spec or ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
    ac_spec = ([0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [0x00, 0x01, 0x02])
    dc = _kat_canonical(*dc_spec)
    ac = _kat_canonical(*ac_spec)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + st.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = st.pack(">BHHB", 8, h, w, 3)
    for cid, (sh, sv) in zip((1, 2, 3), samplings):
        sof += bytes([cid, (sh << 4) | sv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_spec[0]) + bytes(dc_spec[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_spec[0]) + bytes(ac_spec[1]))
    if restart_interval:
        out += seg(0xDD, st.pack(">H", restart_interval))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    bw = _KatBits()
    preds = [0, 0, 0]
    it = iter(luma_dcs)
    for mi in range(mcux * mcuy):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.marker(0xD0 + (mi // restart_interval - 1) % 8)
            preds = [0, 0, 0]
        for ci, (sh, sv) in enumerate(samplings):
            for _ in range(sh * sv):
                val = next(it) if ci == 0 else 0
                diff = val - preds[ci]
                preds[ci] = val
                mag = abs(diff).bit_length()
                bw.put(*dc[mag])
                if mag:
                    bw.put(diff if diff >= 0 else diff + (1 << mag) - 1, mag)
                bw.put(*ac[0x00])  # EOB
    return out + bw.done() + b"\xff\xd9"


def _dc_for(p):
    # all-ones quant, DC-only, orthonormal IDCT: pixel = dc/8 + 128
    return 8 * (p - 128)


def test_420_uniform_exact():
    jpg = _kat_jpeg(16, 16, [(2, 2), (1, 1), (1, 1)], [_dc_for(200)] * 4)
    out = J.decode_jpeg(jpg)
    assert out.shape == (16, 16, 3)
    assert (out == 200).all()


def test_420_quadrant_block_order():
    """One 16x16 MCU = 4 luma blocks raster-ordered within the MCU: each
    8x8 quadrant must land exactly where T.81 A.2.3 places it."""
    # descending values force NEGATIVE DC diffs through the subsampled MCU
    # walk (one's-complement extend on the decode side)
    ps = [210, 40, 160, 90]  # TL, TR, BL, BR
    jpg = _kat_jpeg(16, 16, [(2, 2), (1, 1), (1, 1)], [_dc_for(p) for p in ps])
    y = J.decode_jpeg(jpg)[:, :, 0].astype(int)
    assert (y[:8, :8] == ps[0]).all() and (y[:8, 8:] == ps[1]).all()
    assert (y[8:, :8] == ps[2]).all() and (y[8:, 8:] == ps[3]).all()


def test_420_multi_mcu_order_and_odd_crop():
    """24x10 at 4:2:0 -> mcux=2, mcuy=1 (luma 20 rows, cropped to 10):
    MCU raster order + per-component ceil-crop (T.81 A.1.1) both pinned."""
    # MCU0 luma blocks 10,20,30,40; MCU1 50,60,70,80
    ps = [10, 20, 30, 40, 50, 60, 70, 80]
    jpg = _kat_jpeg(24, 10, [(2, 2), (1, 1), (1, 1)], [_dc_for(p) for p in ps])
    y = J.decode_jpeg(jpg)[:, :, 0].astype(int)
    assert y.shape == (10, 24)
    assert (y[:8, :8] == 10).all() and (y[:8, 8:16] == 20).all()
    assert (y[8:, :8] == 30).all() and (y[8:, 8:16] == 40).all()
    assert (y[:8, 16:24] == 50).all() and (y[8:, 16:24] == 70).all()


def test_422_axis_orientation():
    """4:2:2 (chroma halved HORIZONTALLY only): a 16x8 image is one MCU of
    two luma blocks side by side — catches a swapped upsample axis."""
    jpg = _kat_jpeg(16, 8, [(2, 1), (1, 1), (1, 1)], [_dc_for(60), _dc_for(190)])
    y = J.decode_jpeg(jpg)[:, :, 0].astype(int)
    assert y.shape == (8, 16)
    assert (y[:, :8] == 60).all() and (y[:, 8:] == 190).all()


def test_external_encoder_420_jpeg_vs_ppm_oracle():
    """Real-encoder 4:2:0 bitstream (CPython stdlib test data, PSF-licensed
    python.jpg — adaptive tables, 2x2 luma sampling) decoded against the
    SAME image in raw PPM form (python.ppm, a byte-slice oracle independent
    of every codec in this repo; its RGB equals the uncompressed TIFF
    fixture's RGB planes byte-for-byte). Sharp-edged 16x16 logo at 543
    bytes: luma must clear 30 dB (measured 35.5), full-RGB 20 dB (measured
    23.4 — replication chroma upsampling on hard edges)."""
    import hashlib
    import os

    gold = os.path.join(os.path.dirname(__file__), "golden")
    jpg = open(os.path.join(gold, "external_writer_420.jpg"), "rb").read()
    ppm = open(os.path.join(gold, "external_writer_rgb.ppm"), "rb").read()
    assert hashlib.sha256(jpg).hexdigest().startswith("0171178ae901e108")
    assert ppm[:12] == b"P6\n16 16\n255"
    rgb = np.frombuffer(ppm[13:], dtype=np.uint8).reshape(16, 16, 3)
    out = J.decode_jpeg(jpg)
    assert out.shape == (16, 16, 3)
    assert codecs.psnr(rgb, out) >= 20.0
    luma = lambda x: (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])  # noqa: E731
    ldiff = luma(out.astype(np.float64)) - luma(rgb.astype(np.float64))
    lpsnr = 10 * np.log10(255.0**2 / max((ldiff**2).mean(), 1e-12))
    assert lpsnr >= 30.0


# --- 4:2:0 ENCODE (the bandwidth-bound tile-set scale path) -----------------
# The decoder's subsampled MCU walk is pinned above by analytic KATs and an
# external-encoder fixture, so a roundtrip through it cross-validates the
# encoder's MCU emission order independently.


def test_420_encode_uniform_exact_and_sof_marker():
    u = np.full((16, 16, 3), 200, np.uint8)
    e = J.encode_jpeg(u, subsampling="420")
    # SOF0 luma sampling byte = 0x22
    i = e.find(b"\xff\xc0")
    assert e[i + 11] == 0x22 and e[i + 14] == 0x11
    out = J.decode_jpeg(e)
    assert out.shape == (16, 16, 3) and (out == 200).all()


def test_420_encode_smaller_and_psnr():
    x = np.linspace(0, 6 * np.pi, 200)
    sm = ((np.sin(x)[:, None] * np.cos(x)[None, :]) * 100 + 128).astype(np.uint8)
    img = np.dstack([sm, sm.T, sm // 2 + 30])
    e444 = J.encode_jpeg(img, 90)
    e420 = J.encode_jpeg(img, 90, subsampling="420")
    assert len(e420) < 0.8 * len(e444)
    assert codecs.psnr(img, J.decode_jpeg(e420)) >= 37.0


def test_420_encode_odd_dims_roundtrip():
    pix = gen.make_pixels(3, 555, 33, 17)
    out = J.decode_jpeg(J.encode_jpeg(pix, 95, subsampling="420"))
    assert out.shape == (17, 33, 3)
    assert codecs.psnr(pix, out) >= 35.0


def test_444_default_bytes_stable():
    """The refactored emission path must keep default-subsampling output
    byte-identical (fixture/golden stability): pin the exact digest."""
    import hashlib

    pix = gen.make_pixels(7, 987654321, 320, 192)
    d = hashlib.md5(J.encode_jpeg(pix, quality=90)).hexdigest()
    assert d == "6c53b867a76a1a66fab2cf073723f720"


def test_restart_markers_420():
    """DRI=1 over three 4:2:0 MCUs (48x16): RST markers byte-align the
    stream and reset DC predictors PER MCU (B.2.4.4 — the interval counts
    MCUs, not blocks). Values chosen so a decoder that failed to reset
    predictors, or counted blocks instead of MCUs, lands on the wrong
    constants."""
    ps = [30, 30, 30, 30, 130, 130, 130, 130, 230, 230, 230, 230]
    jpg = _kat_jpeg(
        48, 16, [(2, 2), (1, 1), (1, 1)], [_dc_for(p) for p in ps], restart_interval=1
    )
    assert jpg.count(b"\xff\xd0") >= 1 and b"\xff\xdd" in jpg
    y = J.decode_jpeg(jpg)[:, :, 0].astype(int)
    assert (y[:, :16] == 30).all() and (y[:, 16:32] == 130).all() and (y[:, 32:] == 230).all()


def test_restart_markers_111():
    """Same contract on the 1x1 path (MCU == one block per component)."""
    ps = [50, 150, 250]
    jpg = _kat_jpeg(
        24, 8, [(1, 1), (1, 1), (1, 1)], [_dc_for(p) for p in ps], restart_interval=1
    )
    y = J.decode_jpeg(jpg)[:, :, 0].astype(int)
    assert (y[:, :8] == 50).all() and (y[:, 8:16] == 150).all() and (y[:, 16:] == 250).all()


def test_440_vertical_subsampling():
    """4:4:0 (chroma halved VERTICALLY only, (1,2) luma factors): an 8x16
    image is one MCU of two luma blocks stacked — the transpose of the
    4:2:2 case, so together they pin both upsample axes independently."""
    jpg = _kat_jpeg(8, 16, [(1, 2), (1, 1), (1, 1)], [_dc_for(70), _dc_for(180)])
    y = J.decode_jpeg(jpg)[:, :, 0].astype(int)
    assert y.shape == (16, 8)
    assert (y[:8, :] == 70).all() and (y[8:, :] == 180).all()


def test_external_photo_with_restart_markers():
    """A real 477x720 photo from an external encoder (Rust embedded-book
    doc asset, MIT/Apache-2.0: verify.jpeg) — 4:4:4 with DRI=90, dozens of
    RST markers through 100 KB of real entropy data. The synthetic restart
    KATs above pin the semantics; this pins the machinery against a real
    encoder's stream (marker placement, predictor resets, byte alignment
    mid-photo). The decode md5 is OUR decoder's output pinned for
    regression — there is no independent pixel oracle for a lossy file,
    but plausibility is asserted via image statistics."""
    import hashlib
    import os

    p = os.path.join(os.path.dirname(__file__), "golden", "external_photo_444_rst.jpg")
    d = open(p, "rb").read()
    assert hashlib.sha256(d).hexdigest().startswith("6fd1d73b2133141b")
    assert b"\xff\xdd" in d  # DRI present
    arr = J.decode_jpeg(d)
    assert arr.shape == (477, 720, 3) and arr.dtype == np.uint8
    assert 40 < arr.mean() < 90 and arr.std() > 15  # a photo, not noise/garbage
    assert hashlib.md5(arr.tobytes()).hexdigest() == "eac0468cfe648ec5c7590b915ea967a1"


# --- progressive (SOF2) decode ----------------------------------------------
# Hand-assembled scan streams (bit sequences derived from T.81 G.2 and
# commented step by step) pin the successive-approximation semantics; the
# external 10-scan libjpeg file then validates the machinery at scale with
# a structural oracle: 8x8 block means of the full decode must equal the
# DC-scans-only reconstruction (every AC basis function is zero-mean), so
# any corruption in the AC-first/AC-refine logic shifts block means.


def _prog_headers(w, h, samplings, ncomp=3):
    import struct as st

    def seg(marker, payload):
        return bytes([0xFF, marker]) + st.pack(">H", len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = st.pack(">BHHB", 8, h, w, ncomp)
    for cid, (sh, sv) in zip(range(1, ncomp + 1), samplings):
        sof += bytes([cid, (sh << 4) | sv, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    dc_spec = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
    ac_spec = ([0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [0x00, 0x01, 0x21])
    out += seg(0xC4, bytes([0x00]) + bytes(dc_spec[0]) + bytes(dc_spec[1]))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_spec[0]) + bytes(ac_spec[1]))
    dc = _kat_canonical(*dc_spec)
    ac = _kat_canonical(*ac_spec)
    return out, dc, ac


def _sos(comps, ss, se, ah, al):
    import struct as st

    pl = bytes([len(comps)])
    for cid in comps:
        pl += bytes([cid, 0x00])
    pl += bytes([ss, se, (ah << 4) | al])
    return bytes([0xFF, 0xDA]) + st.pack(">H", len(pl) + 2) + pl


def _put_dc_diff(bw, dc, diff):
    mag = abs(diff).bit_length()
    bw.put(*dc[mag])
    if mag:
        bw.put(diff if diff >= 0 else diff + (1 << mag) - 1, mag)


def test_progressive_dc_only_420_constants():
    """16x16 4:2:0, DC successively approximated over two scans: first at
    al=1 (diffs of dc>>1), then the al=0 bit per block. AC scans are pure
    EOB runs. Expected pixels are exact constants (pixel = dc/8 + 128)."""
    # luma DCs per MCU block (TL,TR,BL,BR), chosen with mixed LSBs so the
    # refinement scan actually changes values: 8*(p-128)
    dcs = [_dc_for(p) for p in (41, 90, 161, 210)]  # -696, -304, 264, 656
    hdr, dc, ac = _prog_headers(16, 16, [(2, 2), (1, 1), (1, 1)])
    out = bytearray(hdr)
    # scan 1: interleaved DC first, al=1 — diffs of (dc >> 1) per T.81 G.1.2.1
    out += _sos([1, 2, 3], 0, 0, 0, 1)
    bw = _KatBits()
    pred = 0
    for v in dcs:
        _put_dc_diff(bw, dc, (v >> 1) - pred)
        pred = v >> 1
    _put_dc_diff(bw, dc, 0)  # cb (pred chain per component: 0 -> 0)
    _put_dc_diff(bw, dc, 0)  # cr
    out += bw.done()
    # scan 2: AC first for comp 1 (4 blocks): per-block EOB0
    out += _sos([1], 1, 63, 0, 0)
    bw = _KatBits()
    for _ in range(4):
        bw.put(*ac[0x00])
    out += bw.done()
    # scans 3,4: AC first for comps 2,3 (1 block each): EOB0
    for cid in (2, 3):
        out += _sos([cid], 1, 63, 0, 0)
        bw = _KatBits()
        bw.put(*ac[0x00])
        out += bw.done()
    # scan 5: interleaved DC refine (ah=1, al=0): raw LSB per block in MCU
    # order (luma TL,TR,BL,BR then cb, cr)
    out += _sos([1, 2, 3], 0, 0, 1, 0)
    bw = _KatBits()
    for v in dcs:
        bw.put(v & 1, 1)
    bw.put(0, 1)
    bw.put(0, 1)
    out += bw.done()
    out += b"\xff\xd9"
    img = J.decode_jpeg(bytes(out))
    assert img.shape == (16, 16, 3)
    y = img[:, :, 0].astype(int)
    assert (y[:8, :8] == 41).all() and (y[:8, 8:] == 90).all()
    assert (y[8:, :8] == 161).all() and (y[8:, 8:] == 210).all()


def test_progressive_ac_refinement_single_block():
    """Grayscale 8x8, three scans: DC first (al=0), AC first at al=1
    placing coeff k=1, AC refine at al=0 adding the LSB correction bit AND
    a newly-nonzero coeff at k=2. Final coefficients are known exactly;
    expected pixels come from an IDCT written independently in this test."""
    import math
    import struct as st

    hdr, dc, ac = _prog_headers(8, 8, [(1, 1)], ncomp=1)
    out = bytearray(hdr)
    # scan 1: DC first al=0, diff = 40
    out += _sos([1], 0, 0, 0, 0)
    bw = _KatBits()
    _put_dc_diff(bw, dc, 40)
    out += bw.done()
    # scan 2: AC first al=1, ss=1..63: (r=0, s=1) codes value +1 at al=1
    # -> blk[1] = 1 << 1 = 2 before refinement; then EOB0
    out += _sos([1], 1, 63, 0, 1)
    bw = _KatBits()
    bw.put(*ac[0x01])
    bw.put(1, 1)  # extend bits for s=1, value +1
    bw.put(*ac[0x00])  # EOB
    out += bw.done()
    # scan 3: AC refine al=0: bit stream per G.1.2.3 —
    #   huff(r=0, s=1): new coefficient, sign bit 1 -> +1
    #   advance from k=1: blk[1] nonzero -> correction bit (1: 2 -> 3)
    #                     k=2 zero-history and r==0 -> place new +1 at k=2
    #   then EOB0: eobrun=1, trailing correction bits: none nonzero after k=3
    out += _sos([1], 1, 63, 1, 0)
    bw = _KatBits()
    bw.put(*ac[0x01])  # (r=0, s=1): one newly-nonzero coeff
    bw.put(1, 1)  # its sign: positive -> +1
    bw.put(1, 1)  # correction bit for history-nonzero blk[1]: add 1
    bw.put(*ac[0x00])  # EOB covering the rest
    out += bw.done()
    out += b"\xff\xd9"
    img = J.decode_jpeg(bytes(out))
    assert img.shape == (8, 8, 1)
    # expected: blk[0]=40, blk[1]=3 (zigzag 1 = natural (0,1)), blk[2]=+1
    # (zigzag 2 = natural (1,0)); independent orthonormal IDCT:
    def s(k):
        return math.sqrt(1.0 / 8.0) if k == 0 else math.sqrt(2.0 / 8.0)

    exp = np.empty((8, 8))
    for n in range(8):
        for m in range(8):
            acc = s(0) * s(0) * 40.0
            acc += s(0) * s(1) * 3.0 * math.cos((2 * m + 1) * math.pi / 16.0)
            acc += s(1) * s(0) * 1.0 * math.cos((2 * n + 1) * math.pi / 16.0)
            exp[n, m] = acc + 128.0
    exp = np.clip(np.round(exp), 0, 255)
    assert np.abs(img[:, :, 0].astype(float) - exp).max() <= 1.0


def test_external_progressive_10scan_photo():
    """Real libjpeg progressive file (Rust embedded-book doc asset,
    MIT/Apache-2.0: f3.jpg — 477x720, 2x1 luma, the standard 10-scan
    script incl. AC successive approximation to al=2 and refinements).
    Structural oracle: truncating after the DC-first scan must reproduce
    the full decode's 8x8 block means (AC bases are zero-mean), proving
    the AC-first/refine scans added detail without corrupting the image.
    The md5 pins OUR decode for regression."""
    import hashlib
    import os
    import struct as st

    p = os.path.join(os.path.dirname(__file__), "golden", "external_progressive_10scan.jpg")
    d = open(p, "rb").read()
    assert hashlib.sha256(d).hexdigest().startswith("c9963f3ec9ba0890")
    assert b"\xff\xc2" in d[:2000]
    full = J.decode_jpeg(d)
    assert full.shape == (477, 720, 3)
    assert hashlib.md5(full.tobytes()).hexdigest() == "71fcd7835791ae29c8122c94b103de35"
    # locate the second SOS (end of the DC-first scan)
    pos, sos, in_e = 2, [], False
    while pos < len(d) - 1 and len(sos) < 2:
        if in_e:
            if d[pos] == 0xFF and d[pos + 1] != 0x00 and not (0xD0 <= d[pos + 1] <= 0xD7):
                in_e = False
            else:
                pos += 2 if d[pos] == 0xFF else 1
                continue
        if d[pos] != 0xFF:
            pos += 1
            continue
        m = d[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xDA:
            sos.append(pos)
            in_e = True
        pos += 2 + st.unpack(">H", d[pos + 2 : pos + 4])[0]
    dc_only = J.decode_jpeg(d[: sos[1]] + b"\xff\xd9").astype(np.float64)
    fy = 0.299 * full[..., 0] + 0.587 * full[..., 1] + 0.114 * full[..., 2]
    dy = 0.299 * dc_only[..., 0] + 0.587 * dc_only[..., 1] + 0.114 * dc_only[..., 2]
    H, W = 472, 712  # whole blocks, away from the replicated edge
    fb = fy[:H, :W].astype(np.float64).reshape(H // 8, 8, W // 8, 8).mean(axis=(1, 3))
    db = dy[:H, :W].reshape(H // 8, 8, W // 8, 8).mean(axis=(1, 3))
    diff = np.abs(fb - db)
    # DC-first is at al=1 (one refinement unit) + clipping at block edges:
    # means agree to ~quantization error, nowhere near AC magnitudes
    assert diff.mean() < 1.0 and np.percentile(diff, 95) < 2.0


def test_adobe_app14_transform0_rgb():
    """APP14 'Adobe' transform=0 means the three components are literal
    R,G,B — no YCbCr inverse (Adobe TN #5116; libjpeg honors it). The same
    stream without APP14 decodes as YCbCr (gray, since chroma=128), so the
    two interpretations are distinguishable: with APP14, plane 1 (=G) and
    plane 2 (=B) stay at 128 while plane 0 carries the DC value."""
    import struct as st

    jpg = _kat_jpeg(8, 8, [(1, 1), (1, 1), (1, 1)], [_dc_for(200)])
    noadobe = J.decode_jpeg(jpg)
    assert (noadobe == 200).all()  # YCbCr with neutral chroma -> gray
    app14 = bytes([0xFF, 0xEE]) + st.pack(">H", 14) + b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])
    adobe = J.decode_jpeg(jpg[:2] + app14 + jpg[2:])
    assert (adobe[:, :, 0] == 200).all()
    assert (adobe[:, :, 1] == 128).all() and (adobe[:, :, 2] == 128).all()


def test_rgb_component_ids_heuristic():
    """SOF component ids 'R','G','B' (0x52,0x47,0x42) mark literal RGB even
    without APP14 — the other convention real encoders use."""
    jpg = bytearray(_kat_jpeg(8, 8, [(1, 1), (1, 1), (1, 1)], [_dc_for(60)]))
    i = bytes(jpg).find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1), then [cid samp tq] * 3
    for k, cid in enumerate((0x52, 0x47, 0x42)):
        jpg[i + 10 + 3 * k] = cid
    j = bytes(jpg).find(b"\xff\xda")
    # SOS payload: len(2) ns(1), then [cid tt] * 3
    for k, cid in enumerate((0x52, 0x47, 0x42)):
        jpg[j + 5 + 2 * k] = cid
    out = J.decode_jpeg(bytes(jpg))
    assert (out[:, :, 0] == 60).all()
    assert (out[:, :, 1] == 128).all() and (out[:, :, 2] == 128).all()


def test_cmyk_fails_loudly():
    import struct as st

    sof = st.pack(">BHHB", 8, 8, 8, 4)
    for cid in (1, 2, 3, 4):
        sof += bytes([cid, 0x11, 0])
    jpg = (
        b"\xff\xd8"
        + bytes([0xFF, 0xDB]) + st.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
        + bytes([0xFF, 0xC0]) + st.pack(">H", len(sof) + 2) + sof
        + bytes([0xFF, 0xDA]) + st.pack(">H", 14) + bytes([4, 1, 0, 2, 0, 3, 0, 4, 0, 0, 63, 0])
    )
    with pytest.raises(ValueError, match="CMYK"):
        J.decode_jpeg(jpg)
