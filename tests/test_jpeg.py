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
