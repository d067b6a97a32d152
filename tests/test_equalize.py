"""equalize_hist: engine vs a per-pixel pure-Python-int scalar
reference of the documented integer LUT, a hand-worked KAT, the
classic range-stretch invariants (min channel value -> 0, max -> 255
for non-constant channels), the constant-channel identity branch, and
idempotence-on-already-equalized histograms is NOT claimed (histogram
equalization is not idempotent in general) — instead monotonicity of
the LUT is asserted."""

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import multimodal


def _ref(a: np.ndarray) -> np.ndarray:
    """Scalar reference: the published formula with Python ints per
    pixel — cdf via counting, round-half-up division spelled out."""
    h, w, nb = a.shape
    total = h * w
    out = np.empty_like(a)
    for b in range(nb):
        vals = [int(v) for v in a[:, :, b].ravel()]
        cdf = {}
        for v in sorted(set(vals)):
            cdf[v] = sum(1 for x in vals if x <= v)
        cdf_min = cdf[min(vals)]
        denom = total - cdf_min
        for r in range(h):
            for c in range(w):
                v = int(a[r, c, b])
                if denom == 0:
                    out[r, c, b] = v
                else:
                    num = (cdf[v] - cdf_min) * 255 + denom // 2
                    out[r, c, b] = num // denom
    return out


def _run(spark, arrs):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    dec = {}
    for r in multimodal.equalize_hist(df).collect():
        arr = codecs.decode_image(bytes(r["out"]), "raw")
        dec[r["image_id"]] = (arr, r["pix_sum"], r["changed"])
    return dec


def test_hand_kat_1x4(spark):
    # values [10,10,20,30] per band: cdf 10->2 (=cdf_min), 20->3, 30->4,
    # denom 2: lut(10)=(0+1)//2=0, lut(20)=(255+1)//2=128,
    # lut(30)=(510+1)//2=255
    a = np.tile(np.array([10, 10, 20, 30], np.uint8)[None, :, None], (1, 1, 3))
    got, pix_sum, changed = _run(spark, [a])["i0"]
    assert got[0, :, 0].tolist() == [0, 0, 128, 255]
    assert pix_sum == (0 + 0 + 128 + 255) * 3
    assert changed == 12  # every pixel moved


def test_vs_scalar_reference_random(spark):
    rng = np.random.default_rng(17)
    arrs = [
        rng.integers(40, 120, size=(9, 13, 3)).astype(np.uint8),  # squashed
        rng.integers(0, 256, size=(6, 6, 3)).astype(np.uint8),    # full range
        (rng.integers(0, 4, size=(8, 5, 3)) * 3 + 100).astype(np.uint8),
    ]
    got = _run(spark, arrs)
    for k, a in enumerate(arrs):
        ref = _ref(a)
        g, pix_sum, changed = got[f"i{k}"]
        assert np.array_equal(g, ref), k
        assert pix_sum == int(ref.astype(np.int64).sum())
        assert changed == int((ref != a).sum())


def test_range_stretch_and_monotone(spark):
    rng = np.random.default_rng(3)
    a = rng.integers(60, 90, size=(12, 12, 3)).astype(np.uint8)
    got = _run(spark, [a])["i0"][0]
    for b in range(3):
        src, dst = a[:, :, b].ravel(), got[:, :, b].ravel()
        # the smallest occupied value maps to 0, the largest to 255
        assert dst[src.argmin()] == 0 and dst[src.argmax()] == 255
        # LUT is monotone: order of pixel values never inverts
        order = np.argsort(src, kind="stable")
        assert np.all(np.diff(dst[order].astype(np.int64)) >= 0)


def test_constant_channel_identity(spark):
    a = np.full((7, 5, 3), 200, np.uint8)
    got, pix_sum, changed = _run(spark, [a])["i0"]
    assert np.array_equal(got, a)
    assert changed == 0 and pix_sum == 200 * 7 * 5 * 3


def test_mixed_constant_and_varying_channels(spark):
    a = np.zeros((4, 4, 3), np.uint8)
    a[:, :, 0] = 99                       # constant -> identity
    a[:, :, 1] = np.arange(16).reshape(4, 4)   # varying -> stretched
    a[:, :, 2] = 255
    got = _run(spark, [a])["i0"][0]
    assert np.array_equal(got[:, :, 0], a[:, :, 0])
    assert np.array_equal(got[:, :, 2], a[:, :, 2])
    assert got[:, :, 1].min() == 0 and got[:, :, 1].max() == 255
