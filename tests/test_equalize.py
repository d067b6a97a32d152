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


# --------------------------------------------------- percentile stretch


def _stretch_ref(a, lo_pct, hi_pct):
    h, w, nb = a.shape
    n = h * w
    k_lo = n * lo_pct // 100 + 1
    k_hi = max(n * hi_pct // 100, k_lo)
    out = {}
    for b in range(nb):
        vals = sorted(int(x) for x in a[:, :, b].ravel())
        lo_v, hi_v = vals[k_lo - 1], vals[k_hi - 1]
        tot = chg = 0
        for v in vals:
            if hi_v <= lo_v:
                nv = v
            elif v <= lo_v:
                nv = 0
            elif v >= hi_v:
                nv = 255
            else:
                nv = ((v - lo_v) * 255 + (hi_v - lo_v) // 2) // (hi_v - lo_v)
            tot += nv
            chg += nv != v
        out[b] = (lo_v, hi_v, tot, chg)
    return out


def _stretch_run(spark, arrs, lo=2, hi=98):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return {
        (r["image_id"], r["b"]): (r["lo_v"], r["hi_v"], r["pix_sum"], r["changed"])
        for r in multimodal.percentile_stretch(df, lo_pct=lo, hi_pct=hi).collect()
    }


def test_stretch_vs_scalar_reference(spark):
    rng = np.random.default_rng(73)
    arrs = [rng.integers(50, 130, size=(7, 9, 3)).astype(np.uint8),
            rng.integers(0, 256, size=(12, 4, 3)).astype(np.uint8)]
    for lo, hi in ((2, 98), (10, 90), (0, 100)):
        got = _stretch_run(spark, arrs, lo, hi)
        for k, a in enumerate(arrs):
            ref = _stretch_ref(a, lo, hi)
            for b in range(3):
                assert got[(f"i{k}", b)] == ref[b], (lo, hi, k, b)


def test_stretch_constant_identity_and_validation(spark):
    a = np.full((5, 5, 3), 80, np.uint8)
    got = _stretch_run(spark, [a])[("i0", 0)]
    assert got == (80, 80, 80 * 25, 0)  # lo == hi -> pass-through
    with pytest.raises(ValueError):
        multimodal.percentile_stretch(None, 50, 50)
    with pytest.raises(ValueError):
        multimodal.percentile_stretch(None, -1, 98)


# ----------------------------------------------------- histogram match


def _hm_ref(a, ref):
    h, w, nb = a.shape
    n_s = h * w
    n_r = ref.shape[0] * ref.shape[1]
    out = np.empty_like(a)
    for b in range(nb):
        rvals = sorted(int(x) for x in ref[:, :, b].ravel())
        svals = [int(x) for x in a[:, :, b].ravel()]
        for ridx in range(h * w):
            v = svals[ridx]
            cdf_s = sum(1 for x in svals if x <= v)
            u = next(
                u for u in range(256)
                if sum(1 for x in rvals if x <= u) * n_s >= cdf_s * n_r
            )
            out.reshape(-1, nb)[ridx, b] = u
    return out


def test_histmatch_vs_scalar_reference(spark):
    rng = np.random.default_rng(79)
    a = rng.integers(0, 256, size=(6, 7, 3)).astype(np.uint8)
    ref = rng.integers(40, 90, size=(5, 8, 3)).astype(np.uint8)
    rows = [("i0", codecs.encode_raw(a), "raw")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    r = multimodal.histogram_match(df, ref).collect()[0]
    got = codecs.decode_image(bytes(r["out"]), "raw")
    want = _hm_ref(a, ref)
    assert np.array_equal(got, want)
    assert r["pix_sum"] == int(want.astype(np.int64).sum())
    assert r["changed"] == int((want != a).sum())


def test_histmatch_identity_and_validation(spark):
    # matching an image against ITSELF is the identity (the rank rule
    # returns each value's own quantile position)
    rng = np.random.default_rng(31)
    a = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [("i0", codecs.encode_raw(a), "raw")],
        "image_id string, bytes binary, fmt string")
    r = multimodal.histogram_match(df, a).collect()[0]
    assert r["changed"] == 0
    with pytest.raises(ValueError):
        multimodal.histogram_match(None, np.zeros((4, 4)))
    bad_ref = np.zeros((4, 4, 2), np.uint8)
    with pytest.raises(Exception, match="channel mismatch"):
        multimodal.histogram_match(df, bad_ref).collect()
