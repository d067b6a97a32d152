"""sobel: engine (vectorized shifts) vs a brute-force per-pixel scalar
reference with the explicit 3x3 kernels, a hand-worked vertical-step
KAT, flat-image zero, border zero-pad pin, and validation."""

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import multimodal

KX = [(-1, -1, -1), (-1, 1, 1), (0, -1, -2), (0, 1, 2), (1, -1, -1), (1, 1, 1)]
KY = [(-1, -1, -1), (-1, 0, -2), (-1, 1, -1), (1, -1, 1), (1, 0, 2), (1, 1, 1)]


def _brute(a: np.ndarray):
    h, w, nb = a.shape
    p = a.astype(np.int64)
    mag2 = np.zeros((h, w, nb), np.int64)
    for r in range(h):
        for c in range(w):
            for b in range(nb):
                gx = sum(
                    wt * p[r + dr, c + dc, b]
                    for dr, dc, wt in KX
                    if 0 <= r + dr < h and 0 <= c + dc < w
                )
                gy = sum(
                    wt * p[r + dr, c + dc, b]
                    for dr, dc, wt in KY
                    if 0 <= r + dr < h and 0 <= c + dc < w
                )
                mag2[r, c, b] = gx * gx + gy * gy
    return mag2


def _run(spark, arrs, threshold=128):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    dec = {}
    for r in multimodal.sobel(df, threshold=threshold).collect():
        arr = codecs.decode_image(bytes(r["out"]), "raw")
        dec[r["image_id"]] = (arr, r["sum_mag2"], r["edge_px"], r["pix_sum"])
    return dec


def test_vs_brute_force_random(spark):
    rng = np.random.default_rng(11)
    arrs = [rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            for h, w in ((7, 9), (12, 5))]
    got = _run(spark, arrs, threshold=200)
    for k, a in enumerate(arrs):
        mag2 = _brute(a)
        img, sum_mag2, edge_px, pix_sum = got[f"i{k}"]
        assert sum_mag2 == int(mag2.sum()), k
        assert edge_px == int((mag2 >= 200 * 200).sum()), k
        ref_img = np.minimum(np.floor(np.sqrt(mag2.astype(np.float64))), 255.0)
        assert np.array_equal(img, ref_img.astype(np.uint8)), k
        assert pix_sum == int(ref_img.sum()), k


def test_hand_kat_vertical_step(spark):
    # columns 0..3 are 0, columns 4..7 are 255: at an interior pixel of
    # column 3 the right taps sum to 255*(1+2+1) = 1020, left taps are 0
    # -> gx = 1020, gy = 0, mag clips to 255
    a = np.zeros((6, 8, 3), np.uint8)
    a[:, 4:, :] = 255
    img, sum_mag2, edge_px, _ = _run(spark, [a])["i0"]
    assert img[2, 3, 0] == 255 and img[2, 4, 0] == 255
    assert img[2, 1, 0] == 0 and img[2, 6, 0] == 0  # flat regions
    ref = _brute(a)
    assert sum_mag2 == int(ref.sum())


def test_flat_image_zero_and_border(spark):
    a = np.full((5, 5, 3), 77, np.uint8)
    img, sum_mag2, edge_px, pix_sum = _run(spark, [a])["i0"]
    # interior of a flat image is 0, but the zero-pad border sees a step
    assert sum_mag2 == int(_brute(a).sum()) and sum_mag2 > 0
    assert np.all(img[1:-1, 1:-1] == 0)


def test_validation(spark):
    with pytest.raises(ValueError):
        multimodal.sobel(None, threshold=-1)
    with pytest.raises(ValueError):
        multimodal.sobel(None, threshold=1449)
