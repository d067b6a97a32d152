"""distance_transform: engine (Felzenszwalb two-pass, exact integers)
vs the naive min-over-all-foreground definition, a hand KAT, the
no-foreground channel, and validation. The 1-D envelope kernel itself
is additionally brute-validated over 200 random masks at build time
(commit message) — these tests pin the Spark-side integration."""

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import multimodal


def _ref(a: np.ndarray, thr):
    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        fg = np.argwhere(a[:, :, b] >= thr)
        if len(fg) == 0:
            out[b] = (0, 0, 0, h * w)
            continue
        tot = mx = 0
        for r in range(h):
            for c in range(w):
                d2 = int(((fg[:, 0] - r) ** 2 + (fg[:, 1] - c) ** 2).min())
                tot += d2
                mx = max(mx, d2)
        out[b] = (len(fg), tot, mx, 0)
    return out


def _run(spark, arrs, thr=128):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return {
        (r["image_id"], r["b"]): (r["n_fg"], r["sum_d2"], r["max_d2"], r["n_inf"])
        for r in multimodal.distance_transform(df, threshold=thr).collect()
    }


def test_edt_vs_naive_random(spark):
    rng = np.random.default_rng(91)
    arrs = [rng.integers(0, 256, size=(10, 13, 3)).astype(np.uint8),
            (rng.random((7, 7, 3)) < 0.08).astype(np.uint8) * 255]  # sparse fg
    for thr in (128, 250):
        got = _run(spark, arrs, thr)
        for k, a in enumerate(arrs):
            ref = _ref(a, thr)
            for b in range(3):
                assert got[(f"i{k}", b)] == ref[b], (thr, k, b)


def test_edt_hand_kat_single_seed(spark):
    # one fg pixel at (0,0) in a 1x4 strip: d² = 0,1,4,9 -> sum 14, max 9
    a = np.zeros((1, 4, 3), np.uint8)
    a[0, 0, :] = 255
    got = _run(spark, [a])[("i0", 0)]
    assert got == (1, 14, 9, 0)


def test_edt_no_foreground_channel(spark):
    a = np.zeros((5, 6, 3), np.uint8)
    a[2, 2, 1] = 255  # only channel 1 has fg
    got = _run(spark, [a])
    assert got[("i0", 0)] == (0, 0, 0, 30)
    assert got[("i0", 1)][0] == 1 and got[("i0", 1)][3] == 0
    with pytest.raises(ValueError):
        multimodal.distance_transform(None, threshold=256)
