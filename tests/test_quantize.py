"""Hand-derived pins for the median-cut quantization spec
(functions/quantize.py). Each expected value below is computed by hand
from the spec's integer rules, so the vectorized engine is anchored to
the written rule, not to another implementation.
"""

import numpy as np

from tilers_tools_spark.functions import quantize


def test_single_color_image():
    img = np.full((4, 5, 3), 37, np.uint8)
    pal, idx, sse = quantize.quantize_image(img, max_colors=16)
    assert pal.tolist() == [[37, 37, 37]]
    assert idx.shape == (4, 5) and (idx == 0).all()
    assert sse == 0


def test_two_colors_split_exactly():
    # 3 black pixels, 1 (10,0,0): range 10 on R; weighted median m=0
    # (2*cum[0]=6 >= 4) -> boxes {black}, {red-ish}; palette in box order.
    img = np.zeros((1, 4, 3), np.uint8)
    img[0, 3, 0] = 10
    pal, idx, sse = quantize.quantize_image(img, max_colors=2)
    assert pal.tolist() == [[0, 0, 0], [10, 0, 0]]
    assert idx[0].tolist() == [0, 0, 0, 1]
    assert sse == 0


def test_weighted_mean_rounds_half_up():
    # one box holding (0,0,0) and (1,0,0), one pixel each:
    # mean R = 0.5 -> spec integer form (2*1 + 2) // 4 = 1.
    img = np.zeros((1, 2, 3), np.uint8)
    img[0, 1, 0] = 1
    pal, idx, sse = quantize.quantize_image(img, max_colors=1)
    assert pal.tolist() == [[1, 0, 0]]
    # distances: (0,0,0)->1, (1,0,0)->0 => sse = 1
    assert sse == 1


def test_split_channel_first_on_tie():
    # colors (0,0,0) and (5,5,0): R and G both range 5 -> split on R
    # (first in R,G,B). Order by (R, packed) keeps black first.
    img = np.zeros((1, 2, 3), np.uint8)
    img[0, 1, :2] = 5
    pal, idx, sse = quantize.quantize_image(img, max_colors=2)
    assert pal.tolist() == [[0, 0, 0], [5, 5, 0]]
    assert sse == 0


def test_nearest_tie_prefers_smallest_index():
    # palette ends up [(0,0,0), (2,0,0)] (two distinct colors, counts 2/2);
    # remap a (1,0,0) pixel: d=1 to both -> index 0.
    base = np.zeros((1, 4, 3), np.uint8)
    base[0, 2:, 0] = 2
    pal, _, _ = quantize.quantize_image(base, max_colors=2)
    assert pal.tolist() == [[0, 0, 0], [2, 0, 0]]
    img = np.zeros((1, 5, 3), np.uint8)
    img[0, 2:4, 0] = 2
    img[0, 4, 0] = 1  # singleton color, equidistant to both entries
    pal2, idx2, sse2 = quantize.quantize_image(img, max_colors=2)
    # cut unchanged: distinct colors 0,1,2 on R; median splits {0,1}|{2}
    # then {0}|{1}; with max_colors=2 only the first split happens:
    # box0={0,1} mean=(2*1+3)//6=0 -> (0,0,0); box1={2} -> (2,0,0)
    assert pal2.tolist() == [[0, 0, 0], [2, 0, 0]]
    assert idx2[0].tolist() == [0, 0, 1, 1, 0]  # tie at (1,0,0) -> index 0
    assert sse2 == 1


def test_gray_and_alpha_paths():
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    pal, idx, _ = quantize.quantize_image(g, max_colors=16)
    assert (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()
    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[..., 3] = 255  # alpha ignored
    pal2, _, sse2 = quantize.quantize_image(rgba, max_colors=4)
    assert pal2.tolist() == [[0, 0, 0]] and sse2 == 0


def test_palette_never_exceeds_distinct_colors():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 4, size=(8, 8, 3), dtype=np.uint8) * 80
    pal, idx, sse = quantize.quantize_image(img, max_colors=256)
    flat = img.reshape(-1, 3).astype(np.int64)
    n_distinct = len(np.unique(flat[:, 0] * 65536 + flat[:, 1] * 256 + flat[:, 2]))
    assert len(pal) == n_distinct
    assert sse == 0  # every distinct color got its own entry
    # remap must reproduce the image exactly through the palette
    assert (pal[idx] == img).all()
