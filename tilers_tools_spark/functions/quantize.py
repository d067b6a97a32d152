"""Median-cut color quantization (`rgb2pct` parity; reference checkout
absent, SURVEY.md §0.1 — GDAL's rgb2pct.py computes an optimal pseudo-color
table from an RGB image via median cut, then remaps; this module is the
same capability under a deterministic, integer-exact spec).

THE SPEC (binding for engine AND oracle — tests/golden recompute it with
an independent scalar implementation, so every rule below is exact):

1. Distinct colors are collected with pixel counts and ordered by packed
   value ``r*65536 + g*256 + b`` ascending.
2. One box starts holding all distinct colors. While fewer than
   ``max_colors`` boxes and at least one box has >= 2 distinct colors:
   a. among boxes with >= 2 colors pick the one with the largest channel
      range ``max_c(max(col_c) - min(col_c))``; ties -> larger pixel
      count; remaining ties -> smallest box id;
   b. split channel = FIRST channel in (R, G, B) order achieving that
      range;
   c. order the box's colors by (channel value, packed value) ascending;
   d. weighted median: smallest index m with
      ``2 * cumsum(counts)[m] >= total``; if m is the last index, step
      back one so both halves are non-empty;
   e. colors [0..m] keep the box id, the rest become a new box with the
      next sequential id.
3. Palette entry per box (in box-id order) is the round-half-up weighted
   mean per channel in INTEGER arithmetic:
   ``(2 * sum(col_c * count) + total) // (2 * total)``.
4. Pixels map to the nearest palette entry by squared L2 distance; ties
   -> the smallest palette index. SSE is the integer sum of squared
   distances over all pixels.

Every rule is integer/total-order arithmetic — no floats anywhere — so
two faithful implementations agree byte-for-byte on palette, index image
and SSE.
"""

from __future__ import annotations

import numpy as np


def median_cut_palette(
    colors: np.ndarray, counts: np.ndarray, max_colors: int
) -> np.ndarray:
    """(N,3) uint8 distinct colors (packed-order sorted) + int64 counts
    -> (K,3) uint8 palette per the module spec, K <= max_colors."""
    colors = colors.astype(np.int64)
    counts = counts.astype(np.int64)
    boxes: list[np.ndarray] = [np.arange(len(colors))]  # index arrays
    while len(boxes) < max_colors:
        best = -1
        best_key = None
        for bid, idx in enumerate(boxes):
            if len(idx) < 2:
                continue
            rng = int((colors[idx].max(axis=0) - colors[idx].min(axis=0)).max())
            key = (rng, int(counts[idx].sum()), -bid)
            if best_key is None or key > best_key:
                best, best_key = bid, key
        if best < 0:
            break
        idx = boxes[best]
        c = colors[idx]
        rng = c.max(axis=0) - c.min(axis=0)
        ch = int(np.argmax(rng))  # first channel on ties (R,G,B order)
        packed = c[:, 0] * 65536 + c[:, 1] * 256 + c[:, 2]
        order = np.lexsort((packed, c[:, ch]))
        idx = idx[order]
        cum = np.cumsum(counts[idx])
        total = int(cum[-1])
        m = int(np.searchsorted(2 * cum, total))
        if m >= len(idx) - 1:
            m = len(idx) - 2
        boxes[best] = idx[: m + 1]
        boxes.append(idx[m + 1 :])
    pal = np.empty((len(boxes), 3), np.uint8)
    for bid, idx in enumerate(boxes):
        total = int(counts[idx].sum())
        s = (colors[idx] * counts[idx][:, None]).sum(axis=0)
        pal[bid] = (2 * s + total) // (2 * total)
    return pal


def quantize_image(img: np.ndarray, max_colors: int = 256):
    """uint8 (H,W) / (H,W,3) / (H,W,4) image -> (palette (K,3) uint8,
    index image (H,W) uint8, sse int) per the module spec. Gray expands
    to 3 identical channels; alpha is ignored (rgb2pct semantics)."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    rgb = np.ascontiguousarray(img[:, :, :3]).astype(np.int64)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    packed = flat[:, 0] * 65536 + flat[:, 1] * 256 + flat[:, 2]
    uniq, inv, cnt = np.unique(packed, return_inverse=True, return_counts=True)
    colors = np.stack([uniq // 65536, (uniq // 256) % 256, uniq % 256], axis=1)
    pal = median_cut_palette(colors, cnt, max_colors)
    if len(pal) > 256:
        raise ValueError("palette exceeds uint8 index range")
    # nearest palette entry per DISTINCT color; argmin takes the first
    # (= smallest palette index) on ties, as the spec requires
    d = ((colors[:, None, :] - pal[None, :, :].astype(np.int64)) ** 2).sum(axis=2)
    nearest = np.argmin(d, axis=1)
    sse = int((d[np.arange(len(colors)), nearest] * cnt).sum())
    idx_img = nearest.astype(np.uint8)[inv].reshape(h, w)
    return pal, idx_img, sse
