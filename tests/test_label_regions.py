"""label_regions: engine (union-by-min union-find) vs an independent
BFS flood-fill scalar reference on random masks, a hand-worked
plus-dot KAT, the 4-connectivity pin (diagonal touch does NOT
connect), empty-foreground, and validation."""

from collections import deque

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import multimodal


def _bfs_ref(fg: np.ndarray):
    """Independent labeling: BFS flood fill, label = min pixel id."""
    h, w = fg.shape
    seen = np.zeros_like(fg, dtype=bool)
    regions = {}
    for r0 in range(h):
        for c0 in range(w):
            if not fg[r0, c0] or seen[r0, c0]:
                continue
            q = deque([(r0, c0)])
            seen[r0, c0] = True
            pix = []
            while q:
                r, c = q.popleft()
                pix.append((r, c))
                for rr, cc in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                    if 0 <= rr < h and 0 <= cc < w and fg[rr, cc] and not seen[rr, cc]:
                        seen[rr, cc] = True
                        q.append((rr, cc))
            label = min(r * w + c for r, c in pix)
            rs = [p[0] for p in pix]
            cs = [p[1] for p in pix]
            regions[label] = (
                len(pix), min(rs), max(rs), min(cs), max(cs), sum(rs), sum(cs))
    return regions


def _run(spark, arrs, threshold, band=0):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {}
    for r in multimodal.label_regions(df, threshold, band=band).collect():
        out.setdefault(r["image_id"], {})[r["label"]] = (
            r["area"], r["r_min"], r["r_max"], r["c_min"], r["c_max"],
            r["sum_r"], r["sum_c"])
    return out


def test_vs_bfs_reference_random(spark):
    rng = np.random.default_rng(23)
    arrs = []
    for density in (0.2, 0.5, 0.8):
        m = (rng.random((14, 19)) < density).astype(np.uint8) * 255
        arrs.append(np.repeat(m[:, :, None], 3, axis=2))
    got = _run(spark, arrs, threshold=128)
    for k, a in enumerate(arrs):
        ref = _bfs_ref(a[:, :, 0] >= 128)
        assert got.get(f"i{k}", {}) == ref, k


def test_hand_kat_plus_dot(spark):
    # a plus-shaped dot at (2,3) in a 6x8 image: pixels (1,3),(2,2),
    # (2,3),(2,4),(3,3); label = min pid = 1*8+3 = 11; area 5;
    # bbox r 1..3, c 2..4; sum_r = 1+2+2+2+3 = 10; sum_c = 3+2+3+4+3 = 15
    a = np.zeros((6, 8, 3), np.uint8)
    for r, c in ((1, 3), (2, 2), (2, 3), (2, 4), (3, 3)):
        a[r, c, :] = 255
    got = _run(spark, [a], threshold=1)["i0"]
    assert got == {11: (5, 1, 3, 2, 4, 10, 15)}


def test_diagonal_does_not_connect(spark):
    a = np.zeros((4, 4, 3), np.uint8)
    a[1, 1, :] = 255
    a[2, 2, :] = 255  # touches (1,1) only diagonally
    got = _run(spark, [a], threshold=128)["i0"]
    assert len(got) == 2
    assert set(got) == {1 * 4 + 1, 2 * 4 + 2}
    assert all(v[0] == 1 for v in got.values())


def test_empty_foreground_and_band(spark):
    a = np.zeros((5, 5, 3), np.uint8)
    a[:, :, 2] = 255  # band 2 all-fg, band 0 empty
    assert _run(spark, [a], threshold=128) == {}
    got = _run(spark, [a], threshold=128, band=2)["i0"]
    assert got == {0: (25, 0, 4, 0, 4, 50, 50)}


def test_validation(spark):
    with pytest.raises(ValueError):
        multimodal.label_regions(None, 256)
    with pytest.raises(ValueError):
        multimodal.label_regions(None, -1)
    with pytest.raises(ValueError):
        multimodal.label_regions(None, 10, band=-1)
    # band beyond the channel count fails loudly at decode time
    a = np.zeros((3, 3, 3), np.uint8)
    with pytest.raises(Exception):
        _run(spark, [a], threshold=10, band=5)
