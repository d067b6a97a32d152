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


# ------------------------------------------------------------------ D8


def _d8_ref(dem):
    """Independent formulation: float slope = drop / euclidean dist
    (the engine ranks by the integer key drop²·(3-dist²)); same fixed
    priority order. Integer ties occur only between same-distance
    neighbors with equal drops, where the float compare ties exactly
    too — equivalent by construction, independently derived."""
    import math
    from collections import deque

    OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]
    h, w = dem.shape
    tgt = {}
    for r in range(h):
        for c in range(w):
            best = None
            for pri, (dr, dc) in enumerate(OFFS):
                rr, cc = r + dr, c + dc
                if not (0 <= rr < h and 0 <= cc < w):
                    continue
                drop = int(dem[r, c]) - int(dem[rr, cc])
                if drop <= 0:
                    continue
                slope = drop / math.sqrt(dr * dr + dc * dc)
                if best is None or slope > best[0] + 1e-12:
                    best = (slope, pri, (rr, cc))
            if best:
                tgt[(r, c)] = best[2]
    indeg = {}
    for s, d in tgt.items():
        indeg[d] = indeg.get(d, 0) + 1
    acc = {}
    q = deque((r, c) for r in range(h) for c in range(w) if (r, c) not in indeg)
    while q:
        cell = q.popleft()
        d = tgt.get(cell)
        if d is not None:
            acc[d] = acc.get(d, 0) + acc.get(cell, 0) + 1
            indeg[d] -= 1
            if indeg[d] == 0:
                q.append(d)
    return tgt, acc


def _d8_run(spark, dems):
    from tilers_tools_spark.operators import terrain

    rows = []
    for k, dem in enumerate(dems):
        arr = np.repeat(dem.astype(np.uint8)[:, :, None], 3, axis=2)
        rows.append((f"i{k}", codecs.encode_raw(arr), "raw"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {}
    for r in terrain.flow_accumulation(df).collect():
        out[(r["image_id"], r["r"], r["c"])] = (r["acc"], r["is_pit"])
    return out


def test_d8_vs_independent_reference(spark):
    rng = np.random.default_rng(43)
    dems = [rng.integers(0, 200, size=(8, 10)), rng.integers(0, 12, size=(7, 7))]
    got = _d8_run(spark, dems)
    for k, dem in enumerate(dems):
        tgt, acc = _d8_ref(dem)
        h, w = dem.shape
        for r in range(h):
            for c in range(w):
                assert got[(f"i{k}", r, c)] == (
                    acc.get((r, c), 0), (r, c) not in tgt), (k, r, c)


def test_d8_inclined_plane_and_bowl(spark):
    # v = r: every cell flows straight N (N's key 2·1 beats NW/NE's 1);
    # acc at row r counts the h-1-r cells below it; row h-1 are sources
    dem = np.tile(np.arange(6)[:, None], (1, 4))
    got = _d8_run(spark, [dem])
    for r in range(6):
        for c in range(4):
            acc, pit = got[("i0", r, c)]
            assert acc == 5 - r and pit == (r == 0), (r, c)
    # a square bowl: center is the unique pit and accumulates all 24
    r, c = np.ogrid[0:5, 0:5]
    bowl = np.maximum(np.abs(r - 2), np.abs(c - 2)) * 10
    got = _d8_run(spark, [bowl])
    assert got[("i0", 2, 2)] == (24, True)
    n_pits = sum(1 for v in got.values() if v[1])
    assert n_pits == 1


# ------------------------------------------------------ template match


def _tm_ref(a, tpl, top_k):
    th, tw = tpl.shape
    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        cands = []
        for r in range(h - th + 1):
            for c in range(w - tw + 1):
                sad = int(np.abs(
                    a[r:r + th, c:c + tw, b].astype(np.int64) - tpl).sum())
                cands.append((sad, r, c))
        cands.sort()
        out[b] = [(k + 1, r, c, s) for k, (s, r, c) in enumerate(cands[:top_k])]
    return out


def test_template_match_vs_reference_and_planted(spark):
    from tilers_tools_spark.operators import multimodal

    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(12, 10, 3)).astype(np.uint8)
    tpl = a[4:7, 2:5, 0].astype(np.int64)  # planted: exact 0 at (4,2) band 0
    rows = [("i0", codecs.encode_raw(a), "raw")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {}
    for r in multimodal.template_match(df, tpl, top_k=4).collect():
        got.setdefault(r["b"], []).append((r["rank"], r["r"], r["c"], r["sad"]))
    ref = _tm_ref(a, tpl, 4)
    for b in range(3):
        assert sorted(got[b]) == ref[b], b
    assert got[0][0] == (1, 4, 2, 0)  # the planted exact match wins band 0


def test_template_match_too_small_and_validation(spark):
    from tilers_tools_spark.operators import multimodal

    a = np.zeros((2, 2, 3), np.uint8)
    df = spark.createDataFrame(
        [("i0", codecs.encode_raw(a), "raw")],
        "image_id string, bytes binary, fmt string")
    assert multimodal.template_match(df, np.zeros((3, 3))).count() == 0
    with pytest.raises(ValueError):
        multimodal.template_match(None, np.zeros((17, 3)))
    with pytest.raises(ValueError):
        multimodal.template_match(None, np.zeros((3, 3)), top_k=0)
