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


# ------------------------------------------------------------- moments


def _mom_ref(a: np.ndarray):
    """Per-pixel Python-int scalar reference of every output column."""
    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        m = {}
        for p, q in ((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 0), (0, 3)):
            m[(p, q)] = sum(
                (r ** p) * (c ** q) * int(a[r, c, b])
                for r in range(h) for c in range(w)
            )
        m00, m10, m01 = m[(0, 0)], m[(1, 0)], m[(0, 1)]
        out[b] = (
            m00, m10, m01, m[(1, 1)], m[(2, 0)], m[(0, 2)], m[(3, 0)], m[(0, 3)],
            m00 * m[(2, 0)] - m10 * m10,
            m00 * m[(0, 2)] - m01 * m01,
            m00 * m[(1, 1)] - m10 * m01,
            m10 / m00 if m00 else None,
            m01 / m00 if m00 else None,
        )
    return out


def _mom_run(spark, arrs):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {}
    for r in multimodal.image_moments(df).collect():
        out[(r["image_id"], r["b"])] = (
            r["m00"], r["m10"], r["m01"], r["m11"], r["m20"], r["m02"],
            r["m30"], r["m03"], r["mu20_num"], r["mu02_num"], r["mu11_num"],
            r["cbar_r"], r["cbar_c"])
    return out


def test_moments_vs_scalar_reference(spark):
    rng = np.random.default_rng(29)
    arrs = [rng.integers(0, 256, size=(6, 9, 3)).astype(np.uint8),
            rng.integers(0, 256, size=(11, 4, 3)).astype(np.uint8)]
    got = _mom_run(spark, arrs)
    for k, a in enumerate(arrs):
        ref = _mom_ref(a)
        for b in range(3):
            g = got[(f"i{k}", b)]
            assert g[:11] == ref[b][:11], (k, b)
            assert g[11] == pytest.approx(ref[b][11], abs=0.0)
            assert g[12] == pytest.approx(ref[b][12], abs=0.0)


def test_moments_hand_kat_single_pixel(spark):
    # one lit pixel at (r=2, c=3), v=10: m_pq = 2^p 3^q * 10; centroid (2,3);
    # central numerators all zero (a point mass has no spread)
    a = np.zeros((4, 5, 3), np.uint8)
    a[2, 3, 0] = 10
    g = _mom_run(spark, [a])[("i0", 0)]
    assert g[:8] == (10, 20, 30, 60, 40, 90, 80, 270)
    assert g[8:11] == (0, 0, 0)
    assert (g[11], g[12]) == (2.0, 3.0)
    # all-zero channel: NULL centroid
    gz = _mom_run(spark, [a])[("i0", 1)]
    assert gz[0] == 0 and gz[11] is None and gz[12] is None


def test_moments_dim_cap(spark):
    a = np.zeros((1, 2049, 3), np.uint8)
    with pytest.raises(Exception, match="2048"):
        _mom_run(spark, [a])


# ---------------------------------------------------------------- GLCM


def _glcm_ref(a: np.ndarray, dr, dc, levels):
    step = 256 // levels
    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        cnt = {}
        for r in range(h):
            for c in range(w):
                r2, c2 = r + dr, c + dc
                if 0 <= r2 < h and 0 <= c2 < w:
                    key = (int(a[r, c, b]) // step, int(a[r2, c2, b]) // step)
                    cnt[key] = cnt.get(key, 0) + 1
        npairs = sum(cnt.values())
        contrast = sum(v * (i - j) ** 2 for (i, j), v in cnt.items())
        dissim = sum(v * abs(i - j) for (i, j), v in cnt.items())
        energy = sum(v * v for v in cnt.values())
        out[b] = (npairs, contrast, dissim, energy,
                  max(cnt.values()) if cnt else 0)
    return out


def _glcm_run(spark, arrs, dr, dc, levels=8):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {}
    for r in multimodal.glcm_stats(df, dr, dc, levels=levels).collect():
        out[(r["image_id"], r["b"])] = (
            r["npairs"], r["contrast"], r["dissim"], r["energy"], r["max_count"])
    return out


def test_glcm_vs_scalar_reference(spark):
    rng = np.random.default_rng(7)
    arrs = [rng.integers(0, 256, size=(8, 11, 3)).astype(np.uint8)]
    for dr, dc, lv in ((0, 1, 8), (1, 0, 4), (1, -1, 16), (-2, 3, 8)):
        got = _glcm_run(spark, arrs, dr, dc, lv)
        ref = _glcm_ref(arrs[0], dr, dc, lv)
        for b in range(3):
            assert got[("i0", b)] == ref[b], (dr, dc, lv, b)


def test_glcm_hand_kat_flat_and_ramp(spark):
    # flat image: all pairs land on one diagonal cell -> contrast 0,
    # energy = npairs², max = npairs
    a = np.full((4, 6, 3), 200, np.uint8)
    got = _glcm_run(spark, [a], 0, 1)["i0", 0]
    npairs = 4 * 5
    assert got == (npairs, 0, 0, npairs * npairs, npairs)
    # a hard step 0|255 at c=3, offset (0,1): one crossing pair per row
    # at levels 8: (0,7) x4; within-region pairs (0,0) x8 and (7,7) x8
    a = np.zeros((4, 6, 3), np.uint8)
    a[:, 3:, :] = 255
    got = _glcm_run(spark, [a], 0, 1)["i0", 0]
    assert got == (20, 4 * 49, 4 * 7, 8 * 8 + 8 * 8 + 4 * 4, 8)


def test_glcm_offset_exceeds_image(spark):
    a = np.zeros((3, 3, 3), np.uint8)
    got = _glcm_run(spark, [a], 0, 5)["i0", 0]
    assert got == (0, 0, 0, 0, 0)


def test_glcm_validation(spark):
    with pytest.raises(ValueError):
        multimodal.glcm_stats(None, 0, 0)
    with pytest.raises(ValueError):
        multimodal.glcm_stats(None, 0, 1, levels=3)
    with pytest.raises(ValueError):
        multimodal.glcm_stats(None, 0, 65)


# -------------------------------------------------------------- Harris


def _harris_ref(a: np.ndarray, threshold=0):
    """Scalar reference with explicit per-pixel loops over the published
    chain (Sobel taps -> box sums -> 25·det - trace² -> local max)."""
    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        p = a[:, :, b].astype(int)

        def px(r, c):
            return int(p[r, c]) if 0 <= r < h and 0 <= c < w else 0

        gx = [[sum(wt * px(r + dr, c + dc) for dr, dc, wt in KX)
               for c in range(w)] for r in range(h)]
        gy = [[sum(wt * px(r + dr, c + dc) for dr, dc, wt in KY)
               for c in range(w)] for r in range(h)]

        def box(m, r, c):
            return sum(
                m[r + dr][c + dc]
                for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                if 0 <= r + dr < h and 0 <= c + dc < w)

        r25 = [[0] * w for _ in range(h)]
        for r in range(h):
            for c in range(w):
                sxx = box([[x * x for x in row] for row in gx], r, c)
                syy = box([[y * y for y in row] for row in gy], r, c)
                sxy = box([[gx[i][j] * gy[i][j] for j in range(w)]
                           for i in range(h)], r, c)
                r25[r][c] = 25 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
        n_corners = 0
        for r in range(h):
            for c in range(w):
                nbmax = max(
                    r25[r + dr][c + dc]
                    for dr in (-1, 0, 1) for dc in (-1, 0, 1)
                    if 0 <= r + dr < h and 0 <= c + dc < w)
                if r25[r][c] >= threshold and r25[r][c] >= nbmax:
                    n_corners += 1
        flat = [v for row in r25 for v in row]
        out[b] = (n_corners, max(flat), sum(v for v in flat if v > 0))
    return out


def _harris_run(spark, arrs, threshold=0):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return {
        (r["image_id"], r["b"]): (r["n_corners"], r["max_r25"], r["sum_pos"])
        for r in multimodal.harris_corners(df, threshold=threshold).collect()
    }


def test_harris_vs_scalar_reference(spark):
    rng = np.random.default_rng(37)
    a = rng.integers(0, 256, size=(7, 8, 3)).astype(np.uint8)
    got = _harris_run(spark, [a])
    ref = _harris_ref(a)
    for b in range(3):
        assert got[("i0", b)] == ref[b], b


def test_harris_flat_matches_reference(spark):
    # flat image: the interior is gradient-free (r25 = 0) but the
    # zero-pad BORDER is a step — the image frame itself responds, so
    # assert against the scalar reference, not naive all-zeros
    a = np.full((5, 6, 3), 130, np.uint8)
    for thr in (0, 1):
        got = _harris_run(spark, [a], threshold=thr)[("i0", 0)]
        assert got == _harris_ref(a, threshold=thr)[0], thr


def test_harris_corner_beats_edge(spark):
    # an L-shaped white block: the inner corner pixel responds positively;
    # a long straight edge yields non-positive r25 (det ~ 0) — the classic
    # Harris discrimination. Verify against the scalar reference and that
    # at least one strictly positive corner exists.
    a = np.zeros((9, 9, 3), np.uint8)
    a[3:, 3:, :] = 255
    got = _harris_run(spark, [a], threshold=1)
    ref = _harris_ref(a, threshold=1)
    assert got[("i0", 0)] == ref[0]
    assert got[("i0", 0)][0] >= 1 and got[("i0", 0)][1] > 0


# ----------------------------------------------------------------- LBP

LBP_OFFS = [(-1, -1), (-1, 0), (-1, 1), (0, 1), (1, 1), (1, 0), (1, -1), (0, -1)]


def _lbp_ref(a: np.ndarray):
    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        hist = {}
        for r in range(1, h - 1):
            for c in range(1, w - 1):
                code = sum(
                    (1 << k)
                    for k, (dr, dc) in enumerate(LBP_OFFS)
                    if int(a[r + dr, c + dc, b]) >= int(a[r, c, b])
                )
                hist[code] = hist.get(code, 0) + 1
        out[b] = hist
    return out


def _lbp_run(spark, arrs):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {}
    for r in multimodal.lbp_hist(df).collect():
        out.setdefault((r["image_id"], r["b"]), {})[r["code"]] = r["cnt"]
    return out


def test_lbp_vs_scalar_reference(spark):
    rng = np.random.default_rng(53)
    arrs = [rng.integers(0, 256, size=(8, 10, 3)).astype(np.uint8),
            rng.integers(0, 4, size=(6, 6, 3)).astype(np.uint8)]  # heavy ties
    got = _lbp_run(spark, arrs)
    for k, a in enumerate(arrs):
        ref = _lbp_ref(a)
        for b in range(3):
            assert got.get((f"i{k}", b), {}) == ref[b], (k, b)


def test_lbp_hand_kat_flat_and_peak(spark):
    # flat image: every neighbor == center -> all >= -> code 255 everywhere
    a = np.full((5, 7, 3), 99, np.uint8)
    got = _lbp_run(spark, [a])[("i0", 0)]
    assert got == {255: 3 * 5}
    # a strict single peak at the center of 3x3: its code is 0 (all
    # neighbors strictly below); every other interior pixel sees the
    # peak >= itself, bits per position
    a = np.zeros((3, 3, 3), np.uint8)
    a[1, 1, :] = 200
    got = _lbp_run(spark, [a])[("i0", 0)]
    assert got == {0: 1}  # only one interior pixel in a 3x3


def test_lbp_too_small_image_empty(spark):
    a = np.zeros((2, 9, 3), np.uint8)
    assert _lbp_run(spark, [a]) == {}


# ------------------------------------------------------------ box blur


def _blur_ref(a: np.ndarray, radius):
    h, w, nb = a.shape
    out = np.empty_like(a)
    for r in range(h):
        for c in range(w):
            win = a[max(0, r - radius):min(h, r + radius + 1),
                    max(0, c - radius):min(w, c + radius + 1)]
            s = win.reshape(-1, nb).astype(np.int64).sum(axis=0)
            area = win.shape[0] * win.shape[1]
            out[r, c] = (s + area // 2) // area
    return out


def _blur_run(spark, arrs, radius):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    dec = {}
    for r in multimodal.box_blur(df, radius=radius).collect():
        dec[r["image_id"]] = (codecs.decode_image(bytes(r["out"]), "raw"),
                              r["pix_sum"], r["changed"])
    return dec


def test_blur_vs_brute_force(spark):
    rng = np.random.default_rng(41)
    arrs = [rng.integers(0, 256, size=(9, 7, 3)).astype(np.uint8),
            rng.integers(0, 256, size=(5, 12, 3)).astype(np.uint8)]
    for radius in (1, 2, 4):
        got = _blur_run(spark, arrs, radius)
        for k, a in enumerate(arrs):
            ref = _blur_ref(a, radius)
            img, pix_sum, changed = got[f"i{k}"]
            assert np.array_equal(img, ref), (radius, k)
            assert pix_sum == int(ref.astype(np.int64).sum())
            assert changed == int((ref != a).sum())


def test_blur_hand_kat_half_up(spark):
    # 1x2 image [0, 1], radius 1: both windows are {0,1}, area 2,
    # mean 0.5 -> HALF-UP -> (1 + 1)//2 = 1 for both pixels
    a = np.zeros((1, 2, 3), np.uint8)
    a[0, 1, :] = 1
    img = _blur_run(spark, [a], 1)["i0"][0]
    assert img[0, :, 0].tolist() == [1, 1]


def test_blur_flat_identity_and_validation(spark):
    a = np.full((6, 6, 3), 123, np.uint8)
    img, pix_sum, changed = _blur_run(spark, [a], 1)["i0"]
    assert changed == 0 and np.array_equal(img, a)
    with pytest.raises(ValueError):
        multimodal.box_blur(None, radius=0)
    with pytest.raises(ValueError):
        multimodal.box_blur(None, radius=8)


# ------------------------------------------------------- median filter


def _med_ref(a: np.ndarray):
    h, w, nb = a.shape
    out = np.empty_like(a)
    for r in range(h):
        for c in range(w):
            for b in range(nb):
                win = sorted(
                    int(a[rr, cc, b])
                    for rr in range(max(0, r - 1), min(h, r + 2))
                    for cc in range(max(0, c - 1), min(w, c + 2)))
                out[r, c, b] = win[(len(win) + 1) // 2 - 1]
    return out


def _med_run(spark, arrs):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    dec = {}
    for r in multimodal.median_filter(df).collect():
        dec[r["image_id"]] = (codecs.decode_image(bytes(r["out"]), "raw"),
                              r["pix_sum"], r["changed"])
    return dec


def test_median_vs_brute_force(spark):
    rng = np.random.default_rng(61)
    arrs = [rng.integers(0, 256, size=(8, 6, 3)).astype(np.uint8),
            rng.integers(0, 256, size=(4, 9, 3)).astype(np.uint8)]
    got = _med_run(spark, arrs)
    for k, a in enumerate(arrs):
        ref = _med_ref(a)
        img, pix_sum, changed = got[f"i{k}"]
        assert np.array_equal(img, ref), k
        assert pix_sum == int(ref.astype(np.int64).sum())
        assert changed == int((ref != a).sum())


def test_median_salt_pepper_removal(spark):
    # a single hot pixel in a flat field disappears (the classic use)
    a = np.full((5, 5, 3), 100, np.uint8)
    a[2, 2, :] = 255
    img, _, changed = _med_run(spark, [a])["i0"]
    assert np.all(img == 100)
    assert changed == 3  # only the spike moved (one pixel x 3 bands)


def test_median_lower_median_at_corner(spark):
    # the 2x2 corner window [0, 10, 20, 30]: lower median = 10 (NOT 15 —
    # interpolation would be wrong here; pins the quantile_disc rule)
    a = np.zeros((2, 2, 3), np.uint8)
    a[0, 1, :] = 10
    a[1, 0, :] = 20
    a[1, 1, :] = 30
    img = _med_run(spark, [a])["i0"][0]
    assert img[0, 0, 0] == 10


# ---------------------------------------------------------------- Otsu


def _otsu_ref(a: np.ndarray):
    """Direct textbook form: maximize wB·wF·(muB - muF)² with float
    means (an INDEPENDENT formulation of the same criterion — the
    engine maximizes the cross-multiplied integer square)."""
    h, w, nb = a.shape
    n = h * w
    out = {}
    for b in range(nb):
        vals = a[:, :, b].ravel()
        best = None
        for t in range(256):
            mb = vals[vals <= t]
            mf = vals[vals > t]
            if len(mb) == 0 or len(mf) == 0:
                continue
            crit = (len(mb) * len(mf)) * (float(mb.mean()) - float(mf.mean())) ** 2
            if best is None or crit > best[0] + 1e-6 * abs(best[0]):
                best = (crit, t, len(mb), int(mb.astype(np.int64).sum()))
        out[b] = None if best is None else best[1:]
    return out


def _otsu_run(spark, arrs):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return {
        (r["image_id"], r["b"]): (r["threshold"], r["wb"], r["sumb"])
        for r in multimodal.otsu_threshold(df).collect()
    }


def test_otsu_vs_textbook_reference(spark):
    rng = np.random.default_rng(67)
    # bimodal: two Gaussian-ish clumps -> unambiguous optimum
    lo = rng.integers(20, 60, size=(6, 9))
    hi = rng.integers(180, 230, size=(6, 9))
    mask = rng.random((6, 9)) < 0.5
    plane = np.where(mask, lo, hi).astype(np.uint8)
    a = np.repeat(plane[:, :, None], 3, axis=2)
    got = _otsu_run(spark, [a])
    ref = _otsu_ref(a)
    for b in range(3):
        assert got[("i0", b)] == ref[b], b


def test_otsu_hand_kat_two_values(spark):
    # half 10s, half 200s: any t in [10,199] separates perfectly; the
    # criterion is maximal on the whole plateau, tie-break picks t=10
    a = np.full((4, 6, 3), 10, np.uint8)
    a[:, 3:, :] = 200
    got = _otsu_run(spark, [a])[("i0", 0)]
    assert got == (10, 12, 120)


def test_otsu_constant_channel_absent(spark):
    a = np.full((3, 3, 3), 77, np.uint8)
    assert _otsu_run(spark, [a]) == {}


# ---------------------------------------------------------------- Canny


def _canny_ref(a: np.ndarray, lo, hi):
    from collections import deque

    h, w, nb = a.shape
    out = {}
    for b in range(nb):
        mag2 = _brute(a[:, :, b:b + 1])[:, :, 0]
        gx = np.zeros((h, w), int)
        gy = np.zeros((h, w), int)
        p = a[:, :, b].astype(int)

        def px(r, c):
            return p[r, c] if 0 <= r < h and 0 <= c < w else 0

        for r in range(h):
            for c in range(w):
                gx[r, c] = sum(wt * px(r + dr, c + dc) for dr, dc, wt in KX)
                gy[r, c] = sum(wt * px(r + dr, c + dc) for dr, dc, wt in KY)

        def m2(r, c):
            return int(mag2[r, c]) if 0 <= r < h and 0 <= c < w else 0

        keep = np.zeros((h, w), bool)
        for r in range(h):
            for c in range(w):
                if mag2[r, c] == 0:
                    continue
                axv, ayv = abs(gx[r, c]), abs(gy[r, c])
                if 2 * ayv <= axv:
                    d = (0, 1)
                elif 2 * axv <= ayv:
                    d = (1, 0)
                elif gx[r, c] * gy[r, c] > 0:
                    d = (1, 1)
                else:
                    d = (1, -1)
                if mag2[r, c] >= m2(r + d[0], c + d[1]) and \
                        mag2[r, c] >= m2(r - d[0], c - d[1]):
                    keep[r, c] = True
        strong = keep & (mag2 >= hi * hi)
        weak = keep & (mag2 >= lo * lo)
        edge = strong.copy()
        q = deque(zip(*np.nonzero(strong)))
        while q:
            r, c = q.popleft()
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < h and 0 <= cc < w and weak[rr, cc] and not edge[rr, cc]:
                        edge[rr, cc] = True
                        q.append((rr, cc))
        out[b] = (int(keep.sum()), int(strong.sum()),
                  int((weak & ~strong).sum()), int(edge.sum()),
                  int(mag2[edge].sum()))
    return out


def _canny_run(spark, arrs, lo=60, hi=120):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    return {
        (r["image_id"], r["b"]): (r["n_nms"], r["n_strong"], r["n_weak"],
                                  r["n_edge"], r["sum_mag2_edge"])
        for r in multimodal.canny_edges(df, lo=lo, hi=hi).collect()
    }


def test_canny_vs_scalar_reference(spark):
    rng = np.random.default_rng(83)
    arrs = [rng.integers(0, 256, size=(9, 8, 3)).astype(np.uint8)]
    got = _canny_run(spark, arrs)
    ref = _canny_ref(arrs[0], 60, 120)
    for b in range(3):
        assert got[("i0", b)] == ref[b], b


def test_canny_hysteresis_semantics(spark):
    # a strong vertical step and a DISCONNECTED weak step: the weak
    # step's pixels must NOT survive hysteresis...
    a = np.zeros((9, 16, 3), np.uint8)
    a[:, 2:4, :] = 200        # strong edge pair around c=1..4
    a[:, 12:14, :] = 20       # weak edge (mag ~80, < hi=120)
    got = _canny_run(spark, [a])[("i0", 0)]
    ref = _canny_ref(a, 60, 120)[0]
    assert got == ref
    assert got[2] > 0                      # kept-weak pixels exist
    disconnected_edges = got[3]
    # ...but when a strong bridge CONNECTS them, they join the edge set
    a2 = a.copy()
    a2[4, 4:12, :] = 200      # bridge row
    got2 = _canny_run(spark, [a2])[("i0", 0)]
    ref2 = _canny_ref(a2, 60, 120)[0]
    assert got2 == ref2
    assert got2[3] > disconnected_edges


def test_canny_flat_and_validation(spark):
    a = np.full((6, 6, 3), 50, np.uint8)
    got = _canny_run(spark, [a])
    ref = _canny_ref(a, 60, 120)
    assert got[("i0", 0)] == ref[0]  # only the zero-pad frame responds
    with pytest.raises(ValueError):
        multimodal.canny_edges(None, lo=0)
    with pytest.raises(ValueError):
        multimodal.canny_edges(None, lo=100, hi=50)


# ----------------------------------------------------------- mode filter


def _mode_ref(a: np.ndarray):
    from collections import Counter

    h, w, nb = a.shape
    out = np.empty_like(a)
    for r in range(h):
        for c in range(w):
            for b in range(nb):
                cnt = Counter(
                    int(a[rr, cc, b])
                    for rr in range(max(0, r - 1), min(h, r + 2))
                    for cc in range(max(0, c - 1), min(w, c + 2)))
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                out[r, c, b] = best[0]
    return out


def test_mode_vs_brute_force(spark):
    from tilers_tools_spark.operators import multimodal as mm

    rng = np.random.default_rng(19)
    arrs = [(rng.integers(0, 4, size=(8, 7, 3)) * 50).astype(np.uint8),
            rng.integers(0, 256, size=(5, 6, 3)).astype(np.uint8)]
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    got = {}
    for r in mm.mode_filter(df).collect():
        got[r["image_id"]] = (codecs.decode_image(bytes(r["out"]), "raw"),
                              r["pix_sum"], r["changed"])
    for k, a in enumerate(arrs):
        ref = _mode_ref(a)
        img, pix_sum, changed = got[f"i{k}"]
        assert np.array_equal(img, ref), k
        assert pix_sum == int(ref.astype(np.int64).sum())
        assert changed == int((ref != a).sum())


def test_mode_salt_noise_removal_and_tie(spark):
    from tilers_tools_spark.operators import multimodal as mm

    # speckle in a constant field vanishes
    a = np.full((6, 6, 3), 100, np.uint8)
    a[2, 2, :] = 7
    df = spark.createDataFrame(
        [("i0", codecs.encode_raw(a), "raw")],
        "image_id string, bytes binary, fmt string")
    r = mm.mode_filter(df).collect()[0]
    img = codecs.decode_image(bytes(r["out"]), "raw")
    assert np.all(img == 100) and r["changed"] == 3
    # 2x2 checkerboard corner: counts tie 2-2 -> smallest value wins
    a = np.zeros((2, 2, 3), np.uint8)
    a[0, 1, :] = 9
    a[1, 0, :] = 9
    df = spark.createDataFrame(
        [("i0", codecs.encode_raw(a), "raw")],
        "image_id string, bytes binary, fmt string")
    img = codecs.decode_image(
        bytes(mm.mode_filter(df).collect()[0]["out"]), "raw")
    assert np.all(img == 0)  # tie 2-2 everywhere, 0 < 9
