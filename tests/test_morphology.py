"""morphology: engine vs brute-force scalar reference + classic
algebraic properties (open idempotence, erode/dilate complement
duality, gradient identity) and the documented ignore-outside border
rule pinned at a corner."""

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import multimodal


def _brute(a: np.ndarray, op: str) -> np.ndarray:
    """Direct per-pixel window scan over IN-BOUNDS neighbors only."""
    h, w = a.shape[:2]
    out = np.empty_like(a)
    red = np.max if op == "dilate" else np.min
    for r in range(h):
        for c in range(w):
            win = a[max(0, r - 1):min(h, r + 2), max(0, c - 1):min(w, c + 2)]
            out[r, c] = red(win.reshape(-1, *a.shape[2:]), axis=0)
    return out


def _img(rng, w, h):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _run(spark, arrs, op, iterations=1):
    rows = [(f"i{k}", codecs.encode_raw(a), "raw") for k, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = multimodal.morphology(df, op, iterations=iterations).collect()
    dec = {}
    for r in out:
        arr = codecs.decode_image(bytes(r["out"]), "raw")
        dec[r["image_id"]] = (arr, r["pix_sum"], r["changed"])
    return dec


def test_vs_brute_force_all_ops(spark):
    rng = np.random.default_rng(42)
    arrs = [_img(rng, 9, 7), _img(rng, 5, 5), _img(rng, 12, 3)]
    refs_d = [_brute(a, "dilate") for a in arrs]
    refs_e = [_brute(a, "erode") for a in arrs]
    for op, refs in (
        ("dilate", refs_d),
        ("erode", refs_e),
        ("open", [_brute(r, "dilate") for r in refs_e]),
        ("close", [_brute(r, "erode") for r in refs_d]),
        ("gradient", [d - e for d, e in zip(refs_d, refs_e)]),
    ):
        got = _run(spark, arrs, op)
        for k, ref in enumerate(refs):
            arr, psum, chg = got[f"i{k}"]
            assert np.array_equal(arr, ref), (op, k)
            assert psum == int(ref.astype(np.int64).sum())
            assert chg == int((ref != arrs[k]).sum())


def test_border_ignore_outside_corner(spark):
    # 2x2 single-band-ish (3 equal bands): corner windows see only the
    # 4 in-bounds pixels — dilate((0,0)) = max of all four = 9
    a = np.stack([np.array([[1, 5], [7, 9]], np.uint8)] * 3, axis=-1)
    got, _, _ = _run(spark, [a], "dilate")["i0"]
    assert (got == 9).all()
    got_e, _, _ = _run(spark, [a], "erode")["i0"]
    assert (got_e == 1).all()


def test_open_idempotent_and_duality(spark):
    rng = np.random.default_rng(7)
    a = _img(rng, 16, 11)
    once, _, _ = _run(spark, [a], "open")["i0"]
    twice, _, _ = _run(spark, [once], "open")["i0"]
    assert np.array_equal(once, twice)  # opening is idempotent
    # complement duality: erode(x) == 255 - dilate(255 - x)
    er, _, _ = _run(spark, [a], "erode")["i0"]
    dl, _, _ = _run(spark, [255 - a], "dilate")["i0"]
    assert np.array_equal(er, 255 - dl)


def test_iterations_compose(spark):
    rng = np.random.default_rng(11)
    a = _img(rng, 10, 8)
    two, _, _ = _run(spark, [a], "dilate", iterations=2)["i0"]
    one, _, _ = _run(spark, [a], "dilate")["i0"]
    again, _, _ = _run(spark, [one], "dilate")["i0"]
    assert np.array_equal(two, again)
    # open at k=2 is erode,erode,dilate,dilate — not open(open)
    o2, _, _ = _run(spark, [a], "open", iterations=2)["i0"]
    e1, _, _ = _run(spark, [a], "erode")["i0"]
    e2, _, _ = _run(spark, [e1], "erode")["i0"]
    d1, _, _ = _run(spark, [e2], "dilate")["i0"]
    d2, _, _ = _run(spark, [d1], "dilate")["i0"]
    assert np.array_equal(o2, d2)


def test_validation(spark):
    rows = [("x", b"", "raw")]
    df = None
    with pytest.raises(ValueError):
        multimodal.morphology(df, "blur")
    with pytest.raises(ValueError):
        multimodal.morphology(df, "erode", iterations=0)
