"""Douglas-Peucker simplification (functions/simplify.py) — hand KATs,
randomized agreement with an independent recursive reference, ring
variant, and the simplify_px wiring in the MVT builders."""

from __future__ import annotations

import math

import numpy as np

from tilers_tools_spark.functions import simplify as simp


def dp_recursive(pts: np.ndarray, tol: float) -> np.ndarray:
    """Independent textbook recursion (scalar distances)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j <= i + 1:
            return
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        norm = math.sqrt(dx * dx + dy * dy)
        best, bestd = -1, -1.0
        for k in range(i + 1, j):
            if norm == 0.0:
                d = math.hypot(pts[k][0] - ax, pts[k][1] - ay)
            else:
                d = abs((pts[k][0] - ax) * dy - (pts[k][1] - ay) * dx) / norm
            if d > bestd:
                bestd, best = d, k
        if bestd > tol:
            keep[best] = True
            rec(i, best)
            rec(best, j)

    rec(0, n - 1)
    return keep


def test_hand_kat():
    # zigzag: (0,0) (1,3) (2,0) (3,3) (4,0) — baseline y=0, interior
    # distances 3, 0, 3; first-max split keeps (1,3), then both remaining
    # interior points are sqrt(2)≈1.414 from the (1,3)-(4,0) chord
    pts = np.array([[0, 0], [1, 3], [2, 0], [3, 3], [4, 0]], dtype=float)
    assert simp.dp_mask(pts, 2.9).tolist() == [True, True, False, False, True]
    assert simp.dp_mask(pts, 1.0).tolist() == [True, True, True, True, True]
    assert simp.dp_mask(pts, 3.0).tolist() == [True, False, False, False, True]
    # strictly-greater rule: tol exactly == max distance does NOT split
    assert simp.dp_simplify(pts, 3.0).shape == (2, 2)
    # collinear interior always dropped
    line = np.array([[0, 0], [1, 1], [2, 2], [3, 3]], dtype=float)
    assert simp.dp_simplify(line, 0.0).shape == (2, 2)
    # but any off-line point survives tol=0
    kink = np.array([[0, 0], [1, 1.0001], [2, 2]], dtype=float)
    assert simp.dp_simplify(kink, 0.0).shape == (3, 2)


def test_matches_recursive_reference():
    rng = np.random.default_rng(11)
    for n in (2, 3, 10, 57, 200):
        pts = rng.uniform(-100, 100, size=(n, 2))
        for tol in (0.0, 1.0, 10.0, 60.0):
            assert simp.dp_mask(pts, tol).tolist() == dp_recursive(pts, tol).tolist(), (n, tol)


def test_coincident_endpoints():
    # closed loop fed as open polyline: endpoints equal -> distance to point
    pts = np.array([[0, 0], [5, 0], [5, 5], [0, 5], [0, 0]], dtype=float)
    m = simp.dp_mask(pts, 1.0)
    assert m.tolist() == dp_recursive(pts, 1.0).tolist()
    assert m.sum() >= 3  # the square survives


def test_ring_variant():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    # square survives a small tol untouched
    out = simp.dp_simplify_ring(sq, 1.0)
    assert out is not None and out.shape == (4, 2)
    # jitter vertex on an edge is removed
    ring = np.array([[0, 0], [5, 0.1], [10, 0], [10, 10], [0, 10]], dtype=float)
    out = simp.dp_simplify_ring(ring, 0.5)
    assert out is not None and [list(p) for p in out] == [[0, 0], [10, 0], [10, 10], [0, 10]]
    # degenerate at huge tol -> dropped
    assert simp.dp_simplify_ring(ring, 1e9) is None


def test_line_vector_tiles_simplify_px(spark):
    from tilers_tools_spark.functions import mvtcodec as mvt
    from tilers_tools_spark.operators import vectortiles as vt

    # jagged line: sub-pixel zigzag at z=2 collapses under simplify_px,
    # while the coarse shape (the two endpoints span) survives
    xs = np.linspace(-60.0, 60.0, 81)
    ys = np.array([0.02 if i % 2 else -0.02 for i in range(81)])
    wkt = "LINESTRING (" + ", ".join(f"{x} {y}" for x, y in zip(xs, ys)) + ")"
    plain = vt.line_vector_tiles(spark, [("l1", wkt)], z=2).collect()
    simpl = vt.line_vector_tiles(spark, [("l1", wkt)], z=2, simplify_px=2.0).collect()
    # cover may legitimately SHRINK (the collapsed chord stays south of
    # the equator the zigzag straddled) but never grows
    assert simpl and {(r["x"], r["y"]) for r in simpl} <= {(r["x"], r["y"]) for r in plain}
    n_plain = n_simp = 0
    for rows in (plain, simpl):
        for r in rows:
            layers = mvt.decode_mvt(bytes(r["tile"]))
            assert "lines" in layers
    # vertex count shrinks: compare total geometry ints
    n_plain = sum(len(bytes(r["tile"])) for r in plain)
    n_simp = sum(len(bytes(r["tile"])) for r in simpl)
    assert n_simp < n_plain


def test_polygon_vector_tiles_simplify_px(spark):
    from tilers_tools_spark.operators import vectortiles as vt

    # wiggly-edge square: wiggles are sub-tolerance, square survives
    edge = ", ".join(f"{x} {0.01 if i % 2 else -0.01}" for i, x in enumerate(np.linspace(-40, 40, 41)))
    wkt = f"POLYGON (({edge}, 40 40, -40 40, -40 {-0.01}))"
    plain = vt.polygon_vector_tiles(spark, [("p1", wkt)], z=1).collect()
    simpl = vt.polygon_vector_tiles(spark, [("p1", wkt)], z=1, simplify_px=4.0).collect()
    assert simpl and {(r["x"], r["y"]) for r in simpl} <= {(r["x"], r["y"]) for r in plain}
    assert sum(len(bytes(r["tile"])) for r in simpl) < sum(len(bytes(r["tile"])) for r in plain)
    assert all(r["n_features"] == 1 for r in simpl)
