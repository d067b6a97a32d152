"""geostats: Gi* hot-spot + Moran's I vs textbook scalar references and
hand-worked KATs.

Independence: the scalar references below evaluate the PUBLISHED
definitions directly — Gi* from Ord & Getis 1995 eq. 6 with an explicit
dict-lookup neighborhood, Moran's I from the raw cross-product
Σ w_ij (v_i - xbar)(v_j - xbar) (NOT the engine's exact-integer
expansion Spp - 2*xbar*Sp + xbar²*W) — so an algebra slip in the
engine's expansion cannot self-confirm. Hand KATs pin a few values
computed on paper (see inline derivations)."""

import math
import random

import pandas as pd
import pytest

from tilers_tools_spark.operators import geostats


def _gi_ref(cells: dict):
    """Ord & Getis 1995 eq. 6, scalar; cells = {(cx,cy): v}."""
    n = len(cells)
    sv = sum(cells.values())
    svv = sum(v * v for v in cells.values())
    xbar = sv / n
    s = math.sqrt(max(svv / n - xbar * xbar, 0.0))
    out = {}
    for (x, y), v in cells.items():
        nb = [(x + dx, y + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        wx = sum(cells[c] for c in nb if c in cells)
        wn = sum(1 for c in nb if c in cells)
        var = (n * wn - wn * wn) / (n - 1) if n > 1 else 0.0
        if n > 1 and s > 0 and var > 0:
            z = (wx - xbar * wn) / (s * math.sqrt(var))
        else:
            z = None
        out[(x, y)] = (wx, wn, z)
    return out


def _moran_ref(cells: dict):
    """Moran 1950 raw cross-product form, scalar."""
    n = len(cells)
    xbar = sum(cells.values()) / n
    w = cross = 0
    for (x, y), v in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                o = cells.get((x + dx, y + dy))
                if o is not None:
                    w += 1
                    cross += (v - xbar) * (o - xbar)
    ssd = sum((v - xbar) ** 2 for v in cells.values())
    if w == 0 or ssd == 0:
        return w, None
    return w, (n / w) * (cross / ssd)


def _lisa_ref(cells: dict):
    """Anselin 1995 eq. 12, scalar, raw form (z_i/m2 * Σ w_ij z_j with
    z's subtracted per term — NOT the engine's wx - xbar*wn expansion)."""
    n = len(cells)
    xbar = sum(cells.values()) / n
    m2 = sum((v - xbar) ** 2 for v in cells.values()) / n
    out = {}
    for (x, y), v in cells.items():
        nb = [
            cells.get((x + dx, y + dy))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ]
        nb = [o for o in nb if o is not None]
        lag = sum(o - xbar for o in nb)
        ii = (v - xbar) / m2 * lag if (n > 1 and m2 > 0) else None
        out[(x, y)] = (sum(nb) if nb else 0, len(nb), ii)
    return out


def _df(spark, cells):
    return spark.createDataFrame(
        pd.DataFrame([(x, y, v) for (x, y), v in cells.items()], columns=["cx", "cy", "v"])
    )


def _gi_map(spark, cells):
    rows = geostats.getis_ord_gi(_df(spark, cells)).collect()
    assert len(rows) == len(cells)
    return {(r["cx"], r["cy"]): (r["wx"], r["wn"], r["z"]) for r in rows}


def test_gi_hand_kat_row3(spark):
    # row (0,0)=0 (1,0)=0 (2,0)=9: n=3 sv=9 svv=81 xbar=3 s=sqrt(18).
    # (2,0): wn=2 wx=9 -> (9-6)/(sqrt(18)*sqrt((6-4)/2)) = 3/sqrt(18) = 1/sqrt(2)
    # (0,0): wn=2 wx=0 -> -6/sqrt(18) = -sqrt(2)
    # (1,0): wn=3 -> n*wn - wn^2 = 0 -> NULL (whole-universe window degenerates)
    got = _gi_map(spark, {(0, 0): 0, (1, 0): 0, (2, 0): 9})
    assert got[(2, 0)][:2] == (9, 2)
    assert got[(2, 0)][2] == pytest.approx(1.0 / math.sqrt(2.0), abs=1e-12)
    assert got[(0, 0)][2] == pytest.approx(-math.sqrt(2.0), abs=1e-12)
    assert got[(1, 0)] == (9, 3, None)


def test_gi_full_block_degenerate(spark):
    # 2x2 block: every 3x3 window covers the whole universe (wn = n = 4)
    # -> n*wn - wn^2 = 0 for every cell -> all z NULL, wx = sv = 10.
    got = _gi_map(spark, {(0, 0): 1, (1, 0): 2, (0, 1): 3, (1, 1): 4})
    assert all(v == (10, 4, None) for v in got.values())


def test_gi_constant_values_null(spark):
    cells = {(x, y): 7 for x in range(4) for y in range(3)}
    got = _gi_map(spark, cells)
    assert all(z is None for (_, _, z) in got.values())


def test_gi_single_cell(spark):
    assert _gi_map(spark, {(5, -3): 42}) == {(5, -3): (42, 1, None)}


def test_moran_hand_kat_row3(spark):
    # row 0,0,9: W=4 directed pairs, Sp=9, Spp=0, xbar=3,
    # cross = 0 - 2*3*9 + 9*4 = -18, ssd = 81 - 27 = 54,
    # I = (3/4)*(-18/54) = -0.25; E[I] = -0.5.
    r = geostats.morans_i(_df(spark, {(0, 0): 0, (1, 0): 0, (2, 0): 9})).collect()[0]
    assert (r["n"], r["w"], r["sp"], r["spp"], r["sv"], r["svv"]) == (3, 4, 9, 0, 9, 81)
    assert r["i"] == pytest.approx(-0.25, abs=1e-12)
    assert r["e_i"] == pytest.approx(-0.5, abs=1e-12)


def test_moran_complete_graph_equals_expectation(spark):
    # fully-connected weights (2x2 block) force I = -1/(n-1) exactly.
    r = geostats.morans_i(_df(spark, {(0, 0): 1, (1, 0): 2, (0, 1): 3, (1, 1): 4})).collect()[0]
    assert r["i"] == pytest.approx(-1.0 / 3.0, abs=1e-12)
    assert r["e_i"] == pytest.approx(-1.0 / 3.0, abs=1e-12)


def test_moran_isolated_cells_null(spark):
    # no Chebyshev-1 pairs at all -> w = 0 -> I NULL.
    r = geostats.morans_i(_df(spark, {(0, 0): 1, (10, 10): 5, (-8, 3): 2})).collect()[0]
    assert r["w"] == 0 and r["i"] is None


def _lisa_map(spark, cells):
    rows = geostats.local_moran(_df(spark, cells)).collect()
    assert len(rows) == len(cells)
    return {(r["cx"], r["cy"]): (r["wx"], r["wn"], r["ii"], r["quad"]) for r in rows}


def test_lisa_hand_kat_row3(spark):
    # row (0,0)=0 (1,0)=0 (2,0)=9: xbar=3, m2=18.
    # (0,0): wx=0 wn=1 dev=-3 lag=-3 -> ii=0.5  LL
    # (1,0): wx=9 wn=2 dev=-3 lag=+3 -> ii=-0.5 LH
    # (2,0): wx=0 wn=1 dev=+6 lag=-3 -> ii=-1.0 HL
    got = _lisa_map(spark, {(0, 0): 0, (1, 0): 0, (2, 0): 9})
    assert got[(0, 0)][:2] == (0, 1) and got[(0, 0)][3] == "LL"
    assert got[(0, 0)][2] == pytest.approx(0.5, abs=1e-12)
    assert got[(1, 0)][:2] == (9, 2) and got[(1, 0)][3] == "LH"
    assert got[(1, 0)][2] == pytest.approx(-0.5, abs=1e-12)
    assert got[(2, 0)][:2] == (0, 1) and got[(2, 0)][3] == "HL"
    assert got[(2, 0)][2] == pytest.approx(-1.0, abs=1e-12)


def test_lisa_isolate_zero_lag(spark):
    # an isolated cell has no neighbors: wx=wn=0, lag = 0 -> ii = 0, NA quad
    got = _lisa_map(spark, {(0, 0): 1, (0, 1): 5, (10, 10): 3})
    assert got[(10, 10)][:2] == (0, 0)
    assert got[(10, 10)][2] == pytest.approx(0.0, abs=0.0)
    assert got[(10, 10)][3] == "NA"


def test_lisa_constant_values_null(spark):
    got = _lisa_map(spark, {(x, 0): 7 for x in range(5)})
    assert all(ii is None for (_, _, ii, _) in got.values())


def test_lisa_sum_equals_w_times_global_i(spark):
    # Σ_i I_i = W * I_global (both sides from the engine, exact algebra)
    cells = {(x, y): (x * 7 + y * 3) % 11 for x in range(6) for y in range(5) if (x + y) % 7 != 3}
    rows = geostats.local_moran(_df(spark, cells)).collect()
    g = geostats.morans_i(_df(spark, cells)).collect()[0]
    assert sum(r["ii"] for r in rows) == pytest.approx(g["w"] * g["i"], rel=1e-9)


def test_vs_scalar_reference_random_grids(spark):
    rng = random.Random(1234)
    for trial in range(4):
        cells = {}
        # clustered occupancy with gaps + a planted hotspot + an isolate
        for _ in range(90):
            cells[(rng.randrange(0, 12), rng.randrange(0, 12))] = rng.randrange(0, 6)
        for dx in range(2):
            for dy in range(2):
                cells[(20 + dx, 20 + dy)] = 40 + rng.randrange(0, 5)  # hotspot
        cells[(40, 40)] = rng.randrange(0, 6)  # isolate
        ref = _gi_ref(cells)
        got = _gi_map(spark, cells)
        assert set(got) == set(ref)
        for k in ref:
            assert got[k][0] == ref[k][0] and got[k][1] == ref[k][1], k
            if ref[k][2] is None:
                assert got[k][2] is None, k
            else:
                assert got[k][2] == pytest.approx(ref[k][2], rel=1e-9), k
        lref = _lisa_ref(cells)
        lgot = _lisa_map(spark, cells)
        assert set(lgot) == set(lref)
        for k in lref:
            assert lgot[k][:2] == lref[k][:2], k
            if lref[k][2] is None:
                assert lgot[k][2] is None, k
            else:
                assert lgot[k][2] == pytest.approx(lref[k][2], rel=1e-9, abs=1e-12), k
        w_ref, i_ref = _moran_ref(cells)
        r = geostats.morans_i(_df(spark, cells)).collect()[0]
        assert r["w"] == w_ref
        assert r["i"] == pytest.approx(i_ref, rel=1e-9)
        # the planted 2x2 hotspot must be hot: every member z > 2
        hot = [got[(20 + dx, 20 + dy)][2] for dx in range(2) for dy in range(2)]
        assert all(z is not None and z > 2.0 for z in hot)
        # and clustered high values must push I above its expectation
        assert r["i"] > r["e_i"]


def _ripley_ref(pts: dict, radii, area=None):
    """Ripley 1977 naive estimator, scalar all-pairs."""
    ids = list(pts)
    n = len(ids)
    xs = [p[0] for p in pts.values()]
    ys = [p[1] for p in pts.values()]
    a = area if area is not None else (max(xs) - min(xs)) * (max(ys) - min(ys))
    out = {}
    for d in radii:
        c = sum(
            1
            for i in ids
            for j in ids
            if i != j
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= d * d
        )
        k = a * c / (n * n) if (n > 1 and a > 0) else None
        out[d] = (c, k, math.sqrt(k / math.pi) if k is not None else None)
    return out


def _ripley_df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame([(i, x, y) for i, (x, y) in pts.items()], columns=["id", "x", "y"])
    )


def test_ripley_hand_kat_345(spark):
    # 3-4-5 triangle: (0,0),(3,0),(3,4); dists 3,4,5; A = 3*4 = 12, n = 3.
    # ordered pairs within d: d=3 -> 2, d=4 -> 4, d=5 -> 6 (boundary inclusive)
    rows = geostats.ripley_k(
        _ripley_df(spark, {1: (0, 0), 2: (3, 0), 3: (3, 4)}), [3, 4, 5]
    ).collect()
    got = {r["d"]: (r["npairs"], r["k"], r["l"], r["csr_k"]) for r in rows}
    assert got[3.0][0] == 2 and got[4.0][0] == 4 and got[5.0][0] == 6
    assert got[3.0][1] == pytest.approx(12 * 2 / 9, abs=1e-12)
    assert got[5.0][1] == pytest.approx(8.0, abs=1e-12)
    assert got[5.0][2] == pytest.approx(math.sqrt(8.0 / math.pi), abs=1e-12)
    assert got[3.0][3] == pytest.approx(math.pi * 9, abs=1e-12)


def test_ripley_duplicates_and_degenerate(spark):
    # coincident points: dist 0 pairs count at every radius
    rows = geostats.ripley_k(
        _ripley_df(spark, {1: (0, 0), 2: (0, 0), 3: (0, 5)}), [1, 10]
    ).collect()
    got = {r["d"]: r["npairs"] for r in rows}
    assert got[1.0] == 2 and got[10.0] == 6
    # collinear envelope -> area 0 -> NULL k/l, counts still exact
    r0 = geostats.ripley_k(_ripley_df(spark, {1: (0, 0), 2: (0, 5)}), [10]).collect()[0]
    assert r0["npairs"] == 2 and r0["k"] is None and r0["l"] is None
    # n = 1 -> no pairs, NULL k
    r1 = geostats.ripley_k(_ripley_df(spark, {1: (2, 3)}), [10]).collect()[0]
    assert r1["npairs"] == 0 and r1["k"] is None


def test_ripley_explicit_area_and_validation(spark):
    r = geostats.ripley_k(
        _ripley_df(spark, {1: (0, 0), 2: (3, 0)}), [3], area=100.0
    ).collect()[0]
    assert r["k"] == pytest.approx(100.0 * 2 / 4, abs=1e-12)
    with pytest.raises(ValueError):
        geostats.ripley_k(_ripley_df(spark, {1: (0, 0)}), [])
    with pytest.raises(ValueError):
        geostats.ripley_k(_ripley_df(spark, {1: (0, 0)}), [5, -1])


def test_ripley_vs_scalar_reference_random(spark):
    rng = random.Random(99)
    for trial in range(3):
        pts = {i: (rng.randrange(0, 200), rng.randrange(0, 150)) for i in range(220)}
        # plant a tight cluster so small radii are non-trivial, and an
        # exact-boundary pair (distance exactly 25: 7-24-25 triple)
        for k in range(8):
            pts[300 + k] = (50 + k % 3, 60 + k // 3)
        pts[400], pts[401] = (0, 0), (7, 24)
        radii = [5, 25, 60]
        ref = _ripley_ref(pts, radii)
        rows = geostats.ripley_k(_ripley_df(spark, pts), radii).collect()
        assert len(rows) == len(radii)
        for r in rows:
            c, k_, l_ = ref[r["d"]]
            assert r["npairs"] == c, r["d"]
            assert r["k"] == pytest.approx(k_, rel=1e-12)
            assert r["l"] == pytest.approx(l_, rel=1e-12)
        # multi-cell no-dup: widen the cell by re-running with a larger
        # max radius — counts for shared radii must be identical
        rows2 = geostats.ripley_k(_ripley_df(spark, pts), [5, 25, 60, 300]).collect()
        got2 = {r["d"]: r["npairs"] for r in rows2}
        assert all(got2[d] == ref[d][0] for d in map(float, radii))


def _sde(spark, pts):
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    return geostats.std_ellipse(df).collect()[0]


def test_sde_hand_kat_axis_aligned(spark):
    # (±1,0),(0,±2): means 0, vx=0.5 vy=2 vxy=0 -> λ1=2 λ2=0.5,
    # sigma_major=2, sigma_minor=1, slope NULL (aligned), ecc=sqrt(0.75),
    # theta = π/2 (major axis is the y axis)
    r = _sde(spark, [(1, 0), (-1, 0), (0, 2), (0, -2)])
    assert (r["n"], r["xbar"], r["ybar"]) == (4, 0.0, 0.0)
    assert (r["var_x"], r["var_y"], r["cov_xy"]) == (0.5, 2.0, 0.0)
    assert r["sigma_major"] == pytest.approx(2.0, abs=1e-15)
    assert r["sigma_minor"] == pytest.approx(1.0, abs=1e-15)
    assert r["slope_major"] is None
    assert r["theta_rad"] == pytest.approx(math.pi / 2, abs=1e-15)
    assert r["ecc"] == pytest.approx(math.sqrt(0.75), abs=1e-15)


def test_sde_hand_kat_collinear_45deg(spark):
    # perfectly collinear on y=x: λ2=0, slope 1, ecc 1, minor axis 0
    r = _sde(spark, [(1, 1), (-1, -1), (2, 2), (-2, -2)])
    assert (r["var_x"], r["var_y"], r["cov_xy"]) == (2.5, 2.5, 2.5)
    assert r["sigma_major"] == pytest.approx(math.sqrt(10.0), abs=1e-15)
    assert r["sigma_minor"] == 0.0
    assert r["slope_major"] == pytest.approx(1.0, abs=1e-15)
    assert r["theta_rad"] == pytest.approx(math.pi / 4, abs=1e-12)
    assert r["ecc"] == 1.0


def test_sde_point_mass_and_empty(spark):
    r = _sde(spark, [(7, -3), (7, -3), (7, -3)])
    assert (r["xbar"], r["ybar"]) == (7.0, -3.0)
    assert r["sigma_major"] == 0.0 and r["sigma_minor"] == 0.0
    assert r["ecc"] is None and r["slope_major"] is None
    import pyspark.sql.types as T

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.LongType())])
    )
    r0 = geostats.std_ellipse(empty).collect()[0]
    assert r0["n"] == 0 and r0["xbar"] is None and r0["sigma_major"] is None


def test_sde_vs_numpy_eig_random(spark):
    import numpy as np

    rng = random.Random(7)
    for trial in range(4):
        # anisotropic cloud with a planted rotation
        th = [0.3, 1.1, -0.7, 2.4][trial]
        pts = []
        for _ in range(300):
            u = rng.gauss(0, 40)
            v = rng.gauss(0, 9)
            pts.append(
                (round(u * math.cos(th) - v * math.sin(th)),
                 round(u * math.sin(th) + v * math.cos(th)))
            )
        r = _sde(spark, pts)
        a = np.array(pts, dtype=np.float64)
        cov = np.cov(a.T, bias=True)
        w, vec = np.linalg.eigh(cov)  # ascending
        assert r["var_x"] == pytest.approx(cov[0, 0], rel=1e-12)
        assert r["cov_xy"] == pytest.approx(cov[0, 1], rel=1e-12)
        assert r["sigma_major"] == pytest.approx(math.sqrt(2 * w[1]), rel=1e-9)
        assert r["sigma_minor"] == pytest.approx(math.sqrt(2 * w[0]), rel=1e-9)
        ev = vec[:, 1]  # major-axis eigenvector
        assert r["slope_major"] == pytest.approx(ev[1] / ev[0], rel=1e-6)
        assert r["ecc"] == pytest.approx(math.sqrt(1 - w[0] / w[1]), rel=1e-9)
        # theta agrees with the eigenvector direction mod π
        got = r["theta_rad"] % math.pi
        want = math.atan2(ev[1], ev[0]) % math.pi
        assert got == pytest.approx(want, abs=1e-6)


def _vario_ref(pts: dict, n_bins, w):
    """Matheron 1963 over unordered pairs, scalar; pts = {id: (x,y,v)}.
    Returns {bin: (ordered_npairs, sum_sq, gamma)}."""
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0])
    ids = list(pts)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            (x1, y1, v1), (x2, y2, v2) = pts[ids[a]], pts[ids[b]]
            d = math.sqrt((x1 - x2) ** 2 + (y1 - y2) ** 2)
            k = int(d // w)
            if k < n_bins:
                acc[k][0] += 1
                acc[k][1] += (v1 - v2) ** 2
    return {
        k: (2 * n, 2 * s, s / (2.0 * n) * 2.0 if n else None)  # ordered double
        for k, (n, s) in acc.items()
    }


def _vario_df(spark, pts):
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, x, y, v) for i, (x, y, v) in pts.items()],
            columns=["id", "x", "y", "v"],
        )
    )


def test_variogram_hand_kat(spark):
    # ids 1..3 at (0,0,v=0) (3,0,v=2) (3,4,v=7): dists 3,4,5.
    # bins w=4, n_bins=2: bin0 = {d=3 pair, dv=2}, bin1 = {d=4 dv=5, d=5 dv=7}
    # ordered: bin0 npairs=2 sum=8 gamma=8/4=2; bin1 npairs=4 sum=2*(25+49)=148 gamma=148/8=18.5
    rows = geostats.variogram(
        _vario_df(spark, {1: (0, 0, 0), 2: (3, 0, 2), 3: (3, 4, 7)}), 2, 4.0
    ).collect()
    got = {r["bin"]: (r["npairs"], r["sum_sq"], r["gamma"], r["d_lo"], r["d_hi"]) for r in rows}
    assert got[0] == (2, 8, 2.0, 0.0, 4.0)
    assert got[1] == (4, 148, 18.5, 4.0, 8.0)


def test_variogram_excludes_beyond_and_coincident_bin0(spark):
    # pair at distance 10 with n_bins*w = 8 -> excluded entirely;
    # coincident pair (d=0) with different values lands in bin 0
    rows = geostats.variogram(
        _vario_df(spark, {1: (0, 0, 1), 2: (10, 0, 9), 3: (0, 0, 4)}), 2, 4.0
    ).collect()
    got = {r["bin"]: (r["npairs"], r["sum_sq"]) for r in rows}
    assert got[0] == (2, 18)  # the coincident pair only: 2*(1-4)^2
    assert 1 not in got  # d=10 pairs beyond max_dist are gone


def test_variogram_vs_scalar_reference_random(spark):
    rng = random.Random(5)
    for trial in range(3):
        pts = {
            i: (rng.randrange(0, 300), rng.randrange(0, 200), rng.randrange(0, 50))
            for i in range(250)
        }
        n_bins, w = 5, 30.0
        ref = _vario_ref(pts, n_bins, w)
        rows = geostats.variogram(_vario_df(spark, pts), n_bins, w).collect()
        got = {r["bin"]: (r["npairs"], r["sum_sq"], r["gamma"]) for r in rows}
        assert set(got) == set(ref)
        for k, (n, s, _g) in ref.items():
            assert got[k][0] == n and got[k][1] == s, k
            assert got[k][2] == pytest.approx(s / (2.0 * n), rel=1e-15)


def test_variogram_validation(spark):
    with pytest.raises(ValueError):
        geostats.variogram(_vario_df(spark, {1: (0, 0, 0)}), 0, 4.0)
    with pytest.raises(ValueError):
        geostats.variogram(_vario_df(spark, {1: (0, 0, 0)}), 3, 0.0)


def _mk_ref(vals, alpha=1.96):
    """Scalar Mann-Kendall (Mann 1945 / Kendall; tie-corrected variance
    per tied-GROUP sums — not the engine's per-element expansion)."""
    from collections import Counter

    n = len(vals)
    s = sum(
        (0 if vals[j] == vals[i] else (1 if vals[j] > vals[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(vals)
    num = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    if num == 0:
        return s, num, None, "flat"
    var = num / 18.0
    z = (s - 1.0) / math.sqrt(var) if s > 0 else ((s + 1.0) / math.sqrt(var) if s < 0 else 0.0)
    trend = "increasing" if z >= alpha else ("decreasing" if z <= -alpha else "none")
    return s, num, z, trend


def _mk_run(spark, cube, n_bins):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(cx, cy, b, v) for (cx, cy), bins in cube.items() for b, v in bins.items()],
            columns=["cx", "cy", "bin", "v"],
        )
    )
    rows = geostats.mann_kendall(df, n_bins).collect()
    return {(r["cx"], r["cy"]): (r["s"], r["var18"], r["z"], r["trend"]) for r in rows}


def test_mk_hand_kat_monotone(spark):
    # strictly increasing 8 bins: S = 28, no ties, num = 8*7*21 = 1176,
    # z = 27/sqrt(1176/18) = 27/sqrt(65.333..) -> increasing
    got = _mk_run(spark, {(0, 0): {b: b + 1 for b in range(8)}}, 8)
    s, num, z, trend = got[(0, 0)]
    assert (s, num) == (28, 1176)
    assert z == pytest.approx(27.0 / math.sqrt(1176 / 18.0), abs=1e-12)
    assert trend == "increasing"
    # strictly decreasing mirrors to S = -28
    got = _mk_run(spark, {(0, 0): {b: 8 - b for b in range(8)}}, 8)
    assert got[(0, 0)][0] == -28 and got[(0, 0)][3] == "decreasing"


def test_mk_zero_fill_and_flat(spark):
    # one bin present -> 7 zero bins: ties among zeros, the zero-fill is real
    ref = _mk_ref([5, 0, 0, 0, 0, 0, 0, 0][:8])
    got = _mk_run(spark, {(1, 1): {0: 5}}, 8)
    assert got[(1, 1)][:2] == (ref[0], ref[1])
    # all-equal cube (value in every bin identical) -> var18 = 0, flat
    got = _mk_run(spark, {(2, 2): {b: 4 for b in range(8)}}, 8)
    assert got[(2, 2)] == (0, 0, None, "flat")


def test_mk_vs_scalar_reference_random(spark):
    rng = random.Random(31)
    cube = {}
    for cx in range(6):
        for cy in range(4):
            # sparse: each cell gets 3..8 occupied bins with small values (ties likely)
            occ = rng.sample(range(8), rng.randrange(3, 9))
            cube[(cx, cy)] = {b: rng.randrange(0, 4) for b in occ}
    got = _mk_run(spark, cube, 8)
    for key, bins in cube.items():
        vals = [bins.get(b, 0) for b in range(8)]
        s, num, z, trend = _mk_ref(vals)
        assert got[key][0] == s and got[key][1] == num, key
        if z is None:
            assert got[key][2] is None and got[key][3] == "flat"
        else:
            assert got[key][2] == pytest.approx(z, abs=1e-12), key
            assert got[key][3] == trend, key


def test_mk_validation(spark):
    with pytest.raises(ValueError):
        geostats.mann_kendall(None, 1)
    with pytest.raises(ValueError):
        geostats.mann_kendall(None, 17)


def test_sen_slope_matches_scalar_median(spark):
    import statistics

    rng = random.Random(77)
    cube = {}
    for cx in range(5):
        occ = rng.sample(range(8), rng.randrange(2, 9))
        cube[(cx, 0)] = {b: rng.randrange(0, 6) for b in occ}
    cube[(9, 9)] = {b: 3 * b + 1 for b in range(8)}  # exact slope 3 everywhere
    df = spark.createDataFrame(
        pd.DataFrame(
            [(cx, cy, b, v) for (cx, cy), bins in cube.items() for b, v in bins.items()],
            columns=["cx", "cy", "bin", "v"],
        )
    )
    rows = geostats.mann_kendall(df, 8).collect()
    got = {(r["cx"], r["cy"]): r["sen_slope"] for r in rows}
    for key, bins in cube.items():
        vals = [bins.get(b, 0) for b in range(8)]
        slopes = sorted(
            (vals[j] - vals[i]) / (j - i)
            for i in range(8) for j in range(i + 1, 8)
        )
        ref = statistics.median(slopes)
        assert got[key] == pytest.approx(ref, abs=1e-12), key
    assert got[(9, 9)] == pytest.approx(3.0, abs=0.0)


# ---------------------------------------------------------------- EHSA


def _ehsa_ref(obs: dict, n_bins: int, alpha: float = 1.96):
    """Scalar Emerging Hot Spot reference — the whole published
    composition evaluated directly with dict lookups (Esri EHSA doc):
    zero-filled cube, 3x3x3 space-time Gi* (Ord & Getis 1995 closed form,
    global moments over the cube), Mann-Kendall on each cell's Gi* z
    series, then the category decision list transcribed from the spec
    prose (NOT shared with the engine's Column/CASE construction).
    obs = {(cx, cy, bin): v}. Returns {(cx,cy): (n_hot, n_cold, z_final,
    s, var18, z_mk, trend, category)}."""
    cells = sorted({(x, y) for (x, y, _) in obs})
    cube = {
        (x, y, b): obs.get((x, y, b), 0) for (x, y) in cells for b in range(n_bins)
    }
    n = float(len(cube))
    sv = sum(cube.values())
    svv = sum(v * v for v in cube.values())
    xbar = sv / n
    s2 = svv / n - xbar * xbar
    z = {}
    for (x, y, b) in cube:
        wx = 0
        wn = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for db in (-1, 0, 1):
                    k = (x + dx, y + dy, b + db)
                    if k in cube:
                        wx += cube[k]
                        wn += 1
        denom_in = (n * wn - wn * wn) / (n - 1.0)
        if n > 1 and s2 > 0 and denom_in > 0:
            z[(x, y, b)] = (wx - xbar * wn) / (math.sqrt(s2) * math.sqrt(denom_in))
        else:
            z[(x, y, b)] = None
    out = {}
    for (x, y) in cells:
        zs = [z[(x, y, b)] for b in range(n_bins)]
        s, num, z_mk, trend = _mk_ref(tuple(zs))
        if num == 0:
            z_mk, trend = None, "flat"
        hot = [zz is not None and zz >= alpha for zz in zs]
        cold = [zz is not None and zz <= -alpha for zz in zs]
        nh, nc = sum(hot), sum(cold)
        fh, fc = hot[-1], cold[-1]
        hot90 = nh * 10 >= 9 * n_bins
        cold90 = nc * 10 >= 9 * n_bins
        hsuffix = hot == [b >= n_bins - nh for b in range(n_bins)]
        csuffix = cold == [b >= n_bins - nc for b in range(n_bins)]
        if fh and nh == 1 and nc == 0:
            cat = "new hot"
        elif fh and nh >= 2 and hsuffix and not hot90 and nc == 0:
            cat = "consecutive hot"
        elif fh and hot90 and trend == "increasing":
            cat = "intensifying hot"
        elif fh and hot90 and trend == "decreasing":
            cat = "diminishing hot"
        elif fh and hot90:
            cat = "persistent hot"
        elif not fh and hot90:
            cat = "historical hot"
        elif fh and not hot90 and nh >= 2 and nc == 0:
            cat = "sporadic hot"
        elif fh and not hot90 and nc >= 1:
            cat = "oscillating hot"
        elif fc and nc == 1 and nh == 0:
            cat = "new cold"
        elif fc and nc >= 2 and csuffix and not cold90 and nh == 0:
            cat = "consecutive cold"
        elif fc and cold90 and trend == "decreasing":
            cat = "intensifying cold"
        elif fc and cold90 and trend == "increasing":
            cat = "diminishing cold"
        elif fc and cold90:
            cat = "persistent cold"
        elif not fc and cold90:
            cat = "historical cold"
        elif fc and not cold90 and nc >= 2 and nh == 0:
            cat = "sporadic cold"
        elif fc and not cold90 and nh >= 1:
            cat = "oscillating cold"
        else:
            cat = "no pattern"
        out[(x, y)] = (nh, nc, zs[-1], s, num, z_mk, trend, cat)
    return out


def _ehsa_run(spark, obs, n_bins):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(cx, cy, b, v) for (cx, cy, b), v in obs.items()],
            columns=["cx", "cy", "bin", "v"],
        )
    )
    rows = geostats.emerging_hotspot(df, n_bins).collect()
    return {
        (r["cx"], r["cy"]): (
            r["n_hot"], r["n_cold"], r["z_final"], r["s"], r["var18"],
            r["z_mk"], r["trend"], r["category"],
        )
        for r in rows
    }


def test_ehsa_vs_scalar_reference_random(spark):
    rng = random.Random(41)
    obs = {}
    for cx in range(8):
        for cy in range(5):
            for b in rng.sample(range(5), rng.randrange(1, 6)):
                obs[(cx, cy, b)] = rng.randrange(0, 12)
    # plant structure so the category space is exercised, not just the
    # math: an always-elevated 3x3 block (persistent hot), a late-onset
    # block (consecutive/oscillating hot — early bins go COLD relative
    # to the elevated global mean, which is the published oscillating
    # semantics), a final-bin-only block, and a forced-quiet column
    for x in (1, 2, 3):
        for y in (1, 2, 3):
            for b in range(5):
                obs[(x, y, b)] = 40
    for x in (6, 7):
        for y in (0, 1):
            for b in (3, 4):
                obs[(x, y, b)] = 50
    for x in (5, 6, 7):
        for y in (3, 4):
            obs[(x, y, 4)] = 80
    for x in (0,):
        for y in range(5):
            for b in range(5):
                obs.pop((x, y, b), None)
            obs[(x, y, 0)] = 0
    got = _ehsa_run(spark, obs, 5)
    ref = _ehsa_ref(obs, 5)
    assert set(got) == set(ref)
    for key, r in ref.items():
        g = got[key]
        assert (g[0], g[1]) == (r[0], r[1]), key  # n_hot, n_cold exact
        assert g[2] == pytest.approx(r[2], abs=1e-12), key  # z_final
        assert (g[3], g[4]) == (r[3], r[4]), key  # MK s, var18 exact ints
        if r[5] is None:
            assert g[5] is None, key
        else:
            assert g[5] == pytest.approx(r[5], abs=1e-12), key
        assert g[6] == r[6], key  # trend
        assert g[7] == r[7], key  # category
    cats = {r[7] for r in ref.values()}
    # the fixture exercises >= 4 categories (measured: no pattern,
    # oscillating hot, persistent hot, consecutive hot)
    assert len(cats) >= 4, cats


def test_ehsa_planted_persistent_hot(spark):
    # isolated 9x9 zero field with one cell spiking in EVERY bin: that
    # cell is hot in all bins (hot90), and a flat series has no trend ->
    # 'persistent hot'. Verified against the scalar reference too.
    obs = {(x, y, 0): 0 for x in range(9) for y in range(9)}
    for b in range(4):
        obs[(4, 4, b)] = 1000
    got = _ehsa_run(spark, obs, 4)
    ref = _ehsa_ref(obs, 4)
    assert got[(4, 4)][7] == ref[(4, 4)][7] == "persistent hot"
    assert got[(4, 4)][0] == 4  # hot in every bin


def test_ehsa_all_zero_cube_no_pattern(spark):
    # constant field (all-zero is the only constant reachable through
    # zero-fill) -> global variance 0 -> every Gi* z NULL -> no hot/cold
    # bins anywhere -> 'no pattern', z_final NULL, MK s degenerates to 0
    # over the all-NULL series (signs of NULL differences are 0)
    obs = {(x, y, 0): 0 for x in range(3) for y in range(3)}
    got = _ehsa_run(spark, obs, 3)
    for key, g in got.items():
        assert g[2] is None and g[7] == "no pattern", key


def test_ehsa_validation(spark):
    with pytest.raises(ValueError):
        geostats.emerging_hotspot(None, 1)
    with pytest.raises(ValueError):
        geostats.emerging_hotspot(None, 17)


# ---------------------------------------------------------- kernel density


def _kde_ref(pts, radius):
    """Naive scalar reference: corners of occupied cells (cell=radius),
    min over nothing — every corner x every point, strict d^2 < R^2."""
    r2 = radius * radius
    corners = {
        (math.floor(x / radius) * radius, math.floor(y / radius) * radius)
        for x, y in pts
    }
    out = {}
    for ex, ey in corners:
        npts = 0
        num = 0
        for x, y in pts:
            d2 = (x - ex) ** 2 + (y - ey) ** 2
            if d2 < r2:
                npts += 1
                num += (r2 - d2) ** 2
        if npts:
            out[(ex, ey)] = (npts, num, 3.0 * num / (math.pi * radius ** 6))
    return out


def _kde_run(spark, pts, radius, cell=None):
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    out = geostats.kernel_density(df, radius=radius, cell=cell or radius)
    return {
        (r["ex"], r["ey"]): (r["npts"], r["num"], r["density"])
        for r in out.collect()
    }


def test_kde_hand_kat(spark):
    # single point on its own corner: d2 = 0 -> num = R^4
    got = _kde_run(spark, [(0, 0)], 10)
    assert got == {(0, 0): (1, 10000, pytest.approx(30000.0 / (math.pi * 1e6)))}
    # exactly-at-radius is EXCLUDED (strict ball; kernel is 0 there anyway)
    got = _kde_run(spark, [(0, 0), (10, 0)], 10)
    assert got[(0, 0)][0] == 1  # the (10,0) point is at d = R from (0,0)
    # interior point seen by a NEIGHBOR cell's corner too
    got = _kde_run(spark, [(5, 5), (12, 0)], 10)
    ref = _kde_ref([(5, 5), (12, 0)], 10)
    assert set(got) == set(ref)
    for k in ref:
        assert got[k][:2] == ref[k][:2], k


def test_kde_vs_scalar_reference_random(spark):
    rng = random.Random(97)
    for trial, (n, r) in enumerate([(120, 7), (300, 15), (80, 30)]):
        pts = [(rng.randrange(-100, 100), rng.randrange(-100, 100)) for _ in range(n)]
        got = _kde_run(spark, pts, r)
        ref = _kde_ref(pts, r)
        assert set(got) == set(ref), trial
        for k, (npts, num, dens) in ref.items():
            assert got[k][0] == npts and got[k][1] == num, (trial, k)
            assert got[k][2] == pytest.approx(dens, abs=0.0), (trial, k)


def test_kde_cell_wider_than_radius(spark):
    # cell > radius is allowed (sparser eval lattice, window still covers)
    rng = random.Random(5)
    pts = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(150)]
    got = _kde_run(spark, pts, 8, cell=20)
    r2 = 64
    corners = {(math.floor(x / 20) * 20, math.floor(y / 20) * 20) for x, y in pts}
    for (ex, ey), (npts, num, _) in got.items():
        assert (ex, ey) in corners
        ref_n = sum(1 for x, y in pts if (x - ex) ** 2 + (y - ey) ** 2 < r2)
        ref_s = sum((r2 - (x - ex) ** 2 - (y - ey) ** 2) ** 2
                    for x, y in pts if (x - ex) ** 2 + (y - ey) ** 2 < r2)
        assert (npts, num) == (ref_n, ref_s)


def test_kde_validation(spark):
    with pytest.raises(ValueError):
        geostats.kernel_density(None, 0, 10)
    with pytest.raises(ValueError):
        geostats.kernel_density(None, 10, 5)


# ------------------------------------------------------------------ Knox


def _knox_ref(pts, eps, tau):
    """Naive scalar reference over unordered pairs; pts = [(id,x,y,t)]."""
    n = len(pts)
    ns = nt = x = 0
    for i in range(n):
        for j in range(i + 1, n):
            d2 = (pts[i][1] - pts[j][1]) ** 2 + (pts[i][2] - pts[j][2]) ** 2
            s = float(d2) <= eps * eps
            t = abs(pts[i][3] - pts[j][3]) <= tau
            ns += s
            nt += t
            x += s and t
    npairs = n * (n - 1) // 2
    e_x = (float(ns) * float(nt)) / float(npairs) if npairs else 0.0
    ratio = float(x) / e_x if e_x > 0 else None
    return n, npairs, ns, nt, x, e_x, ratio


def _knox_run(spark, pts, eps, tau):
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["id", "x", "y", "t"]))
    r = geostats.knox_test(df, eps=eps, tau=tau).collect()[0]
    return (r["n"], r["npairs"], r["ns"], r["nt"], r["x"], r["e_x"], r["ratio"])


def test_knox_hand_kat(spark):
    # A(0,0,t0) B(3,4,t100) C(100,100,t5), eps=6, tau=10:
    # AB spatial only (d2=25<=36), AC temporal only (|5|<=10), BC neither
    got = _knox_run(spark, [(1, 0, 0, 0), (2, 3, 4, 100), (3, 100, 100, 5)], 6.0, 10)
    assert got[:5] == (3, 3, 1, 1, 0)
    assert got[5] == pytest.approx(1.0 / 3.0, abs=0.0)
    assert got[6] == pytest.approx(0.0, abs=0.0)


def test_knox_inclusive_boundaries(spark):
    # d2 exactly eps^2 and dt exactly tau both COUNT (documented)
    got = _knox_run(spark, [(1, 0, 0, 0), (2, 3, 4, 10)], 5.0, 10)
    assert got[2:5] == (1, 1, 1)
    assert got[6] == pytest.approx(1.0, abs=0.0)


def test_knox_vs_scalar_reference_random(spark):
    rng = random.Random(271)
    for trial, (n, eps, tau) in enumerate([(80, 9.0, 5), (150, 4.5, 12), (60, 25.0, 0)]):
        pts = [
            (i, rng.randrange(-40, 40), rng.randrange(-40, 40), rng.randrange(0, 50))
            for i in range(n)
        ]
        got = _knox_run(spark, pts, eps, tau)
        ref = _knox_ref(pts, eps, tau)
        assert got[:5] == ref[:5], trial
        assert got[5] == pytest.approx(ref[5], abs=0.0), trial
        if ref[6] is None:
            assert got[6] is None, trial
        else:
            assert got[6] == pytest.approx(ref[6], abs=0.0), trial


def test_knox_coincident_and_validation(spark):
    # coincident points in space AND time: everything pairs
    got = _knox_run(spark, [(1, 5, 5, 9), (2, 5, 5, 9), (3, 5, 5, 9)], 2.0, 0)
    assert got[:5] == (3, 3, 3, 3, 3)
    assert got[6] == pytest.approx(1.0, abs=0.0)
    with pytest.raises(ValueError):
        geostats.knox_test(None, 0.0, 5)
    with pytest.raises(ValueError):
        geostats.knox_test(None, 1.0, -1)


# ----------------------------------------------------------- Clark-Evans


def _ce_ref(pts, max_dist):
    """Naive scalar reference; pts = [(id, x, y)]."""
    md2 = max_dist * max_dist
    n = len(pts)
    nnd = {}
    for i, (pid, x, y) in enumerate(pts):
        best = None
        for j, (qid, u, v) in enumerate(pts):
            if qid == pid:
                continue
            d2 = (x - u) ** 2 + (y - v) ** 2
            if d2 <= md2 and (best is None or d2 < best):
                best = d2
        if best is not None:
            nnd[pid] = math.floor(math.sqrt(float(best)))
    xs = [p[1] for p in pts]
    ys = [p[2] for p in pts]
    area = (max(xs) - min(xs)) * (max(ys) - min(ys))
    n_nn = len(nnd)
    sum_q = sum(nnd.values())
    mean_nnd = sum_q / n_nn if n_nn else None
    expected = 0.5 / math.sqrt(n / area) if area > 0 else None
    ce = mean_nnd / expected if (mean_nnd is not None and expected) else None
    return n, n_nn, n - n_nn, sum_q, area, mean_nnd, expected, ce


def _ce_run(spark, pts, max_dist):
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["id", "x", "y"]))
    r = geostats.clark_evans(df, max_dist=max_dist).collect()[0]
    return (r["n"], r["n_nn"], r["n_far"], r["sum_nnd_q"], r["area"],
            r["mean_nnd"], r["expected"], r["ce_index"])


def test_ce_vs_scalar_reference_random(spark):
    rng = random.Random(311)
    for trial, (n, md) in enumerate([(120, 15), (60, 8), (200, 40)]):
        pts = [(i, rng.randrange(0, 120), rng.randrange(0, 120)) for i in range(n)]
        got = _ce_run(spark, pts, md)
        ref = _ce_ref(pts, md)
        assert got[:5] == ref[:5], trial
        for gi, ri in zip(got[5:], ref[5:]):
            assert gi == pytest.approx(ri, abs=0.0), trial


def test_ce_hand_kat_grid(spark):
    # a perfect 3x3 lattice with spacing 10 inside a 20x20 box:
    # every NN distance is exactly 10, area = 400, n = 9,
    # expected = 0.5/sqrt(9/400) = 10/3, ce = 10/(10/3) = 3
    pts = [(3 * r + c, 10 * c, 10 * r) for r in range(3) for c in range(3)]
    got = _ce_run(spark, pts, 15)
    assert got[:5] == (9, 9, 0, 90, 400)
    assert got[5] == pytest.approx(10.0, abs=0.0)
    assert got[7] == pytest.approx(3.0, rel=1e-12)


def test_ce_far_points_excluded(spark):
    # an isolated outlier beyond the cap -> n_far = 1, excluded
    pts = [(1, 0, 0), (2, 3, 4), (3, 1000, 1000)]
    got = _ce_run(spark, pts, 10)
    assert got[1:4] == (2, 1, 10)  # two NN at exactly 5 -> sum 10


def test_ce_validation(spark):
    with pytest.raises(ValueError):
        geostats.clark_evans(None, 0)


# ------------------------------------------------- Geary's C / General G


def _geary_ref(cells: dict):
    """Geary 1954 raw form, scalar."""
    n = len(cells)
    xbar = sum(cells.values()) / n
    w = num = 0
    for (x, y), v in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                o = cells.get((x + dx, y + dy))
                if o is not None:
                    w += 1
                    num += (v - o) ** 2
    ssd = sum((v - xbar) ** 2 for v in cells.values())
    if w == 0 or ssd == 0:
        return w, num, None
    return w, num, ((n - 1) * num) / (2 * w * ssd)


def _gg_ref(cells: dict):
    """Getis & Ord 1992 raw form, scalar."""
    vals = list(cells.values())
    w = spp = 0
    for (x, y), v in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                o = cells.get((x + dx, y + dy))
                if o is not None:
                    w += 1
                    spp += v * o
    denom = sum(a * b for a in vals for b in vals) - sum(v * v for v in vals)
    return w, spp, denom, (spp / denom if denom else None)


def test_geary_hand_kat_row3(spark):
    # row 0,0,9: pairs (0,0),(0,9) each twice: num = 2*81 = 162, W = 4,
    # ssd = 54, C = 2*162/(8*54) = 0.75
    r = geostats.geary_c(_df(spark, {(0, 0): 0, (1, 0): 0, (2, 0): 9})).collect()[0]
    assert (r["n"], r["w"], r["num"], r["sv"], r["svv"]) == (3, 4, 162, 9, 81)
    assert r["c"] == pytest.approx(0.75, abs=1e-12)
    assert r["e_c"] == pytest.approx(1.0, abs=0.0)


def test_geary_constant_null_and_isolates(spark):
    r = geostats.geary_c(_df(spark, {(x, 0): 5 for x in range(4)})).collect()[0]
    assert r["c"] is None  # zero variance
    r = geostats.geary_c(_df(spark, {(0, 0): 1, (9, 9): 2})).collect()[0]
    assert r["w"] == 0 and r["c"] is None


def test_general_g_hand_kat_row3(spark):
    # row 1,2,4: neighbor cross-sum spp = 2*(1*2) + 2*(2*4) = 20,
    # denom = (1+2+4)² - (1+4+16) = 49 - 21 = 28, G = 20/28
    r = geostats.general_g(_df(spark, {(0, 0): 1, (1, 0): 2, (2, 0): 4})).collect()[0]
    assert (r["n"], r["w"], r["spp"], r["denom"]) == (3, 4, 20, 28)
    assert r["g"] == pytest.approx(20.0 / 28.0, abs=1e-12)
    assert r["e_g"] == pytest.approx(4.0 / 6.0, abs=1e-12)


def test_geary_gg_vs_scalar_reference_random(spark):
    rng = random.Random(401)
    for trial in range(3):
        cells = {}
        for _ in range(70):
            cells[(rng.randrange(0, 10), rng.randrange(0, 10))] = rng.randrange(0, 9)
        rg = geostats.geary_c(_df(spark, cells)).collect()[0]
        w, num, c = _geary_ref(cells)
        assert (rg["w"], rg["num"]) == (w, num), trial
        if c is None:
            assert rg["c"] is None
        else:
            assert rg["c"] == pytest.approx(c, rel=1e-12), trial
        gg = geostats.general_g(_df(spark, cells)).collect()[0]
        w2, spp, denom, g = _gg_ref(cells)
        assert (gg["w"], gg["spp"], gg["denom"]) == (w2, spp, denom), trial
        if g is None:
            assert gg["g"] is None
        else:
            assert gg["g"] == pytest.approx(g, rel=1e-12), trial


def test_general_g_negative_value_fails(spark):
    with pytest.raises(Exception, match="requires v >= 0"):
        geostats.general_g(_df(spark, {(0, 0): 1, (1, 0): -2})).collect()


# --------------------------------------------------------------- quadrat


def _quad_ref(pts, cell):
    import math as m

    cells = {}
    for x, y in pts:
        k = (m.floor(x / cell), m.floor(y / cell))
        cells[k] = cells.get(k, 0) + 1
    xs = [k[0] for k in cells]
    ys = [k[1] for k in cells]
    q = (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
    n = len(pts)
    counts = list(cells.values()) + [0] * (q - len(cells))
    nbar = n / q
    chi2 = sum((c - nbar) ** 2 for c in counts) / nbar
    s2 = sum((c - nbar) ** 2 for c in counts) / (q - 1) if q > 1 else None
    vmr = s2 / nbar if s2 is not None else None
    return q, n, sum(c * c for c in counts), chi2, vmr


def _quad_run(spark, pts, cell):
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
    r = geostats.quadrat_test(df, cell=cell).collect()[0]
    return r["q"], r["npts"], r["sum_sq"], r["df"], r["chi2"], r["vmr"]


def test_quadrat_vs_scalar_reference_random(spark):
    rng = random.Random(511)
    for trial, (n, cell) in enumerate([(200, 10), (60, 25), (500, 7)]):
        pts = [(rng.randrange(-80, 80), rng.randrange(-80, 80)) for _ in range(n)]
        q, npts, ssq, chi2, vmr = _quad_ref(pts, cell)
        got = _quad_run(spark, pts, cell)
        assert got[:3] == (q, npts, ssq), trial
        assert got[3] == q - 1
        # the engine's algebraic identity vs the direct per-quadrat sum
        assert got[4] == pytest.approx(chi2, rel=1e-12), trial
        assert got[5] == pytest.approx(vmr, rel=1e-12), trial


def test_quadrat_hand_kat_uniform_and_point_mass(spark):
    # a perfectly uniform 1-per-quadrat layout: chi2 = 0, vmr = 0
    pts = [(10 * cx + 5, 10 * cy + 5) for cx in range(3) for cy in range(3)]
    got = _quad_run(spark, pts, 10)
    assert got[:4] == (9, 9, 9, 8)
    assert got[4] == pytest.approx(0.0, abs=0.0)
    assert got[5] == pytest.approx(0.0, abs=0.0)
    # all points in ONE quadrat of a 2x1 box -> maximal clustering:
    # counts [6, 0], nbar = 3: chi2 = (9+9)/3 = 6, vmr = 18/3 = 6
    pts = [(1, 1)] * 5 + [(2, 2)] + [(15, 1)]
    # 7 points: 6 in cell (0,0), 1 in (1,0): chi2 = ((6-3.5)² + (1-3.5)²)/3.5
    got = _quad_run(spark, pts, 10)
    assert got[:3] == (2, 7, 37)
    assert got[4] == pytest.approx((2.5 ** 2 + 2.5 ** 2) / 3.5, rel=1e-12)


def test_quadrat_validation(spark):
    with pytest.raises(ValueError):
        geostats.quadrat_test(None, 0)
