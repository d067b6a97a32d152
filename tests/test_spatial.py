"""T2/M3 — spatial joins vs brute force (SURVEY.md §5.2): PIP row-set
equality, kNN vs argsort oracle, bbox join vs nested-loop oracle.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fixtures import gen
from oracle import minitiler as mt
from tilers_tools_spark.operators import spatial

RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def points_df(spark):
    n = 400
    pdf = pd.DataFrame(
        {
            "point_id": [f"p{i:04d}" for i in range(n)],
            "lon": np.concatenate([RNG.uniform(-179, 179, n - 100), RNG.uniform(138.7, 140.7, 100)]),
            "lat": np.concatenate([RNG.uniform(-65, 65, n - 100), RNG.uniform(34.7, 36.7, 100)]),
        }
    )
    return spark.createDataFrame(pdf).cache(), pdf


@pytest.fixture(scope="module")
def polygons_df(spark, polygons_smoke):
    return spark.read.parquet(polygons_smoke).cache()


def test_pip_vs_bruteforce(spark, points_df, polygons_df):
    df, pdf = points_df
    got = {
        (r["point_id"], r["poly_id"])
        for r in spatial.pip_join(df, polygons_df, res=4).select("point_id", "poly_id").collect()
    }
    polys = polygons_df.collect()
    want = set()
    for _, p in pdf.iterrows():
        for poly in polys:
            ring = [{"lon": v["lon"], "lat": v["lat"]} for v in poly["ring"]]
            if mt.point_in_ring(p["lon"], p["lat"], ring):
                want.add((p["point_id"], poly["poly_id"]))
    missing = want - got
    extra = got - want
    assert not missing, f"coarse prefilter dropped true matches: {sorted(missing)[:5]}"
    assert not extra, f"refine let false matches through: {sorted(extra)[:5]}"
    assert len(want) > 0  # fixture guarantees hot-box coverage


def test_pip_semi_anti(points_df, polygons_df):
    df, _ = points_df
    n = df.count()
    semi = spatial.pip_join(df, polygons_df, res=4, how="left_semi").count()
    anti = spatial.pip_join(df, polygons_df, res=4, how="left_anti").count()
    assert semi + anti == n and semi > 0


def test_pip_multiring_holes(spark):
    """Even-odd over a polygon's rings: a square with a square hole —
    points in the hole are NOT matches; an independent poly is unaffected."""
    lon_g, lat_g = np.meshgrid(np.linspace(-30, 125, 32), np.linspace(-30, 30, 13))
    pdf = pd.DataFrame(
        {"point_id": [f"g{i:04d}" for i in range(lon_g.size)],
         "lon": lon_g.ravel() + 0.123, "lat": lat_g.ravel() + 0.077}
    )
    df = spark.createDataFrame(pdf)
    outer = [{"lon": -20.0, "lat": -20.0}, {"lon": 20.0, "lat": -20.0},
             {"lon": 20.0, "lat": 20.0}, {"lon": -20.0, "lat": 20.0}]
    hole = [{"lon": -8.0, "lat": -8.0}, {"lon": 8.0, "lat": -8.0},
            {"lon": 8.0, "lat": 8.0}, {"lon": -8.0, "lat": 8.0}]
    other = [{"lon": 100.0, "lat": 0.0}, {"lon": 120.0, "lat": 0.0}, {"lon": 110.0, "lat": 15.0}]
    polys = spark.createDataFrame(
        [("donut", outer), ("donut", hole), ("tri", other)],
        "poly_id string, ring array<struct<lon:double,lat:double>>",
    )
    got = {
        (r["point_id"], r["poly_id"])
        for r in spatial.pip_join(df, polys, res=3).select("point_id", "poly_id").collect()
    }
    want = set()
    for _, p in pdf.iterrows():
        in_outer = mt.point_in_ring(p["lon"], p["lat"], outer)
        in_hole = mt.point_in_ring(p["lon"], p["lat"], hole)
        if in_outer != in_hole:  # even-odd
            want.add((p["point_id"], "donut"))
        if mt.point_in_ring(p["lon"], p["lat"], other):
            want.add((p["point_id"], "tri"))
    assert got == want
    # sanity: the fixture actually exercises both regions
    donut_pts = {pid for pid, poly in want if poly == "donut"}
    hole_pts = {p["point_id"] for _, p in pdf.iterrows()
                if mt.point_in_ring(p["lon"], p["lat"], hole)}
    assert donut_pts and hole_pts and not (hole_pts & donut_pts)


def test_knn_vs_bruteforce(spark, points_df):
    df, pdf = points_df
    nq = 16
    qpdf = pd.DataFrame(
        {
            "query_id": [f"q{i:02d}" for i in range(nq)],
            "lon": np.concatenate([RNG.uniform(-170, 170, nq - 4), RNG.uniform(139, 140, 4)]),
            "lat": np.concatenate([RNG.uniform(-60, 60, nq - 4), RNG.uniform(35, 36, 4)]),
        }
    )
    qdf = spark.createDataFrame(qpdf)
    k = 5
    res = spatial.knn_join(qdf, df, k=k, zoom=6).toPandas()
    idx = mt.knn_bruteforce(
        list(zip(qpdf.lon, qpdf.lat)), list(zip(pdf.lon, pdf.lat)), k
    )
    for qi, qid in enumerate(qpdf.query_id):
        got = set(res[res.query_id == qid].point_id)
        want = {pdf.point_id.iloc[j] for j in idx[qi]}
        assert got == want, (qid, sorted(got), sorted(want))
    assert (res.groupby("query_id").size() == k).all()


def test_knn_no_duplicate_ranks_and_max_rounds_fallback(spark, points_df):
    """At coarse zooms the 9 neighbor cells collapse (pmod wrap / edge
    clamp): ranks must still be unique per point, and queries that can't
    certify within max_rounds must fall back to brute force, not vanish."""
    df, pdf = points_df
    qpdf = pd.DataFrame({"query_id": ["qa", "qb"], "lon": [0.0, 139.5], "lat": [84.9, 35.5]})
    qdf = spark.createDataFrame(qpdf)
    k = 5
    # zoom=1, max_rounds=1: zz=1 grid is 2x2 -> every neighbor cell wraps,
    # and a single round almost never certifies -> exercises the fallback
    res = spatial.knn_join(qdf, df, k=k, zoom=1, max_rounds=1).toPandas()
    assert (res.groupby("query_id").size() == k).all(), res
    assert res.groupby(["query_id", "point_id"]).size().max() == 1
    idx = mt.knn_bruteforce(list(zip(qpdf.lon, qpdf.lat)), list(zip(pdf.lon, pdf.lat)), k)
    for qi, qid in enumerate(qpdf.query_id):
        got = set(res[res.query_id == qid].point_id)
        want = {pdf.point_id.iloc[j] for j in idx[qi]}
        assert got == want, (qid, sorted(got), sorted(want))


def test_polygon_cover_scales_with_extent():
    """A continental-scale ring at res 5 needs a grid finer than one cell
    width; the cover must include interior cells far from any vertex."""
    ring = [{"lon": -60.0, "lat": -30.0}, {"lon": 60.0, "lat": -30.0},
            {"lon": 60.0, "lat": 30.0}, {"lon": -60.0, "lat": 30.0}]
    pdf = pd.DataFrame({"poly_id": ["big"], "ring": [ring]})
    cover = spatial.polygon_cover_cells(pdf, res=5)
    cells = set(cover.h3_cell_cover)
    from tilers_tools_spark.functions import h3lite
    # 100 random interior points must all land in covered cells
    lon = RNG.uniform(-59, 59, 100)
    lat = RNG.uniform(-29, 29, 100)
    pt_cells = h3lite.latlng_to_cell(lat, lon, 5)
    missing = [i for i, c in enumerate(pt_cells) if int(c) not in cells]
    assert not missing, (len(missing), lon[missing][:3], lat[missing][:3])


def test_bbox_join_vs_bruteforce(spark):
    n = 120
    def boxes(prefix):
        cx = RNG.uniform(-5e6, 5e6, n)
        cy = RNG.uniform(-5e6, 5e6, n)
        hw = RNG.uniform(1e4, 8e5, n)
        hh = RNG.uniform(1e4, 8e5, n)
        return pd.DataFrame(
            {
                f"{prefix}id": [f"{prefix}{i}" for i in range(n)],
                f"{prefix}mx0": cx - hw,
                f"{prefix}my0": cy - hh,
                f"{prefix}mx1": cx + hw,
                f"{prefix}my1": cy + hh,
            }
        )

    lp, rp = boxes("l"), boxes("r")
    ldf, rdf = spark.createDataFrame(lp), spark.createDataFrame(rp)
    got = {
        (r["lid"], r["rid"])
        for r in spatial.bbox_join(ldf, rdf, zoom=4, keys=("lid", "rid")).select("lid", "rid").collect()
    }
    want = set()
    for _, a in lp.iterrows():
        ov = rp[
            (a.lmx0 <= rp.rmx1) & (a.lmx1 >= rp.rmx0) & (a.lmy0 <= rp.rmy1) & (a.lmy1 >= rp.rmy0)
        ]
        want.update((a.lid, rid) for rid in ov.rid)
    assert got == want and len(want) > 0


def test_cell_join_is_sort_merge(spark, points_df):
    df, _ = points_df
    from tilers_tools_spark.operators.spatial import _h3_cell_udf

    a = df.withColumn("h3_cell", _h3_cell_udf(F.col("lat"), F.col("lon"), F.lit(5)))
    b = a.select(F.col("point_id").alias("pid2"), "h3_cell")
    j = spatial.cell_join(a, b)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # sanity: self-join contains the diagonal
    assert j.filter(F.col("point_id") == F.col("pid2")).count() == df.count()


def test_wkt_polygons_pip_equivalence(spark):
    """WKT-parsed polygons produce identical PIP results to directly-built
    rings (incl. a donut hole), and the published closing-vertex
    convention is normalized away."""
    import pandas as _pd

    from tilers_tools_spark.operators import spatial as sp

    wkt = "POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0), (10 10, 20 10, 20 20, 10 20, 10 10))"
    direct_rows = [
        ("p", [{"lon": float(x), "lat": float(y)} for x, y in [(0, 0), (30, 0), (30, 30), (0, 30)]]),
        ("p", [{"lon": float(x), "lat": float(y)} for x, y in [(10, 10), (20, 10), (20, 20), (10, 20)]]),
    ]
    polys_wkt = sp.wkt_polygons_df(spark, [("p", wkt)])
    polys_direct = spark.createDataFrame(
        direct_rows, "poly_id string, ring array<struct<lon:double,lat:double>>"
    )
    pts = spark.createDataFrame(
        _pd.DataFrame(
            {
                "event_id": [0, 1, 2, 3],
                "lon": [5.0, 15.0, 25.0, 40.0],   # in, in-hole, in, out
                "lat": [5.0, 15.0, 25.0, 40.0],
            }
        )
    )
    a = sp.pip_join(pts, polys_wkt).select("event_id").toPandas()
    b = sp.pip_join(pts, polys_direct).select("event_id").toPandas()
    assert sorted(a.event_id) == sorted(b.event_id) == [0, 2]


def test_geojson_polygons_pip_equivalence(spark):
    """The GeoJSON vector driver (RFC 7946) produces identical rings and
    PIP results to the WKT driver for the same donut polygon; Feature ids
    resolve from id/properties; non-polygon features are skipped; error
    cases raise."""
    import json as _json

    import pandas as _pd
    import pytest as _pt

    from tilers_tools_spark.functions import georef_parsers as gp
    from tilers_tools_spark.operators import spatial as sp

    shell = [[0, 0], [30, 0], [30, 30], [0, 30], [0, 0]]
    hole = [[10, 10], [20, 10], [20, 20], [10, 20], [10, 10]]
    doc = _json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "id": "p",
                    "properties": {},
                    "geometry": {"type": "Polygon", "coordinates": [shell, hole]},
                },
                {  # skipped: not a polygon
                    "type": "Feature",
                    "properties": {"name": "pt"},
                    "geometry": {"type": "Point", "coordinates": [1, 2]},
                },
            ],
        }
    )
    wkt = "POLYGON ((0 0, 30 0, 30 30, 0 30, 0 0), (10 10, 20 10, 20 20, 10 20, 10 10))"
    gj = sp.geojson_polygons_df(spark, doc)
    wk = sp.wkt_polygons_df(spark, [("p", wkt)])
    assert sorted(gj.collect()) == sorted(wk.collect())
    pts = spark.createDataFrame(
        _pd.DataFrame({"event_id": [0, 1, 2, 3], "lon": [5.0, 15.0, 25.0, 40.0], "lat": [5.0, 15.0, 25.0, 40.0]})
    )
    a = sp.pip_join(pts, gj).select("event_id").toPandas()
    assert sorted(a.event_id) == [0, 2]

    # MultiPolygon flattens; bare geometry gets id "0"; properties.name id
    multi = gp.parse_geojson_features(
        _json.dumps({"type": "MultiPolygon", "coordinates": [[shell], [
            [[100, 0], [110, 0], [110, 10], [100, 10], [100, 0]]]]})
    )
    assert multi[0][0] == "0" and len(multi[0][1]) == 2
    named = gp.parse_geojson_features(
        _json.dumps({"type": "Feature", "properties": {"name": "zone9"},
                     "geometry": {"type": "Polygon", "coordinates": [shell]}})
    )
    assert named[0][0] == "zone9"
    with _pt.raises(ValueError, match="Polygon"):
        gp.parse_geojson_polygon({"type": "LineString", "coordinates": []})
    with _pt.raises(ValueError, match="fewer than 3"):
        gp.parse_geojson_polygon({"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [0, 0]]]})


def test_geojson_duplicate_feature_ids_stay_distinct(spark):
    """Two features sharing properties.name must NOT collapse into one
    poly_id (even-odd would read one polygon as the other's hole) — the
    reader suffixes duplicates with the feature index."""
    import json as _json

    from tilers_tools_spark.functions import georef_parsers as gp

    sq = lambda x0: [[x0, 0], [x0 + 10, 0], [x0 + 10, 10], [x0, 10], [x0, 0]]  # noqa: E731
    doc = _json.dumps(
        {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "properties": {"name": "zone"},
                 "geometry": {"type": "Polygon", "coordinates": [sq(0)]}},
                {"type": "Feature", "properties": {"name": "zone"},
                 "geometry": {"type": "Polygon", "coordinates": [sq(5)]}},
            ],
        }
    )
    feats = gp.parse_geojson_features(doc)
    assert [f[0] for f in feats] == ["zone", "zone#1"]


# ---------------------------------------------------------------- convex hull


def _hull_edges_bruteforce(pts):
    """Independent check: the O(n^3) extreme-edge characterization (the
    same definition the DuckDB gate uses, here in plain Python)."""
    pts = sorted(set(pts))
    out = []
    for a in pts:
        for b in pts:
            if a == b:
                continue
            ok = True
            for c in pts:
                if c in (a, b):
                    continue
                cr = (b[0]-a[0])*(c[1]-a[1]) - (b[1]-a[1])*(c[0]-a[0])
                dt = (b[0]-a[0])*(c[0]-a[0]) + (b[1]-a[1])*(c[1]-a[1])
                ln = (b[0]-a[0])**2 + (b[1]-a[1])**2
                if not (cr > 0 or (cr == 0 and 0 < dt < ln)):
                    ok = False
                    break
            if ok:
                out.append((a, b))
    return sorted(out)


def test_convex_hull_random_groups(spark):
    """40 random integer point clouds (with planted duplicates and
    collinear runs) vs the brute-force extreme-edge definition."""
    from tilers_tools_spark.operators.spatial import convex_hull

    rng = np.random.default_rng(17)
    rows, want = [], {}
    for gid in range(40):
        n = int(rng.integers(1, 25))
        pts = [(int(x), int(y)) for x, y in rng.integers(0, 12, size=(n, 2))]
        if gid % 3 == 0:  # plant a collinear run + duplicates
            pts += [(0, 0), (3, 3), (6, 6), (3, 3)]
        rows += [(gid, x, y) for x, y in pts]
        want[gid] = _hull_edges_bruteforce(pts)
    df = spark.createDataFrame(rows, "group_id long, x long, y long")
    got = {}
    for r in convex_hull(df, by=["group_id"]).collect():
        got.setdefault(r["group_id"], []).append(
            ((r["x1"], r["y1"]), (r["x2"], r["y2"])))
    for gid, edges in want.items():
        assert sorted(got.get(gid, [])) == edges, gid


def test_convex_hull_degenerate(spark):
    from tilers_tools_spark.operators.spatial import convex_hull

    df = spark.createDataFrame(
        [(1, 5, 5), (1, 5, 5),              # single distinct point: no edges
         (2, 0, 0), (2, 4, 2),              # segment: two directed edges
         (3, 0, 0), (3, 2, 2), (3, 4, 4)],  # collinear: extremes only
        "group_id long, x long, y long")
    got = {}
    for r in convex_hull(df, by=["group_id"]).collect():
        got.setdefault(r["group_id"], set()).add(
            ((r["x1"], r["y1"]), (r["x2"], r["y2"])))
    assert 1 not in got
    assert got[2] == {((0, 0), (4, 2)), ((4, 2), (0, 0))}
    assert got[3] == {((0, 0), (4, 4)), ((4, 4), (0, 0))}


def test_convex_hull_float_coords(spark):
    """Float payload coordinates work (schema follows the input types)."""
    from tilers_tools_spark.operators.spatial import convex_hull

    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 1.5, 0.25), (1, 0.75, 2.0), (1, 0.8, 0.7)],
        "group_id long, x double, y double")
    edges = {((r["x1"], r["y1"]), (r["x2"], r["y2"]))
             for r in convex_hull(df, by=["group_id"]).collect()}
    assert len(edges) == 3  # interior point (0.8, 0.7) excluded
    assert all(isinstance(a[0], float) for a, _ in edges)


# ---------------------------------------------------------------- corridor


def test_corridor_join_brute_force(spark):
    """400 points x 30 segments vs an exhaustive numpy scan; boundary
    inclusive; a zero-length segment degrades to point distance."""
    from tilers_tools_spark.operators.spatial import corridor_join

    rng = np.random.default_rng(23)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in
           enumerate(rng.uniform(0, 1000, size=(400, 2)))]
    segs = [(int(j), float(a), float(b), float(c), float(d)) for j, (a, b, c, d)
            in enumerate(rng.uniform(0, 1000, size=(29, 4)))]
    segs.append((29, 500.0, 500.0, 500.0, 500.0))  # zero-length
    pdf = spark.createDataFrame(pts, "pt_id long, mx double, my double")
    sdf = spark.createDataFrame(segs, "seg_id long, ax double, ay double, bx double, by double")
    D = 60.0
    got = {(r["pt_id"], r["seg_id"]) for r in
           corridor_join(pdf, sdf, d=D, cell_m=150.0).collect()}

    def seg_dist2(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        t = 0.0 if l2 == 0 else max(0.0, min(1.0, ((px - ax) * dx + (py - ay) * dy) / l2))
        cx, cy = ax + t * dx, ay + t * dy
        return (px - cx) ** 2 + (py - cy) ** 2

    want = {(i, j) for (i, px, py) in pts for (j, ax, ay, bx, by) in segs
            if seg_dist2(px, py, ax, ay, bx, by) <= D * D}
    assert got == want
    assert any(j == 29 for _, j in want)  # zero-length segment exercised


def test_corridor_join_no_dup_pairs(spark):
    """A long segment crossing many cells pairs with a point exactly once."""
    from tilers_tools_spark.operators.spatial import corridor_join

    pdf = spark.createDataFrame([(1, 500.0, 10.0)], "pt_id long, mx double, my double")
    sdf = spark.createDataFrame([(7, 0.0, 0.0, 1000.0, 0.0)],
                                "seg_id long, ax double, ay double, bx double, by double")
    rows = corridor_join(pdf, sdf, d=20.0, cell_m=25.0).collect()
    assert [(r["pt_id"], r["seg_id"]) for r in rows] == [(1, 7)]
    assert abs(rows[0]["dist2"] - 100.0) < 1e-9


def test_corridor_join_cell_guard(spark):
    from tilers_tools_spark.operators.spatial import corridor_join

    pdf = spark.createDataFrame([(1, 0.0, 0.0)], "pt_id long, mx double, my double")
    with pytest.raises(ValueError):
        corridor_join(pdf, pdf, d=100.0, cell_m=50.0)


# ---------------------------------------------------------------- diameter


def test_hull_diameter_brute_force(spark):
    """60 random integer clouds (sizes 1..28, planted collinear +
    duplicate points, equal-diameter ties) vs the O(n^2) max-over-pairs
    definition with the same lexicographic tie-break."""
    from itertools import combinations

    from tilers_tools_spark.operators.spatial import hull_diameter

    rng = np.random.default_rng(31)
    rows, want = [], {}
    for gid in range(60):
        n = int(rng.integers(1, 28))
        pts = [(int(x), int(y)) for x, y in rng.integers(0, 10, size=(n, 2))]
        if gid % 4 == 0:
            pts += [(0, 0), (9, 9), (0, 9), (9, 0)]  # plant 2 tied diameters
        rows += [(gid, x, y) for x, y in pts]
        u = sorted(set(pts))
        if len(u) == 1:
            want[gid] = (len(pts), 0, u[0], u[0])
        else:
            m = max((a[0]-b[0])**2 + (a[1]-b[1])**2 for a, b in combinations(u, 2))
            pair = min(tuple(sorted((a, b))) for a, b in combinations(u, 2)
                       if (a[0]-b[0])**2 + (a[1]-b[1])**2 == m)
            want[gid] = (len(pts), m, pair[0], pair[1])
    df = spark.createDataFrame(rows, "group_id long, x long, y long")
    got = {r["group_id"]: (r["n_pts"], r["diam2"],
                           (r["x1"], r["y1"]), (r["x2"], r["y2"]))
           for r in hull_diameter(df, by=["group_id"]).collect()}
    assert got == want
