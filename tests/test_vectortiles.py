"""polygon_vector_tiles: interior-quantization identity, hand-pinned
boundary clipping, hole winding, and the work-list plan shape."""

import math

import pytest

from tilers_tools_spark.functions import mvtcodec as mvt
from tilers_tools_spark.functions import tilemath as tm
from tilers_tools_spark.operators import vectortiles as vt


def _q(lon, lat, z, x, y, extent=4096):
    """Independent scalar quantization (spec mercator formulas)."""
    span = tm.RES0 / (2.0**z) * 256.0
    mx = lon * tm.ORIGIN / 180.0
    my = math.log(math.tan((90.0 + lat) * math.pi / 360.0)) * 6378137.0
    qx = math.floor((mx - (x * span - tm.ORIGIN)) / span * extent + 0.5)
    qy = math.floor((((y + 1) * span - tm.ORIGIN) - my) / span * extent + 0.5)
    return qx, qy


def test_interior_polygon_quantization_identity(spark):
    """A polygon wholly inside one tile decodes to exactly the direct
    per-vertex quantization (no clipping artifacts)."""
    wkt = "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))"
    out = vt.polygon_vector_tiles(spark, [("sq", wkt)], z=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["x"], r["y"]) == (8, 8) and r["n_features"] == 1
    dec = mvt.decode_mvt(bytes(r["tile"]))["polys"]
    (path,) = dec["features"][0]["paths"]
    want = [_q(lon, lat, 4, 8, 8) for lon, lat in
            [(10, 10), (12, 10), (12, 12), (10, 12)]]
    assert set(path) == set(want) and len(path) == 4
    assert mvt.signed_area2(path) > 0


def test_boundary_clip_pinned(spark):
    """A square crossing the z=4 tile boundary at lon 22.5 deg splits
    into two tiles; the cut edges land exactly on the buffered extent
    (+/- 8 px -> qx 4104 and -8), the far edges at the direct
    quantization of the source vertices."""
    wkt = "POLYGON ((21 10, 24 10, 24 12, 21 12, 21 10))"
    rows = {(r["x"], r["y"]): r for r in
            vt.polygon_vector_tiles(spark, [("p", wkt)], z=4, buffer_px=8).collect()}
    assert set(rows) == {(8, 8), (9, 8)}
    left = mvt.decode_mvt(bytes(rows[(8, 8)]["tile"]))["polys"]["features"][0]["paths"][0]
    right = mvt.decode_mvt(bytes(rows[(9, 8)]["tile"]))["polys"]["features"][0]["paths"][0]
    assert max(x for x, _ in left) == 4104   # clipped at tile-right + 8px
    assert min(x for x, _ in left) == _q(21, 10, 4, 8, 8)[0]
    assert min(x for x, _ in right) == -8    # clipped at tile-left - 8px
    assert max(x for x, _ in right) == _q(24, 10, 4, 9, 8)[0]
    for path in (left, right):
        assert mvt.signed_area2(path) > 0
        ys = [y for _, y in path]
        assert min(ys) == _q(21, 12, 4, 8, 8)[1] and max(ys) == _q(21, 10, 4, 8, 8)[1]


def test_hole_winding_and_far_tile_elision(spark):
    """Donut keeps its hole (negative ring area); tiles whose square the
    polygon misses entirely are not emitted."""
    wkt = ("POLYGON ((30 30, 40 30, 40 40, 30 40, 30 30), "
           "(33 33, 36 33, 36 36, 33 36, 33 33))")
    out = vt.polygon_vector_tiles(spark, [("d", wkt)], z=4).collect()
    assert len(out) == 1 and out[0]["n_features"] == 1
    paths = mvt.decode_mvt(bytes(out[0]["tile"]))["polys"]["features"][0]["paths"]
    assert len(paths) == 2
    assert mvt.signed_area2(paths[0]) > 0 and mvt.signed_area2(paths[1]) < 0


def test_cover_cap_raises(spark):
    with pytest.raises(ValueError):
        vt.polygon_vector_tiles(
            spark, [("w", "POLYGON ((-170 -80, 170 -80, 170 80, -170 80, -170 -80))")],
            z=12, max_tiles=1000,
        )


def test_clip_ring_brute_force():
    """Sutherland-Hodgman vs point-membership brute force: every vertex
    of the clipped ring is inside the (slightly padded) box, and every
    subject vertex inside the box survives."""
    subject = [(0, 0), (10, 2), (12, 8), (6, 12), (-2, 6)]  # non-convex-ish
    box = (2.0, 9.0, 1.0, 7.0)
    out = vt._clip_ring(subject, *box)
    assert len(out) >= 3
    eps = 1e-9
    for x, y in out:
        assert box[0] - eps <= x <= box[1] + eps
        assert box[2] - eps <= y <= box[3] + eps
    for p in subject:
        if box[0] < p[0] < box[1] and box[2] < p[1] < box[3]:
            assert any(abs(p[0] - x) < eps and abs(p[1] - y) < eps for x, y in out)


def test_point_vector_tiles_roundtrip_and_plan(spark):
    """Distributed point MVTs: decoded features recover every point at
    its independently computed quantized position (id-sorted); the plan
    has exactly one Exchange and only the four narrow longs cross it."""
    rows = [(i, -180.0 + (i * 77) % 360 + 0.25, -80.0 + (i * 31) % 160 + 0.25)
            for i in range(50)]
    pts = spark.createDataFrame(rows, "event_id long, lon double, lat double")
    df = vt.point_vector_tiles(pts, z=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    exch = [ln for ln in plan.splitlines() if "Exchange" in ln][0]
    assert "lon" not in exch and "lat" not in exch
    got = {}
    for r in df.collect():
        dec = mvt.decode_mvt(bytes(r["tile"]))["points"]
        ids = [f["id"] for f in dec["features"]]
        assert ids == sorted(ids)
        for f in dec["features"]:
            got[f["id"]] = (r["x"], r["y"], f["paths"][0][0])
    assert len(got) == 50
    span = tm.RES0 / 8.0 * 256.0
    for i, lon, lat in rows:
        x, y, (qx, qy) = got[i]
        mx = lon * tm.ORIGIN / 180.0
        assert x == max(0, min(7, math.floor((mx + tm.ORIGIN) / span)))
        assert (qx, qy) == _q(lon, lat, 3, x, y)


def test_line_vector_tiles_interior_and_split(spark):
    """A line inside one tile quantizes to the direct per-vertex coords;
    a line crossing the z=4 boundary at lon 22.5 splits into two tiles
    whose cut endpoints land on the buffered edge (4104 / -8)."""
    inner = [("a", "LINESTRING (10 10, 11 11, 12 10)")]
    out = vt.line_vector_tiles(spark, inner, z=4).collect()
    assert len(out) == 1 and out[0]["n_features"] == 1
    dec = mvt.decode_mvt(bytes(out[0]["tile"]))["lines"]["features"][0]
    assert dec["type"] == mvt.GEOM_LINE and dec["props"] == {"line_id": "a"}
    want = [_q(lon, lat, 4, 8, 8) for lon, lat in [(10, 10), (11, 11), (12, 10)]]
    assert dec["paths"] == [want]

    crossing = [("c", "LINESTRING (21 10, 24 10)")]
    rows = {(r["x"], r["y"]): r for r in
            vt.line_vector_tiles(spark, crossing, z=4, buffer_px=8).collect()}
    assert set(rows) == {(8, 8), (9, 8)}
    left = mvt.decode_mvt(bytes(rows[(8, 8)]["tile"]))["lines"]["features"][0]["paths"][0]
    right = mvt.decode_mvt(bytes(rows[(9, 8)]["tile"]))["lines"]["features"][0]["paths"][0]
    assert left[0] == _q(21, 10, 4, 8, 8) and left[-1][0] == 4104
    assert right[0][0] == -8 and right[-1] == _q(24, 10, 4, 9, 8)


def test_clip_polyline_split_paths():
    """A polyline that exits and re-enters the box produces two
    disconnected sub-paths (one multi-linestring feature)."""
    pts = [(0.0, 5.0), (4.0, 5.0), (4.0, 20.0), (8.0, 20.0), (8.0, 5.0), (10.0, 5.0)]
    paths = vt._clip_polyline(pts, -1.0, 11.0, 0.0, 10.0)
    assert len(paths) == 2
    assert paths[0][0] == (0.0, 5.0) and paths[0][-1] == (4.0, 10.0)
    assert paths[1][0] == (8.0, 10.0) and paths[1][-1] == (10.0, 5.0)


def test_merge_vector_tiles_layer_concat(spark):
    """Full-outer key merge; on collisions the concatenated blob decodes
    to BOTH layers (protobuf repeated-field semantics) — geometry never
    decoded in the plan."""
    pts = spark.createDataFrame(
        [(i, 10.0 + i * 0.1, 10.0 + (i % 3) * 0.1) for i in range(10)],
        "event_id long, lon double, lat double",
    )
    a = vt.point_vector_tiles(pts, z=4, layer_name="pa")
    b = vt.polygon_vector_tiles(
        spark, [("sq", "POLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))")],
        z=4, layer_name="pb",
    )
    merged = vt.merge_vector_tiles(a, b).collect()
    by_key = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in merged}
    assert (4, 8, 8) in by_key
    dec = mvt.decode_mvt(by_key[(4, 8, 8)])
    assert set(dec) == {"pa", "pb"}
    assert dec["pa"]["features"] and dec["pb"]["features"]
