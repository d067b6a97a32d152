"""Terrain derivatives (operators/terrain.py) — hand-derived pins on
analytic surfaces, plus the Spark DEM operator end-to-end over real
Float32 GeoTIFF blobs.

Hand derivations (kept for auditability; the formula is the module
docstring's first-principles Horn form):
  flat plane, alt=45:  shade = round(255 * sin(45°)) = round(180.312) = 180
  uniform ramp |grad| = 2, light aligned with the downhill direction,
  alt=45: n·l = 3·(√2/2) / √5 = 0.9486832980...; round(255·x) = 242
  light opposed (az + 180): n·l = -(√2/2)/√5 < 0 -> clipped to 0
  slope = atan(2) = 63.4349488...°
"""

from __future__ import annotations

import numpy as np
import pytest

from tilers_tools_spark.operators import terrain


def test_flat_plane_uniform_shade():
    dem = np.full((9, 11), 42.0)
    sh = terrain.hillshade_np(dem, gsd=3.0, azimuth=315.0, altitude=45.0)
    assert sh.dtype == np.uint8 and sh.shape == (9, 11)
    assert (sh == 180).all()  # round(255 * sin(45 deg))
    assert (terrain.slope_np(dem, 3.0) == 0.0).all()
    assert np.isnan(terrain.aspect_np(dem, 3.0)).all()


def test_east_ramp_lit_from_east():
    """z = -2x (east-facing, |grad| = 2): interior cells pin to the
    hand-derived 242 under eastern light, 0 under western; aspect 90."""
    c = np.arange(12)[None, :] + np.zeros((8, 1))
    dem = -2.0 * c  # gsd = 1
    east = terrain.hillshade_np(dem, 1.0, azimuth=90.0, altitude=45.0)
    west = terrain.hillshade_np(dem, 1.0, azimuth=270.0, altitude=45.0)
    # edge replication flattens the border gradient — pin the interior
    assert (east[1:-1, 1:-1] == 242).all()
    assert (west[1:-1, 1:-1] == 0).all()
    a = terrain.aspect_np(dem, 1.0)
    assert np.allclose(a[1:-1, 1:-1], 90.0)
    s = terrain.slope_np(dem, 1.0)
    assert np.allclose(s[1:-1, 1:-1], np.degrees(np.arctan(2.0)))


def test_north_ramp_lit_from_north():
    """z = +2·row (row grows southward -> surface faces north)."""
    r = np.arange(10)[:, None] + np.zeros((1, 7))
    dem = 2.0 * r
    north = terrain.hillshade_np(dem, 1.0, azimuth=0.0, altitude=45.0)
    south = terrain.hillshade_np(dem, 1.0, azimuth=180.0, altitude=45.0)
    assert (north[1:-1, 1:-1] == 242).all()
    assert (south[1:-1, 1:-1] == 0).all()
    a = terrain.aspect_np(dem, 1.0)
    assert np.allclose(a[1:-1, 1:-1], 0.0)


def test_gsd_and_z_factor_scale_gradients():
    """Doubling gsd halves the gradient; z_factor multiplies it back."""
    c = np.arange(12)[None, :] + np.zeros((8, 1))
    dem = -2.0 * c
    half = terrain.slope_np(dem, gsd=2.0)
    assert np.allclose(half[1:-1, 1:-1], np.degrees(np.arctan(1.0)))
    rescaled = terrain.hillshade_np(dem, gsd=2.0, azimuth=90.0, altitude=45.0, z_factor=2.0)
    assert (rescaled[1:-1, 1:-1] == 242).all()


def test_dem_hillshade_operator_end_to_end(spark):
    """The Spark operator decodes Float32 tiled GeoTIFF DEMs and matches
    the local kernel exactly (md5 of the shaded bytes); broken rows
    surface as the auditable NaN row."""
    import hashlib

    from tilers_tools_spark.functions import tiffcodec

    r = np.arange(20)[:, None] + np.zeros((1, 30))
    c = np.arange(30)[None, :] + np.zeros((20, 1))
    dems = {
        "plane": (3.0 * r - 2.0 * c).astype(np.float32),
        "wave": (50.0 * np.sin(r / 3.0) + 30.0 * np.cos(c / 5.0)).astype(np.float32),
    }
    rows = [
        (name, tiffcodec.encode_tiff(d, geo={"gsd": 2.0, "mx0": 0.0, "my1": 40.0},
                                     compression="deflate", tile=16))
        for name, d in dems.items()
    ] + [("broken", b"not a tiff")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r2["image_id"]: r2 for r2 in terrain.dem_hillshade(df).collect()}
    for name, d in dems.items():
        sh = terrain.hillshade_np(d.astype(np.float64), 2.0)
        assert out[name]["shade_md5"] == hashlib.md5(sh.tobytes()).hexdigest()
        assert out[name]["shade_sum"] == int(sh.sum(dtype=np.int64))
        assert (out[name]["w"], out[name]["h"]) == (30, 20)
    assert out["broken"]["w"] == -1 and out["broken"]["shade_md5"] == ""


def test_hillshade_feeds_tile_pipeline(spark):
    """Terrain output plugs straight into the ordinary tile pipeline: a
    Float32 DEM is shaded, wrapped as a gray raster with the DEM's own
    georef, and rendered through render_warped — tiles come out non-empty
    and deterministic (same DEM twice -> identical tile md5s)."""
    from pyspark.sql import functions as F

    from tilers_tools_spark.functions import codecs
    from tilers_tools_spark.operators.render import render_warped

    r = np.arange(256)[:, None] + np.zeros((1, 384))
    c = np.arange(384)[None, :] + np.zeros((256, 1))
    dem = (40.0 * np.sin(r / 9.0) + 25.0 * np.cos(c / 13.0)).astype(np.float32)
    gsd, mx0, my1 = 76.4, -3.0e6, 4.0e6
    shade = terrain.hillshade_np(dem, gsd)
    blob = codecs.encode_png(np.repeat(shade[:, :, None], 3, axis=2))
    ddl = ("image_id string, bytes binary, fmt string, a00 double, a01 double, "
           "a02 double, a10 double, a11 double, a12 double")
    frames = []
    for _ in range(2):
        df = spark.createDataFrame(
            [("dem0", blob, "png", gsd, 0.0, mx0, 0.0, -gsd, my1)], ddl
        )
        t = (
            render_warped(df, zoom=7)
            .select("z", "x", "y", F.md5("tile").alias("m"))
            .toPandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        frames.append(t)
    assert len(frames[0]) > 0
    assert frames[0].equals(frames[1])


def test_tri_tpi_roughness_hand_pins():
    """Hand derivations (edge replication):
    flat: all three metrics identically 0.
    east ramp z = c, interior cell: neighbor diffs {-1,-1,-1,0,0,1,1,1}
      -> TRI riley = sqrt(6), wilson = 6/8, TPI = 0, roughness = 2;
    left-edge cell (replicated left column): diffs {0,0,1,0,1,0,0,1}
      -> riley = sqrt(3), wilson = 3/8, TPI = -3/8, roughness = 1.
    isolated peak (3x3 zeros, center 5): center diffs all -5
      -> riley = sqrt(200), wilson = 5, TPI = +5, roughness = 5."""
    flat = np.full((6, 7), 9.5)
    assert (terrain.tri_np(flat, "riley") == 0).all()
    assert (terrain.tri_np(flat, "wilson") == 0).all()
    assert (terrain.tpi_np(flat) == 0).all()
    assert (terrain.roughness_np(flat) == 0).all()

    c = np.arange(9)[None, :] + np.zeros((5, 1))
    ramp = 1.0 * c
    riley, wilson = terrain.tri_np(ramp, "riley"), terrain.tri_np(ramp, "wilson")
    tpi, rough = terrain.tpi_np(ramp), terrain.roughness_np(ramp)
    assert np.allclose(riley[1:-1, 1:-1], np.sqrt(6.0))
    assert np.allclose(wilson[1:-1, 1:-1], 0.75)
    assert np.allclose(tpi[1:-1, 1:-1], 0.0)
    assert np.allclose(rough[1:-1, 1:-1], 2.0)
    assert np.allclose(riley[2, 0], np.sqrt(3.0))
    assert np.allclose(wilson[2, 0], 3.0 / 8.0)
    assert np.allclose(tpi[2, 0], -3.0 / 8.0)
    assert np.allclose(rough[2, 0], 1.0)

    peak = np.zeros((3, 3))
    peak[1, 1] = 5.0
    assert np.allclose(terrain.tri_np(peak, "riley")[1, 1], np.sqrt(200.0))
    assert np.allclose(terrain.tri_np(peak, "wilson")[1, 1], 5.0)
    assert np.allclose(terrain.tpi_np(peak)[1, 1], 5.0)
    assert np.allclose(terrain.roughness_np(peak)[1, 1], 5.0)
    with pytest.raises(ValueError, match="riley"):
        terrain.tri_np(peak, "nope")


def test_dem_terrain_metrics_operator(spark):
    """Spark TRI/TPI/roughness operator matches the local kernels exactly
    (rounded sums + md5 over the four metric rasters); unreadable rows
    surface as the auditable NaN row."""
    import hashlib

    from tilers_tools_spark.functions import tiffcodec

    r = np.arange(18)[:, None] + np.zeros((1, 25))
    c = np.arange(25)[None, :] + np.zeros((18, 1))
    dems = {
        "plane": (3.0 * r - 2.0 * c).astype(np.float32),
        "wave": (50.0 * np.sin(r / 3.0) + 30.0 * np.cos(c / 5.0)).astype(np.float32),
    }
    rows = [
        (name, tiffcodec.encode_tiff(d)) for name, d in dems.items()
    ] + [("broken", b"\x00\x01junk")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r2["image_id"]: r2 for r2 in terrain.dem_terrain_metrics(df).collect()}
    for name, d in dems.items():
        d64 = d.astype(np.float64)
        riley, wilson = terrain.tri_np(d64, "riley"), terrain.tri_np(d64, "wilson")
        tpi, rough = terrain.tpi_np(d64), terrain.roughness_np(d64)
        assert out[name]["tri_riley_sum"] == round(float(riley.sum()), 6)
        assert out[name]["tri_wilson_sum"] == round(float(wilson.sum()), 6)
        assert out[name]["tpi_abs_sum"] == round(float(np.abs(tpi).sum()), 6)
        assert out[name]["rough_sum"] == round(float(rough.sum()), 6)
        want = hashlib.md5(
            riley.tobytes() + wilson.tobytes() + tpi.tobytes() + rough.tobytes()
        ).hexdigest()
        assert out[name]["metrics_md5"] == want
        assert (out[name]["w"], out[name]["h"]) == (25, 18)
    assert out["broken"]["w"] == -1 and out["broken"]["metrics_md5"] == ""


def test_contour_hand_pins():
    """Marching-squares hand derivations:
    flat: no segments.
    east ramp z = c, level 2.5: a vertical line x = 2.5 — one unit
      segment per cell row, H-1 segments, total length H-1.
    isolated peak (3x3 zeros, center 5), level 2.5: a diamond of 4
      segments, each sqrt(2)/2, total 2*sqrt(2); vertices at edge
      midpoints (1, 0.5), (0.5, 1), (1.5, 1), (1, 1.5).
    saddle [[1,0],[0,1]]: level 0.5 -> center avg 0.5 NOT > level ->
      corners disconnect: (0.5,0)-(0,0.5) and (0.5,1)-(1,0.5);
      level 0.4 -> center inside -> the other pairing, still 2 segs."""
    flat = np.full((6, 7), 123.0)
    assert terrain.contour_segments_np(flat, 50.0).shape == (0, 4)
    n, tot, _ = terrain.contour_stats_np(flat, 50.0)
    assert (n, tot) == (0, 0.0)

    c = np.arange(9)[None, :] + np.zeros((5, 1))
    segs = terrain.contour_segments_np(1.0 * c, 2.5)
    assert len(segs) == 4
    assert np.allclose(segs[:, [0, 2]], 2.5)
    n, tot, _ = terrain.contour_stats_np(1.0 * c, 2.5)
    assert (n, tot) == (4, 4.0)
    # gsd scales lengths into georef units
    assert terrain.contour_stats_np(1.0 * c, 2.5, gsd=2.0)[1] == 8.0

    peak = np.zeros((3, 3))
    peak[1, 1] = 5.0
    segs = terrain.contour_segments_np(peak, 2.5)
    n, tot, _ = terrain.contour_stats_np(peak, 2.5)
    assert n == 4 and np.isclose(tot, 2.0 * np.sqrt(2.0))
    pts = {tuple(p) for s in segs for p in (s[:2], s[2:])}
    assert pts == {(1.0, 0.5), (0.5, 1.0), (1.5, 1.0), (1.0, 1.5)}

    saddle = np.array([[1.0, 0.0], [0.0, 1.0]])
    segs = sorted(map(tuple, terrain.contour_segments_np(saddle, 0.5)))
    assert len(segs) == 2
    got = {frozenset([(s[0], s[1]), (s[2], s[3])]) for s in segs}
    assert got == {
        frozenset([(0.5, 0.0), (0.0, 0.5)]),
        frozenset([(0.5, 1.0), (1.0, 0.5)]),
    }
    segs = terrain.contour_segments_np(saddle, 0.4)
    got = {frozenset([(s[0], s[1]), (s[2], s[3])]) for s in map(tuple, segs)}
    assert got == {
        frozenset([(0.6, 0.0), (1.0, 0.4)]),
        frozenset([(0.0, 0.6), (0.4, 1.0)]),
    }


def test_contour_topology_on_wave():
    """Contour lines are closed or border-terminated: every vertex NOT on
    the raster border must be shared by exactly two segments."""
    r = np.arange(32)[:, None] + np.zeros((1, 28))
    c = np.arange(28)[None, :] + np.zeros((32, 1))
    dem = 50.0 * np.sin(r / 3.0) + 30.0 * np.cos(c / 5.0)
    for level in (-20.5, 0.25, 33.75):
        segs = terrain.contour_segments_np(dem, level)
        assert len(segs) > 0
        from collections import Counter

        deg = Counter()
        for s in segs:
            deg[(round(s[0], 9), round(s[1], 9))] += 1
            deg[(round(s[2], 9), round(s[3], 9))] += 1
        h, w = dem.shape
        for (x, y), d in deg.items():
            on_border = x in (0.0, w - 1.0) or y in (0.0, h - 1.0)
            if not on_border:
                assert d == 2, f"dangling interior vertex {(x, y)} deg={d} at {level}"


def test_dem_contour_operator(spark):
    """Spark contour operator matches the local kernel exactly per
    (raster, level), applies the GeoTIFF gsd to lengths, and surfaces
    unreadable rows once per level."""
    from tilers_tools_spark.functions import tiffcodec

    r = np.arange(20)[:, None] + np.zeros((1, 30))
    c = np.arange(30)[None, :] + np.zeros((20, 1))
    dems = {
        "plane": (3.0 * r - 2.0 * c).astype(np.float32),
        "wave": (50.0 * np.sin(r / 3.0) + 30.0 * np.cos(c / 5.0)).astype(np.float32),
    }
    levels = [-10.25, 5.5, 20.75]
    rows = [
        (name, tiffcodec.encode_tiff(d, geo={"gsd": 2.0, "mx0": 0.0, "my1": 40.0},
                                     compression="deflate"))
        for name, d in dems.items()
    ] + [("broken", b"nope")]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = terrain.dem_contour(df, levels).collect()
    assert len(out) == 9
    got = {(r2["image_id"], r2["level"]): r2 for r2 in out}
    for name, d in dems.items():
        for lv in levels:
            n, tot, md5 = terrain.contour_stats_np(d.astype(np.float64), lv, gsd=2.0)
            g = got[(name, lv)]
            assert (g["n_segments"], g["total_len"], g["seg_md5"]) == (n, tot, md5)
    assert got[("broken", 5.5)]["n_segments"] == -1


def test_dem_derivatives_operator(spark):
    """Combined slope/aspect/color-relief operator matches the local
    kernels; a georef-LESS TIFF (slope needs gsd) and an unreadable blob
    both surface as the auditable NaN row."""
    import hashlib

    from tilers_tools_spark.functions import tiffcodec

    r = np.arange(12)[:, None] + np.zeros((1, 16))
    dem = (4.0 * r - 10.0).astype(np.float32)
    ramp = [(-10.0, 0, 0, 255), (40.0, 255, 0, 0)]
    rows = [
        ("ok", tiffcodec.encode_tiff(dem, geo={"gsd": 2.0, "mx0": 0.0, "my1": 24.0})),
        ("nogeo", tiffcodec.encode_tiff(dem)),
        ("broken", b"x"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {x["image_id"]: x for x in terrain.dem_derivatives(df, ramp).collect()}
    sl = terrain.slope_np(dem.astype(np.float64), 2.0)
    asp = terrain.aspect_np(dem.astype(np.float64), 2.0)
    rel = terrain.color_relief_np(dem.astype(np.float64), ramp)
    assert out["ok"]["slope_sum"] == round(float(sl.sum()), 6)
    assert out["ok"]["slope_md5"] == hashlib.md5(sl.tobytes()).hexdigest()
    assert out["ok"]["aspect_flat_n"] == int(np.isnan(asp).sum())
    assert out["ok"]["aspect_md5"] == hashlib.md5(asp.tobytes()).hexdigest()
    assert out["ok"]["relief_md5"] == hashlib.md5(rel.tobytes()).hexdigest()
    assert out["nogeo"]["w"] == -1 and out["broken"]["slope_md5"] == ""


def test_color_relief_ramp():
    """Piecewise-linear ramp: exact midpoints, clamping below/above the ramp,
    and round-half-up quantization — hand-derived pins."""
    ramp = [(0.0, 0, 0, 255), (100.0, 0, 255, 0), (200.0, 255, 0, 0)]
    dem = np.array([[-50.0, 0.0, 50.0], [100.0, 150.0, 500.0]])
    out = terrain.color_relief_np(dem, ramp)
    assert out.shape == (2, 3, 3)
    assert out[0, 0].tolist() == [0, 0, 255]      # clamped below
    assert out[0, 1].tolist() == [0, 0, 255]      # first stop
    assert out[0, 2].tolist() == [0, 128, 128]    # midpoint: 127.5 rounds half-up
    assert out[1, 0].tolist() == [0, 255, 0]      # exact stop
    assert out[1, 1].tolist() == [128, 128, 0]    # midpoint of upper segment
    assert out[1, 2].tolist() == [255, 0, 0]      # clamped above
    with pytest.raises(ValueError, match="2 stops"):
        terrain.color_relief_np(dem, [(0.0, 1, 2, 3)])
    with pytest.raises(ValueError, match="distinct"):
        terrain.color_relief_np(dem, [(0.0, 1, 2, 3), (0.0, 4, 5, 6)])


def test_zonal_stats_hand_pins(spark):
    """Rectangle zone over a ramp DEM with hand-computable membership:
    expected values derived by a direct rectangle-bounds check on pixel
    centers (NOT a polygon test), plus multi-raster aggregation and the
    georef-less skip path."""
    import math

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    ORIGIN = 20037508.342789244
    R = 6378137.0

    def inv(mx, my):
        return mx / ORIGIN * 180.0, math.degrees(
            2.0 * math.atan(math.exp(my / R)) - math.pi / 2.0
        )

    # DEM: 8x8, gsd=1, top-left (0, 1000); value = 10*r + c
    dem = (10.0 * np.arange(8)[:, None] + np.arange(8)[None, :]).astype(np.float32)
    blob = tiffcodec.encode_tiff(dem, geo={"gsd": 1.0, "mx0": 0.0, "my1": 1000.0, "epsg": 3857})
    # zone rect meters x in (1.8, 4.2), y in (1000-4.2, 1000-1.8):
    # pixel centers inside: cols {2,3} (x=2.5,3.5), rows {2,3} (y=997.5,996.5)
    box = [(1.8, 1000 - 4.2), (4.2, 1000 - 4.2), (4.2, 1000 - 1.8), (1.8, 1000 - 1.8)]
    ring = [{"lon": lo, "lat": la} for lo, la in (inv(*p) for p in box)]
    expected = [dem[r, c] for r in (2, 3) for c in (2, 3)]  # 22,23,32,33
    images = spark.createDataFrame(
        [("a", blob), ("b", blob), ("nogeo", tiffcodec.encode_tiff(dem))],
        "image_id string, bytes binary",
    )
    zones = spark.createDataFrame(
        [("z0", ring)], "poly_id string, ring array<struct<lon:double,lat:double>>"
    )
    out = zonal.zonal_stats(images, zones).collect()
    assert len(out) == 1
    row = out[0]
    # two georeferenced copies contribute; the georef-less raster skips
    assert row["n_pixels"] == 2 * len(expected) == 8
    assert row["min_elev"] == 22.0 and row["max_elev"] == 33.0
    assert row["sum_elev"] == 2 * sum(expected) == 220.0
    assert row["mean_elev"] == pytest.approx(27.5)


def test_point_sample_hand_pins(spark):
    """Nearest/bilinear point sampling over a ramp DEM with hand-derived
    values: pixel-center point (exact), half-offset interpolation
    (37.5 by hand lerp), edge-replicate clamp at the corner, an outside
    point absent, and multi-raster fan-out (two covering rasters -> two
    rows per point)."""
    import math

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    ORIGIN = 20037508.342789244
    R = 6378137.0

    def inv(mx, my):
        return mx / ORIGIN * 180.0, math.degrees(
            2.0 * math.atan(math.exp(my / R)) - math.pi / 2.0
        )

    # DEM: 8x8, gsd=1, top-left (0, 1000); value = 10*r + c
    dem = (10.0 * np.arange(8)[:, None] + np.arange(8)[None, :]).astype(np.float32)
    blob = tiffcodec.encode_tiff(dem, geo={"gsd": 1.0, "mx0": 0.0, "my1": 1000.0, "epsg": 3857})
    pts_m = [
        (0, 2.5, 997.5),  # pixel center (2,2): nearest 22, bilinear 22
        (1, 3.0, 996.0),  # between (3..4, 2..3): nearest 43, bilinear 37.5
        (2, 0.2, 999.8),  # corner clamp: nearest 0, bilinear 0
        (3, 9.5, 997.5),  # outside [0,8): absent
    ]
    points = spark.createDataFrame(
        [(pid, *inv(mx, my)) for pid, mx, my in pts_m],
        "point_id long, lon double, lat double",
    )
    images = spark.createDataFrame(
        [("a", blob), ("b", blob), ("nogeo", tiffcodec.encode_tiff(dem))],
        "image_id string, bytes binary",
    )
    out = zonal.point_sample(images, points).collect()
    got = {(r["point_id"], r["image_id"]): r for r in out}
    # each in-bounds point appears once per georeferenced raster, never
    # for the georef-less one; the outside point is absent entirely
    assert set(got) == {(p, i) for p in (0, 1, 2) for i in ("a", "b")}
    for img in ("a", "b"):
        assert got[(0, img)]["value_nearest"] == 22.0
        assert got[(0, img)]["value_bilinear"] == pytest.approx(22.0, abs=1e-6)
        assert got[(1, img)]["value_nearest"] == 43.0
        assert got[(1, img)]["value_bilinear"] == pytest.approx(37.5, abs=1e-6)
        assert got[(2, img)]["value_nearest"] == 0.0
        assert got[(2, img)]["value_bilinear"] == pytest.approx(0.0, abs=1e-6)


def test_label_regions_hand_pins():
    """4-connected labeling against hand-enumerable rasters: constant
    (one region), checkerboard (every pixel its own), a ring around a
    hole (ring connects around the corner), diagonal pixels NOT
    connected, and canonical ids = min_row*w + min_col."""
    from tilers_tools_spark.operators.zonal import label_regions_np

    assert (label_regions_np(np.full((3, 4), 5.0)) == 0).all()
    board = np.indices((4, 4)).sum(0) % 2
    assert (label_regions_np(board) == np.arange(16).reshape(4, 4)).all()
    ring = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]])
    lab = label_regions_np(ring)
    assert lab[0, 0] == 0 and lab[1, 1] == 4 and lab[2, 2] == 0
    assert len(np.unique(lab)) == 2
    diag = np.array([[1, 0], [0, 1]])
    assert len(np.unique(label_regions_np(diag))) == 4


def test_polygonize_hand_pins(spark):
    """Region table over a hand-drawn raster: a 3x4 field of 7s with a
    single 9 at (1,2). Field: 11 px, perimeter 2*(3+4)+4-2... derived by
    edge count = 18 (boundary 14 + 4 island edges); island: 1 px,
    perimeter 4; bboxes by eye."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    a = np.full((3, 4), 7.0, dtype=np.float32)
    a[1, 2] = 9.0
    images = spark.createDataFrame(
        [("r", tiffcodec.encode_tiff(a))], "image_id string, bytes binary"
    )
    out = {r["region_id"]: r for r in zonal.polygonize(images).collect()}
    assert set(out) == {0, 6}  # canonical ids: (0,0) and (1,2)
    field, island = out[0], out[6]
    assert (field["value"], field["n_pixels"]) == (7.0, 11)
    assert (field["min_row"], field["min_col"], field["max_row"], field["max_col"]) == (0, 0, 2, 3)
    # perimeter: raster boundary 2*(3+4)=14 plus the 4 edges facing the island
    assert field["perimeter"] == 18
    assert (island["value"], island["n_pixels"], island["perimeter"]) == (9.0, 1, 4)
    assert (island["min_row"], island["min_col"], island["max_row"], island["max_col"]) == (1, 2, 1, 2)


def test_zonal_stats_disjoint_zone_absent(spark):
    """A zone whose bbox misses every raster is rejected before any mask
    work and is absent from the output."""
    import math

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    ORIGIN = 20037508.342789244
    R = 6378137.0

    def inv(mx, my):
        return mx / ORIGIN * 180.0, math.degrees(
            2.0 * math.atan(math.exp(my / R)) - math.pi / 2.0
        )

    dem = np.full((4, 4), 5.0, dtype=np.float32)
    blob = tiffcodec.encode_tiff(dem, geo={"gsd": 1.0, "mx0": 0.0, "my1": 100.0, "epsg": 3857})
    far = [(5000.0, 5000.0), (5010.0, 5000.0), (5010.0, 5010.0)]
    ring = [{"lon": lo, "lat": la} for lo, la in (inv(*p) for p in far)]
    images = spark.createDataFrame([("a", blob)], "image_id string, bytes binary")
    zones = spark.createDataFrame(
        [("faraway", ring)], "poly_id string, ring array<struct<lon:double,lat:double>>"
    )
    assert zonal.zonal_stats(images, zones).collect() == []


def test_edt_hand_pins():
    """Hand-derived exact squared-distance pins."""
    from tilers_tools_spark.operators import zonal

    m = np.zeros((3, 4), bool)
    m[1, 1] = True
    d = zonal.edt_np(m)
    # distances from the single target at (1,1), squared, by hand
    exp = np.array(
        [[2, 1, 2, 5],
         [1, 0, 1, 4],
         [2, 1, 2, 5]], np.int64)
    assert (d == exp).all()
    # two targets: nearest wins
    m2 = np.zeros((1, 5), bool)
    m2[0, 0] = m2[0, 4] = True
    assert zonal.edt_np(m2)[0].tolist() == [0, 1, 4, 1, 0]
    # no targets -> all -1
    assert (zonal.edt_np(np.zeros((2, 2), bool)) == -1).all()
    # all targets -> all 0
    assert (zonal.edt_np(np.ones((2, 3), bool)) == 0).all()


def test_edt_matches_brute_force():
    from tilers_tools_spark.operators import zonal

    rng = np.random.default_rng(5)
    for _ in range(5):
        m = rng.random((rng.integers(3, 20), rng.integers(3, 20))) < 0.08
        d = zonal.edt_np(m)
        ys, xs = np.nonzero(m)
        if len(ys) == 0:
            assert (d == -1).all()
            continue
        for y in range(m.shape[0]):
            for x in range(m.shape[1]):
                assert d[y, x] == ((ys - y) ** 2 + (xs - x) ** 2).min()


def test_sieve_hand_pins():
    """Hand-worked sieve cases for the documented spec."""
    from tilers_tools_spark.operators import zonal

    # single speck in a field: repainted with the background
    a = np.zeros((4, 4), np.float32)
    a[1, 2] = 9.0
    out, nb, na, changed = zonal.sieve_np(a, threshold=2)
    assert (out == 0).all() and nb == 2 and na == 1 and changed == 1

    # threshold 1 never repaints (size >= 1 always)
    out, nb, na, changed = zonal.sieve_np(a, threshold=1)
    assert changed == 0 and (out == a).all() and nb == na == 2

    # two neighbors: larger one wins. Layout (w=5):
    #   1 1 9 2 2     small {9} at (0,2) touches region 1 (size 4 incl
    #   1 1 9 2 2     (1,2)? no — 9s are their own region of size 2)
    # regions: 1s size 4, 9s size 2, 2s size 4 -> 9-region (size 2 < 3)
    # neighbors are 1s (size 4, id 0) and 2s (size 4, id 3):
    # tie on size -> smaller canonical id -> value 1.
    a = np.array([[1, 1, 9, 2, 2], [1, 1, 9, 2, 2]], np.float32)
    out, nb, na, changed = zonal.sieve_np(a, threshold=3)
    assert out[0, 2] == 1.0 and out[1, 2] == 1.0
    # after repaint the grid is 1 1 1 2 2 / 1 1 1 2 2 -> regions of size
    # 6 and 4, both >= 3 -> fixpoint with two regions
    assert nb == 3 and na == 2 and changed == 2


def test_sieve_iterates_to_fixpoint():
    from tilers_tools_spark.operators import zonal

    # chain: small region merges into small region, combined survives
    a = np.array([[5, 5, 5, 5, 7, 8, 8]], np.float32)
    out, nb, na, changed = zonal.sieve_np(a, threshold=3)
    # sweep 1: {7} (size1) and {8,8} (size2) both small.
    #  {7}: neighbors {5..} (size4) and {8,8} (size2) -> 5 wins -> 7->5
    #  {8,8}: neighbor {7} (size1) only -> largest is {7}? neighbors of
    #  the 8-region: only the 7 pixel -> repaint 8s with 7.
    # grid now: 5 5 5 5 5 7 7 -> sweep 2: {7,7} small, neighbor 5s -> 5.
    # fixpoint: all 5s.
    assert (out == 5.0).all()
    assert nb == 3 and na == 1 and changed == 3


def test_idw_hand_pins():
    from tilers_tools_spark.operators import zonal

    # single point: IDW of one point is exactly z everywhere
    pts = np.array([[10.0, 10.0, 42.5]])
    mx = np.array([0.0, 100.0])
    my = np.array([0.0, -50.0])
    assert zonal.idw_np(mx, my, pts).tolist() == [42.5, 42.5]
    # exact hit takes the coincident point's value
    pts = np.array([[5.0, 5.0, 7.0], [6.0, 5.0, 100.0]])
    assert zonal.idw_np(np.array([5.0]), np.array([5.0]), pts)[0] == 7.0
    # two symmetric points -> arithmetic mean (equal weights, exact)
    pts = np.array([[0.0, 0.0, 10.0], [4.0, 0.0, 20.0]])
    assert zonal.idw_np(np.array([2.0]), np.array([0.0]), pts)[0] == 15.0


def test_rasterize_overwrite_order(spark):
    import math

    from tilers_tools_spark.operators import zonal

    R = 6378137.0

    def inv(x, y):
        lon = math.degrees(x / R)
        lat = math.degrees(2.0 * math.atan(math.exp(y / R)) - math.pi / 2.0)
        return lon, lat

    # 4x4 grid, gsd 1000 m: pixel centers at x = 500..3500, y = my1-500..
    my1 = 1.0e5
    grid = {"w": 4, "h": 4, "gsd": 1000.0, "mx0": 0.0, "my1": my1}

    def rect(x0, x1, y0, y1):
        return [
            {"lon": lon, "lat": lat}
            for lon, lat in [inv(x0, y0), inv(x1, y0), inv(x1, y1), inv(x0, y1)]
        ]

    zones = spark.createDataFrame(
        [
            ("a", rect(-100.0, 1600.0, my1 - 4100.0, my1 + 100.0)),  # cols 0-1
            ("b", rect(900.0, 1600.0, my1 - 4100.0, my1 + 100.0)),  # col 1 only
        ],
        "poly_id string, ring array<struct<lon:double,lat:double>>",
    )
    out = zonal.rasterize(zones, grid, {"a": 1.0, "b": 2.0}, n_bands=2).toPandas()
    for band in (0, 1):
        sub = out[out["band"] == band].set_index("poly_id")
        # b burns after a (ascending id) and owns column 1
        assert sub.loc["a", "n_pixels"] == 2
        assert sub.loc["b", "n_pixels"] == 2
        assert sub.loc["__bg__", "n_pixels"] == 4
    assert out[out["poly_id"] == "b"]["burn_value"].unique().tolist() == [2.0]


def test_fillnodata_np_hand_pins():
    """Hand-computed fills: center of a 3x3 ring — axial neighbors weight
    1, diagonals 1/2 -> (2+4+6+8)*1 + (1+3+7+9)*0.5 = 30 over den 6 = 5.0."""
    from tilers_tools_spark.operators.zonal import fillnodata_np

    a = np.array([[1, 2, 3], [4, np.nan, 6], [7, 8, 9]], np.float64)
    out, filled = fillnodata_np(a, ~np.isnan(a), max_dist=4)
    assert filled.sum() == 1 and filled[1, 1]
    assert out[1, 1] == 5.0
    # valid pixels pass through untouched
    assert out[0, 0] == 1.0 and out[2, 2] == 9.0


def test_fillnodata_np_first_hit_and_clip():
    """Rays take the FIRST valid pixel only (nodata does not block), are
    clipped at borders, and respect max_dist."""
    from tilers_tools_spark.operators.zonal import fillnodata_np

    a = np.array([[np.nan, np.nan, 5.0]])
    out, filled = fillnodata_np(a, ~np.isnan(a), max_dist=4)
    # both holes see only the single valid pixel -> fill value 5.0
    assert filled.tolist() == [[True, True, False]]
    assert out[0, 0] == 5.0 and out[0, 1] == 5.0

    out1, filled1 = fillnodata_np(a, ~np.isnan(a), max_dist=1)
    # with max_dist=1 the far hole is out of reach and stays NaN
    assert filled1.tolist() == [[False, True, False]]
    assert np.isnan(out1[0, 0])


def test_fillnodata_np_all_nodata():
    from tilers_tools_spark.operators.zonal import fillnodata_np

    a = np.full((3, 3), np.nan)
    out, filled = fillnodata_np(a, np.zeros((3, 3), bool), max_dist=2)
    assert not filled.any() and np.isnan(out).all()


def test_fillnodata_operator_end_to_end(spark):
    """Operator over mixed-layout Float32 GeoTIFFs: counts reconcile and
    the out-of-reach wave blob core stays nodata (n_unfilled > 0)."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal
    from tilers_tools_spark.plans.queries import (
        _DEM_SPECS,
        _dem_surface,
        _fillnodata_mask,
    )

    rows = []
    for name, h, w, gsd in _DEM_SPECS:
        a = _dem_surface(name, h, w).copy()
        a[_fillnodata_mask(name, h, w)] = np.nan
        rows.append(
            (
                name,
                tiffcodec.encode_tiff(
                    a,
                    geo={"gsd": gsd, "mx0": 0.0, "my1": 1.0e5, "epsg": 3857},
                    compression="deflate" if name == "plane" else "none",
                    tile=16 if name == "wave" else None,
                ),
            )
        )
    images = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = zonal.fillnodata(images, max_dist=4).toPandas().set_index("image_id")
    for name, h, w, _gsd in _DEM_SPECS:
        m = _fillnodata_mask(name, h, w)
        row = out.loc[name]
        assert row["n_nodata"] == int(np.asarray(m).sum())
        assert row["n_filled"] + row["n_unfilled"] == row["n_nodata"]
    # scattered holes always reachable within 4 steps
    assert out.loc["plane", "n_unfilled"] == 0
    # 13x13 blob core is beyond every 4-step ray
    assert out.loc["wave", "n_unfilled"] > 0


def test_raster_stats_np_hand_pins():
    """values {1,2,2,3} @ quant 1e-3 -> q {1000,2000,2000,3000}: sums by
    hand; 4-bucket histogram over span 2001 -> buckets [1,2,0,1]."""
    from tilers_tools_spark.operators.zonal import raster_stats_np

    a = np.array([[1.0, 2.0], [2.0, 3.0]])
    base, counts = raster_stats_np(a, n_bins=4)
    assert base["n_valid"] == 4 and base["n_nodata"] == 0
    assert base["q_min"] == 1000 and base["q_max"] == 3000
    assert base["q_sum"] == 8000 and base["q_sumsq"] == 18_000_000
    assert counts == [1, 2, 0, 1]

    base2, counts2 = raster_stats_np(np.full((2, 2), np.nan), n_bins=4)
    assert base2["n_valid"] == 0 and base2["n_nodata"] == 4 and counts2 == []

    # constant raster: span 1, everything lands in bucket 0
    base3, counts3 = raster_stats_np(np.full((2, 3), 7.0), n_bins=4)
    assert base3["q_min"] == base3["q_max"] == 7000
    assert counts3 == [6, 0, 0, 0]


def test_raster_stats_operator(spark):
    """Operator end-to-end: bucket counts reconcile with n_valid, the
    all-NaN raster emits exactly one bucket=-1 row."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    a = np.array([[1.0, 2.0], [np.nan, 3.0]], np.float32)
    images = spark.createDataFrame(
        [
            ("tiny", tiffcodec.encode_tiff(a)),
            ("void", tiffcodec.encode_tiff(np.full((3, 3), np.nan, np.float32))),
        ],
        "image_id string, bytes binary",
    )
    out = zonal.raster_stats(images, n_bins=4).toPandas()
    tiny = out[out["image_id"] == "tiny"]
    assert len(tiny) == 4 and tiny["bucket_count"].sum() == 3
    assert tiny["n_nodata"].unique().tolist() == [1]
    void = out[out["image_id"] == "void"]
    assert len(void) == 1 and void.iloc[0]["bucket"] == -1
    assert void.iloc[0]["n_valid"] == 0


def test_grid_stat_hand_pins(spark):
    """2x1 grid, centers (1,1) and (3,1); points (0,1,z=10), (3,1,z=20).
    nearest: 10, 20. average r=2 (inclusive): (10+20)/2=15, 20.
    average r=0.5: cell 0 empty (sentinel + n_empty=1), cell 1 -> 20."""
    from tilers_tools_spark.operators import zonal

    grid = {"w": 2, "h": 1, "gsd": 2.0, "mx0": 0.0, "my1": 2.0}
    pts = spark.createDataFrame(
        [(0, 0.0, 1.0, 10.0), (1, 3.0, 1.0, 20.0)],
        "pt_id int, x double, y double, z double",
    )
    near = zonal.grid_stat(pts, grid, "nearest", n_bands=1).toPandas().iloc[0]
    assert near["q_min"] == 10_000 and near["q_max"] == 20_000
    assert near["q_sum"] == 30_000 and near["n_empty"] == 0

    avg = zonal.grid_stat(pts, grid, "average", radius=2.0, n_bands=1).toPandas().iloc[0]
    assert avg["q_sum"] == 35_000 and avg["q_min"] == 15_000 and avg["q_max"] == 20_000

    tight = zonal.grid_stat(pts, grid, "average", radius=0.5, n_bands=1).toPandas().iloc[0]
    assert tight["n_empty"] == 1 and tight["q_sum"] == 20_000

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zonal.grid_stat(pts, grid, "cubicspline")


def test_viewshed_np_hand_pins():
    """1x5 wall DEM [0,0,10,0,0], observer at (0,0), h=0: the wall top is
    visible (grazing <=), everything behind it hidden; with the observer
    raised to 30 the far cells clear the wall again."""
    from tilers_tools_spark.operators.terrain import (
        VIS_HIDDEN,
        VIS_NODATA,
        VIS_VISIBLE,
        viewshed_np,
    )

    wall = np.array([[0.0, 0.0, 10.0, 0.0, 0.0]])
    v = viewshed_np(wall, (0, 0))
    assert v.tolist() == [[255, 255, 255, 0, 0]]
    v30 = viewshed_np(wall, (0, 0), obs_height=30.0)
    assert v30.tolist() == [[255, 255, 255, 255, 255]]

    flat = np.zeros((5, 5))
    assert (viewshed_np(flat, (2, 2)) == VIS_VISIBLE).all()

    blocked = np.array([[0.0, np.nan, 0.0]])
    vb = viewshed_np(blocked, (0, 0))
    assert vb.tolist() == [[VIS_VISIBLE, VIS_NODATA, VIS_HIDDEN]]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="nodata"):
        viewshed_np(blocked, (0, 1))
    with _pytest.raises(ValueError, match="outside"):
        viewshed_np(flat, (9, 0))


def test_viewshed_operator(spark):
    """Operator end-to-end equals the NumPy kernel on the same DEM."""
    import hashlib

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import terrain

    a = (50.0 * np.sin(np.arange(12)[:, None] / 2.0) + np.arange(10)[None, :]).astype(
        np.float32
    )
    img = spark.createDataFrame(
        [("d", tiffcodec.encode_tiff(a))], "image_id string, bytes binary"
    )
    obs = spark.createDataFrame(
        [("d", 5, 5)], "image_id string, obs_row int, obs_col int"
    )
    out = terrain.viewshed(img, obs, obs_height=1.5).toPandas().iloc[0]
    vis = terrain.viewshed_np(a.astype(np.float64), (5, 5), 1.5)
    assert out["vis_md5"] == hashlib.md5(vis.tobytes()).hexdigest()
    assert out["n_visible"] == int((vis == 255).sum())
    assert out["n_visible"] + out["n_hidden"] + out["n_nodata"] == a.size


def test_raster_to_xyz_hand_pins(spark):
    """2x2 raster, gsd 10 at (100, 5000): centers (105,4995),(115,4995),
    (105,4985),(115,4985); NaN pixel skipped; stride honored."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    a = np.array([[1.5, np.nan], [3.0, 4.0]], np.float32)
    img = spark.createDataFrame(
        [
            (
                "t",
                tiffcodec.encode_tiff(
                    a, geo={"gsd": 10.0, "mx0": 100.0, "my1": 5000.0, "epsg": 3857}
                ),
            )
        ],
        "image_id string, bytes binary",
    )
    out = zonal.raster_to_xyz(img).toPandas().sort_values(["row", "col"])
    assert len(out) == 3
    assert out.iloc[0][["mx", "my", "q_value"]].tolist() == [105.0, 4995.0, 1500]
    assert out.iloc[1][["mx", "my", "q_value"]].tolist() == [105.0, 4985.0, 3000]
    assert out.iloc[2][["mx", "my", "q_value"]].tolist() == [115.0, 4985.0, 4000]

    strided = zonal.raster_to_xyz(img, stride=2).toPandas()
    assert len(strided) == 1 and strided.iloc[0]["q_value"] == 1500

    import pytest as _pytest

    no_geo = spark.createDataFrame(
        [("n", tiffcodec.encode_tiff(np.ones((1, 1), np.float32)))],
        "image_id string, bytes binary",
    )
    with _pytest.raises(Exception, match="georef"):
        zonal.raster_to_xyz(no_geo).toPandas()


def test_nearblack_np_hand_pins():
    """5x6 hand grid: border-connected near-zero collar strips (including
    a serpentine arm reaching inward), an interior near-zero lake that is
    NOT border-connected survives, and a NaN cell touching the collar
    extends it."""
    from tilers_tools_spark.operators import zonal

    N = np.nan
    a = np.array(
        [
            [0.0, 9.0, 9.0, 9.0, 9.0, 1.0],
            [1.0, 9.0, 9.0, 9.0, 9.0, 2.0],
            [9.0, 9.0, 1.0, 9.0, 9.0, N],
            [9.0, 9.0, 1.0, 9.0, 9.0, 9.0],
            [9.0, 9.0, 9.0, 9.0, 9.0, 9.0],
        ],
        np.float64,
    )
    out, collar = zonal.nearblack_np(a, target=0.0, tol=2.0)
    # border-connected: (0,0),(1,0) left edge; (0,5),(1,5) right edge;
    # (2,5) is NaN on the edge -> collar too
    expect = {(0, 0), (1, 0), (0, 5), (1, 5), (2, 5)}
    assert {tuple(p) for p in np.argwhere(collar)} == expect
    # interior lake (2,2),(3,2) survives (4-connected flood cannot reach)
    assert out[2, 2] == 1.0 and out[3, 2] == 1.0
    assert np.isnan(out[0, 0]) and np.isnan(out[2, 5])
    # non-collar values untouched
    assert out[4, 4] == 9.0

    # diagonal-only contact must NOT flood (4-connectivity): near cell at
    # (1,1) touching collar corner (0,0) only diagonally
    b = np.full((3, 3), 9.0)
    b[0, 0] = 0.0
    b[1, 1] = 0.5
    _, col2 = zonal.nearblack_np(b, 0.0, 2.0)
    assert col2[0, 0] and not col2[1, 1]


def test_nearblack_spark_summary(spark):
    """End-to-end over TIFF bytes: collar count, kept count, and q_sum
    match the NumPy kernel on the same surface."""
    import hashlib

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import zonal

    rng = np.random.default_rng(7)
    a = (rng.random((20, 30)) * 100.0 + 10.0).astype(np.float32)
    a[:3, :] = 0.0
    a[9:11, 14:16] = 1.0  # interior lake
    out, collar = zonal.nearblack_np(a.astype(np.float64), 0.0, 2.0)
    img = spark.createDataFrame(
        [("x", tiffcodec.encode_tiff(a, geo={"gsd": 1.0, "mx0": 0.0, "my1": 20.0, "epsg": 3857}))],
        "image_id string, bytes binary",
    )
    row = zonal.nearblack(img).toPandas().iloc[0]
    assert row["n_collar"] == int(collar.sum()) == 90
    assert row["n_kept"] == 20 * 30 - 90  # lake survives
    bad = np.isnan(out)
    q = np.where(bad, zonal.GRID_SENT, np.round(np.where(bad, 0.0, out) / 1e-3)).astype(np.int64)
    assert row["q_sum"] == int(q[~bad].sum())
    assert row["grid_md5"] == hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest()


def test_combined_and_multidirectional_hand_pins():
    """gdaldem -combined / -multidirectional analogue modes, pinned by
    an independent SCALAR transcription of the documented formulas
    (math module — the engine path is vectorized NumPy).

    Flat plane closed forms: combined -> acos(sin 45)*atan(0) term = 0
    -> shade 1 -> 255; multidirectional -> every directional shade is
    sin(alt) and the four sin^2 weights sum to 2 -> 180 (the standard
    flat value)."""
    import math

    flat = np.full((6, 8), 7.0)
    assert (terrain.hillshade_np(flat, 1.0, mode="combined") == 255).all()
    assert (terrain.hillshade_np(flat, 1.0, mode="multidirectional") == 180).all()

    # uniform east ramp z = 5x at gsd=1: interior Horn gradients are
    # exactly p=5, qn=0
    c = np.arange(9)[None, :] + np.zeros((7, 1))
    dem = 5.0 * c
    p, qn = 5.0, 0.0
    alt = math.radians(45.0)

    def ndotl(az_deg):
        az = math.radians(az_deg)
        return (
            -p * math.sin(az) * math.cos(alt)
            - qn * math.cos(az) * math.cos(alt)
            + math.sin(alt)
        ) / math.sqrt(1.0 + p * p + qn * qn)

    def u8(x):
        return int(min(max(math.floor(255.0 * x + 0.5), 0.0), 255.0))

    # combined, lit from the east (azimuth 90)
    nd = min(max(ndotl(90.0), -1.0), 1.0)
    want_c = u8(
        min(max(1.0 - math.acos(nd) * math.atan(math.hypot(p, qn))
                / ((math.pi / 2.0) ** 2), 0.0), 1.0)
    )
    got_c = terrain.hillshade_np(dem, 1.0, azimuth=90.0, mode="combined")
    assert (got_c[1:-1, 1:-1] == want_c).all()

    # multidirectional: aspect = atan2(-p, -qn); weights sin^2(aspect-az)
    aspect = math.atan2(-p, -qn)
    acc = 0.0
    for az_deg in (225.0, 270.0, 315.0, 360.0):
        wgt = math.sin(aspect - math.radians(az_deg)) ** 2
        acc += wgt * max(ndotl(az_deg), 0.0)
    want_m = u8(acc / 2.0)
    got_m = terrain.hillshade_np(dem, 1.0, mode="multidirectional")
    assert (got_m[1:-1, 1:-1] == want_m).all()
    # the mode flag must actually change the picture on sloped ground
    std = terrain.hillshade_np(dem, 1.0)
    assert want_m != std[3, 3] and want_c != std[3, 3]

    with pytest.raises(ValueError, match="hillshade mode"):
        terrain.hillshade_np(dem, 1.0, mode="igor")


def test_grid_metrics_hand_pins(spark):
    """Data-metrics family on the same 2x1 grid / two-point fixture
    (centers (1,1) and (3,1); points (0,1,z=10) d=1&2.236.., (3,1,z=20)
    d=2&0). radius=2 inclusive: cell0 sees both points (d=1, 2), cell1
    sees only (3,1) (d=2.236 > 2 for the far point? no: center (3,1) to
    (0,1) is d=3 — out; to (3,1) is d=0 — in).

    minimum: 10, 20. maximum: 20, 20. range: 10, 0. count: 2, 1.
    average_distance: (1+2)/2 = 1.5, 0."""
    from tilers_tools_spark.operators import zonal

    grid = {"w": 2, "h": 1, "gsd": 2.0, "mx0": 0.0, "my1": 2.0}
    pts = spark.createDataFrame(
        [(0, 0.0, 1.0, 10.0), (1, 3.0, 1.0, 20.0)],
        "pt_id int, x double, y double, z double",
    )

    def run(alg, radius=2.0):
        return zonal.grid_stat(pts, grid, alg, radius=radius, n_bands=1).toPandas().iloc[0]

    mn = run("minimum")
    assert (mn["q_min"], mn["q_max"], mn["q_sum"]) == (10_000, 20_000, 30_000)
    mx = run("maximum")
    assert (mx["q_min"], mx["q_max"], mx["q_sum"]) == (20_000, 20_000, 40_000)
    rg = run("range")
    assert (rg["q_min"], rg["q_max"], rg["q_sum"]) == (0, 10_000, 10_000)
    ct = run("count")
    assert (ct["q_min"], ct["q_max"], ct["q_sum"]) == (1_000, 2_000, 3_000)
    ad = run("average_distance")
    assert (ad["q_min"], ad["q_max"], ad["q_sum"]) == (0, 1_500, 1_500)
    # empty cells surface as sentinel, not zero
    tight = run("count", radius=0.5)
    assert tight["n_empty"] == 1 and tight["q_sum"] == 1_000


def test_label_regions_8connected_vs_bruteforce():
    """8-connected labeling (gdal_polygonize -8) vs an independent BFS
    flood fill on randomized rasters — includes the checkerboard, which
    is 16 regions 4-connected but collapses to 2 under 8-connectivity,
    and the diagonal-run sweep edge case (runs that touch only at a
    shared endpoint column)."""
    from tilers_tools_spark.operators.zonal import label_regions_np

    board = (np.add.outer(np.arange(4), np.arange(4)) % 2).astype(np.uint8)
    lab8 = label_regions_np(board, connect8=True)
    # two interleaved diagonal regions, canonical ids 0 and 1
    assert sorted(np.unique(lab8).tolist()) == [0, 1]
    assert (label_regions_np(board) == np.arange(16).reshape(4, 4)).all()

    # the sweep lookahead case: prev run [0,2) of value v, cur runs
    # [0,2) of other value then [2,..) of v — diagonal touch at the
    # shared endpoint
    tricky = np.array([[1, 1, 0], [0, 0, 1]], np.uint8)
    l8 = label_regions_np(tricky, connect8=True)
    assert l8[0, 0] == l8[1, 2]  # the two 1-runs join diagonally
    assert l8[0, 2] == l8[1, 0]  # and so do the two 0-runs

    def bfs(a, conn8):
        h, w = a.shape
        lab = -np.ones((h, w), np.int64)
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)] + (
            [(-1, -1), (-1, 1), (1, -1), (1, 1)] if conn8 else []
        )
        for r0 in range(h):
            for c0 in range(w):
                if lab[r0, c0] >= 0:
                    continue
                cid = r0 * w + c0
                st = [(r0, c0)]
                lab[r0, c0] = cid
                while st:
                    r, c = st.pop()
                    for dr, dc in nbrs:
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < h and 0 <= cc < w and lab[rr, cc] < 0 and a[rr, cc] == a[r, c]:
                            lab[rr, cc] = cid
                            st.append((rr, cc))
        return lab

    rng = np.random.RandomState(11)
    for _ in range(40):
        h, w = rng.randint(1, 11), rng.randint(1, 11)
        a = rng.randint(0, 3, (h, w)).astype(np.uint8)
        for conn8 in (False, True):
            assert (label_regions_np(a, connect8=conn8) == bfs(a, conn8)).all()


def test_contour_bands_hand_pins(spark):
    """gdal_contour -p analogue: a 2x4 ramp [0,10,20,30] with levels
    (5, 25) splits into bands 0|1|1|2 per row -> three regions of 2, 4,
    2 pixels; a NaN cell gets band -1 as its own region."""
    from tilers_tools_spark.functions import tiffcodec

    a = np.array([[0.0, 10.0, 20.0, 30.0], [0.0, 10.0, 20.0, np.nan]], np.float32)
    blob = tiffcodec.encode_tiff(a, geo={"gsd": 1.0, "mx0": 0.0, "my1": 2.0, "epsg": 3857})
    df = spark.createDataFrame([("r", blob)], "image_id string, bytes binary")
    rows = {r["region_id"]: r for r in terrain.contour_bands(df, (5.0, 25.0)).collect()}
    assert len(rows) == 4
    assert rows[0]["band"] == 0 and rows[0]["n_pixels"] == 2
    assert rows[1]["band"] == 1 and rows[1]["n_pixels"] == 4
    assert rows[3]["band"] == 2 and rows[3]["n_pixels"] == 1
    assert rows[7]["band"] == -1 and rows[7]["n_pixels"] == 1
    # boundary rule: v == level counts as the upper band (levels <= v)
    b = np.array([[5.0, 25.0]], np.float32)
    blob2 = tiffcodec.encode_tiff(b, geo={"gsd": 1.0, "mx0": 0.0, "my1": 1.0, "epsg": 3857})
    df2 = spark.createDataFrame([("e", blob2)], "image_id string, bytes binary")
    got = sorted(r["band"] for r in terrain.contour_bands(df2, (5.0, 25.0)).collect())
    assert got == [1, 2]

    with pytest.raises(ValueError, match="level"):
        terrain.contour_bands(df, ())


def test_sieve_8connected_hand_pin():
    """-8 flag: a 2-pixel diagonal pair is ONE region under 8-conn
    (survives threshold=2), but two 1-pixel regions under 4-conn (both
    repainted)."""
    from tilers_tools_spark.operators import zonal

    a = np.array(
        [[5.0, 0.0, 0.0], [0.0, 5.0, 0.0], [0.0, 0.0, 0.0]], np.float32
    )
    out4, nb4, na4, ch4 = zonal.sieve_np(a, threshold=2)
    assert ch4 == 2 and (out4 == 0.0).all() and nb4 == 3 and na4 == 1
    out8, nb8, na8, ch8 = zonal.sieve_np(a, threshold=2, connect8=True)
    assert nb8 == 2 and ch8 == 0 and (out8 == a).all()


def test_contour_lines_hand_pins():
    """Polyline chaining hand derivations:
    east ramp, level 2.5 -> ONE open vertical polyline of H points,
      oriented top-down (smaller endpoint first), length H-1;
    isolated peak -> ONE closed diamond: 4 distinct vertices + WKT
      closure point, rotated to start at the lexicographically smallest
      vertex (0.5, 1.0);
    flat -> no lines."""
    flat = np.full((4, 4), 9.0)
    assert terrain.contour_lines_np(flat, 1.0) == []
    n, ncl, npts, tot, _ = terrain.contour_lines_stats(flat, 1.0)
    assert (n, ncl, npts, tot) == (0, 0, 0, 0.0)

    c = np.arange(9)[None, :] + np.zeros((5, 1))
    chains = terrain.contour_lines_np(1.0 * c, 2.5)
    assert len(chains) == 1
    ch = chains[0]
    assert ch == [(2.5, float(y)) for y in range(5)]  # open, top-down
    n, ncl, npts, tot, _ = terrain.contour_lines_stats(1.0 * c, 2.5, gsd=2.0)
    assert (n, ncl, npts, tot) == (1, 0, 5, 8.0)

    peak = np.zeros((3, 3))
    peak[1, 1] = 5.0
    chains = terrain.contour_lines_np(peak, 2.5)
    assert len(chains) == 1
    ring = chains[0]
    assert ring[0] == ring[-1] == (0.5, 1.0)  # min vertex, closed
    assert len(ring) == 5
    assert set(ring) == {(1.0, 0.5), (0.5, 1.0), (1.5, 1.0), (1.0, 1.5)}
    # direction rule: second vertex lexicographically smaller than last
    assert ring[1] < ring[-2]
    n, ncl, npts, tot, _ = terrain.contour_lines_stats(peak, 2.5)
    assert (n, ncl, npts) == (1, 1, 5) and np.isclose(tot, 2.0 * np.sqrt(2.0))


def test_contour_lines_match_independent_tracer():
    """Engine adjacency-walk chains == the golden's worklist-merging
    tracer on randomized DEMs (junctions included: integer DEMs with
    levels hitting grid values force node-degree breakpoints), and the
    chains reassemble the exact original segment soup."""
    import sys

    sys.path.insert(0, "tools")
    from make_golden_sql import _trace_chains_scalar

    rng = np.random.default_rng(11)
    for trial in range(12):
        h, w = rng.integers(3, 9, 2)
        if trial % 3 == 2:
            dem = rng.integers(0, 4, (h, w)).astype(np.float64)
            level = 1.0  # equals grid values -> node crossings -> junctions
        else:
            dem = rng.normal(0, 1, (h, w))
            level = float(rng.normal(0, 0.5))
        segs = terrain.contour_segments_np(dem, level)
        got = terrain.contour_lines_np(dem, level)
        want = _trace_chains_scalar(segs)
        assert got == want, f"trial {trial}: chain mismatch"
        # chains decompose back into the original segment multiset
        def canon_seg(a, b):
            return (a, b) if a <= b else (b, a)

        soup = sorted(
            canon_seg((float(s[0]), float(s[1])), (float(s[2]), float(s[3])))
            for s in segs
            if (float(s[0]), float(s[1])) != (float(s[2]), float(s[3]))
        )
        rebuilt = sorted(
            canon_seg(p, q) for ch in got for p, q in zip(ch, ch[1:])
        )
        assert rebuilt == soup, f"trial {trial}: segment soup not preserved"


def test_contour_lines_operator_wkt(spark):
    """include_wkt=True emits one WKT LINESTRING row per polyline that
    matches the local kernel; the summary mode matches
    contour_lines_stats per (raster, level)."""
    from tilers_tools_spark.functions import tiffcodec

    r = np.arange(12)[:, None] + np.zeros((1, 16))
    c = np.arange(16)[None, :] + np.zeros((12, 1))
    dem = (2.0 * r - c).astype(np.float32)
    blob = tiffcodec.encode_tiff(
        dem, geo={"gsd": 3.0, "mx0": 0.0, "my1": 100.0, "epsg": 3857},
        compression="deflate",
    )
    df = spark.createDataFrame(
        [("d", blob), ("junk", b"xx")], "image_id string, bytes binary"
    )
    levels = [4.5, 11.25]
    summ = {
        (row["image_id"], row["level"]): row
        for row in terrain.contour_lines(df, levels).collect()
    }
    for lv in levels:
        n, ncl, npts, tot, md5 = terrain.contour_lines_stats(
            dem.astype(np.float64), lv, gsd=3.0
        )
        got = summ[("d", lv)]
        assert (got["n_lines"], got["n_closed"], got["n_points"]) == (n, ncl, npts)
        assert got["total_len"] == tot and got["wkt_md5"] == md5
        assert summ[("junk", lv)]["n_lines"] == -1  # auditable failure row

    wkt_rows = terrain.contour_lines(df, levels, include_wkt=True).collect()
    for lv in levels:
        want = [
            "LINESTRING (" + ", ".join("%.9f %.9f" % p for p in ch) + ")"
            for ch in terrain.contour_lines_np(dem.astype(np.float64), lv)
        ]
        got = [
            r["wkt"] for r in wkt_rows if r["image_id"] == "d" and r["level"] == lv
        ]
        assert sorted(got) == sorted(want) and len(got) == len(want)
    assert [r for r in wkt_rows if r["image_id"] == "junk"][0]["wkt"] == ""


def test_terrain_rgb_hand_pinned_kats():
    """Published-encoding anchors computed by hand: terrarium packs
    v+32768 as R=whole/256, G=whole%256, B=frac*256 (floor); mapbox
    packs round((v+10000)*10) big-endian into 24 bits."""
    t = terrain.terrain_rgb_encode_np
    # terrarium: 0 m -> 32768 -> (128, 0, 0); 1.5 m -> (128, 1, 128);
    # -1 m -> 32767 -> (127, 255, 0); 0.25 m -> (128, 0, 64)
    dem = np.array([[0.0, 1.5], [-1.0, 0.25]])
    exp = np.array(
        [[[128, 0, 0, 255], [128, 1, 128, 255]],
         [[127, 255, 0, 255], [128, 0, 64, 255]]], np.uint8
    )
    assert np.array_equal(t(dem, "terrarium"), exp)
    # mapbox: 0 m -> 100000 = 1*65536 + 134*256 + 160 -> (1, 134, 160);
    # -10000 m -> (0, 0, 0); 8848.6 m -> 188486 -> (2, 224, 70)
    dem2 = np.array([[0.0, -10000.0, 8848.6]])
    exp2 = np.array([[[1, 134, 160, 255], [0, 0, 0, 255], [2, 224, 70, 255]]], np.uint8)
    assert np.array_equal(t(dem2, "mapbox"), exp2)
    # NaN -> alpha 0, decodes back to NaN
    dem3 = np.array([[np.nan, 7.0]])
    enc = t(dem3, "terrarium")
    assert enc[0, 0, 3] == 0 and enc[0, 1, 3] == 255
    back = terrain.terrain_rgb_decode_np(enc, "terrarium")
    assert np.isnan(back[0, 0]) and back[0, 1] == 7.0


def test_terrain_rgb_quantization_bounds_roundtrip():
    rng = np.random.default_rng(9)
    dem = rng.uniform(-500.0, 4000.0, (37, 23))
    dem[3, 4] = np.nan
    for encoding, step in (("terrarium", 1.0 / 256.0), ("mapbox", 0.1)):
        enc = terrain.terrain_rgb_encode_np(dem, encoding)
        back = terrain.terrain_rgb_decode_np(enc, encoding)
        finite = ~np.isnan(dem)
        err = np.abs(back[finite] - dem[finite])
        # floor quantization (terrarium) errs < step; round (mapbox) <= step/2
        assert err.max() < step + 1e-12
        assert np.isnan(back[3, 4])
    with pytest.raises(ValueError, match="unknown terrain encoding"):
        terrain.terrain_rgb_encode_np(dem, "bogus")
    with pytest.raises(ValueError, match="RGB"):
        terrain.terrain_rgb_decode_np(np.zeros((2, 2)), "terrarium")


def test_dem_tile_np_vs_scalar_replay():
    """Engine tile sampling vs a per-pixel SCALAR transcription of the
    documented affine mapping (independent of the vectorized path)."""
    import math

    from tilers_tools_spark.functions import tilemath as tm

    rng = np.random.default_rng(21)
    dem = rng.uniform(-50, 400, (24, 20))
    dem[5, 7] = np.nan
    z = 17
    span = float(tm.resolution_np(z)) * 256
    geo = {"gsd": span / 16.0, "mx0": 3 * span - tm.ORIGIN + 0.25 * span,
           "my1": 9 * span - tm.ORIGIN - 0.125 * span, "epsg": 3857}
    for txx, ty in [(3, 8), (4, 8), (3, 7)]:
        for resample in ("nearest", "bilinear"):
            got = terrain.dem_tile_np(dem, geo, z, txx, ty, resample=resample)
            res = span / 256.0
            tmx0 = txx * span - tm.ORIGIN
            tmy1 = (ty + 1) * span - tm.ORIGIN
            h, w = dem.shape
            for r in range(0, 256, 37):
                for c in range(0, 256, 41):
                    sx = (tmx0 + (c + 0.5) * res - geo["mx0"]) / geo["gsd"]
                    sy = (geo["my1"] - (tmy1 - (r + 0.5) * res)) / geo["gsd"]
                    if resample == "nearest":
                        ci, ri = math.floor(sx), math.floor(sy)
                        want = dem[ri, ci] if (0 <= ci < w and 0 <= ri < h) else float("nan")
                    else:
                        if not (0 <= sx < w and 0 <= sy < h):
                            want = float("nan")
                        else:
                            u, v = sx - 0.5, sy - 0.5
                            c0, r0 = math.floor(u), math.floor(v)
                            fc, fr = u - c0, v - r0
                            cc = lambda x: min(max(x, 0), w - 1)  # noqa: E731
                            rr = lambda x: min(max(x, 0), h - 1)  # noqa: E731
                            top = dem[rr(r0), cc(c0)] * (1 - fc) + dem[rr(r0), cc(c0 + 1)] * fc
                            bot = dem[rr(r0 + 1), cc(c0)] * (1 - fc) + dem[rr(r0 + 1), cc(c0 + 1)] * fc
                            want = top * (1 - fr) + bot * fr
                    g = got[r, c]
                    assert (np.isnan(g) and np.isnan(want)) or g == want


def test_dem_tiles_end_to_end(spark):
    """DEM -> terrain-RGB PNG tiles: keys match cover_range, every tile's
    PNG decodes back to the quantized elevations of dem_tile_np, all-NaN
    tiles are elided, bad rows carry sentinels."""
    from tilers_tools_spark.functions import codecs, tiffcodec, tilemath as tm

    rng = np.random.default_rng(22)
    dem = np.round(rng.uniform(0, 300, (32, 40))).astype(np.float64)
    z = 17
    span = float(tm.resolution_np(z)) * 256
    geo = {"gsd": span / 16.0, "mx0": 5 * span - tm.ORIGIN + 0.5 * span,
           "my1": 4 * span - tm.ORIGIN - 0.25 * span, "epsg": 3857}
    blob = tiffcodec.encode_tiff(dem.astype(np.float32), geo=geo, compression="deflate")
    df = spark.createDataFrame(
        [("d", bytearray(blob)), ("junk", bytearray(b"nope"))],
        "image_id string, bytes binary",
    )
    rows = terrain.dem_tiles(df, zooms=(z,), encoding="terrarium").collect()
    bad = [r for r in rows if r["image_id"] == "junk"]
    assert len(bad) == 1 and bad[0]["z"] == -1 and bytes(bad[0]["tile"]) == b""
    good = [r for r in rows if r["image_id"] == "d"]
    gmy0 = geo["my1"] - 32 * geo["gsd"]
    gmx1 = geo["mx0"] + 40 * geo["gsd"]
    x0, x1, y0, y1 = tm.cover_range_np(geo["mx0"], gmy0, gmx1, geo["my1"], z)
    keys = {(r["x"], r["y"]) for r in good}
    assert keys == {(xx, yy) for xx in range(int(x0), int(x1) + 1)
                    for yy in range(int(y0), int(y1) + 1)}
    dem32 = dem.astype(np.float32).astype(np.float64)
    for r in good:
        rgba = codecs.decode_png(bytes(r["tile"]))
        back = terrain.terrain_rgb_decode_np(rgba, "terrarium")
        elev = terrain.dem_tile_np(dem32, geo, z, r["x"], r["y"])
        finite = ~np.isnan(elev)
        assert (np.isnan(back) == ~finite).all()
        assert int(finite.sum()) == r["n_valid"] and r["n_valid"] > 0
        assert np.abs(back[finite] - elev[finite]).max() < 1.0 / 256.0 + 1e-12
