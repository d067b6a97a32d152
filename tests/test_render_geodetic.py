"""Global-geodetic (EPSG:4326 plate-carree) pyramid profile — the
gdal2tiles `--profile geodetic` counterpart (SURVEY.md §2.3 rows 14-17
note; reference gdal_tiler.py::GlobalGeodetic profile [R] — checkout
empty, SURVEY.md §0.1).

Engine (operators/render.py::render_image_pyramid_geodetic, vectorized
separable column/row stages) vs oracle (oracle/minitiler.py::
tile_image_geo, scalar per-row loop) must agree BIT-FOR-TILE on the
rectangular 2^(z+1) x 2^z grid, plus pure-math pins for the geodetic
tilemath twins (Column vs NumPy) and the grid's defining properties.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fixtures import gen
from oracle import minitiler as mt
from tilers_tools_spark.functions import tilemath as tm
from tilers_tools_spark.operators.render import (
    render_image_pyramid_geodetic,
    render_pyramid_geodetic,
)

RECS = list(gen.gen_images(6, fmts=("raw", "png")))


# ---------------------------------------------------------------------------
# bit-for-tile engine vs oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("base_resampling", ["bilinear", "nearest"])
def test_bit_for_tile_full_pyramid(base_resampling):
    for rec in RECS[:3]:
        eng = render_image_pyramid_geodetic(rec, base_resampling=base_resampling)
        ora = {
            (r["z"], r["x"], r["y"]): r["rgba"]
            for r in mt.tile_image_geo(rec, base_resampling=base_resampling)
        }
        assert set(eng) == set(ora)
        for k, arr in eng.items():
            assert np.array_equal(arr, ora[k]), k


def test_bit_for_tile_cubic_and_overview_kernels():
    rec = RECS[3]
    for resampling in ("average", "antialias", "nearest"):
        eng = render_image_pyramid_geodetic(rec, resampling=resampling, base_resampling="cubic")
        ora = {
            (r["z"], r["x"], r["y"]): r["rgba"]
            for r in mt.tile_image_geo(rec, resampling=resampling, base_resampling="cubic")
        }
        assert set(eng) == set(ora)
        for k, arr in eng.items():
            assert np.array_equal(arr, ora[k]), k


def test_bit_for_tile_lanczos_base_level_only():
    # scalar-oracle lanczos is slow: pin the base level of one image
    rec = RECS[4]
    geo = mt.georef_of(rec["phash"], rec["w"], rec["h"])
    zb = mt.base_zoom_geo(geo["gsd"])
    eng = render_image_pyramid_geodetic(rec, base_resampling="lanczos", zmin=zb, zmax=zb)
    ora = {
        (r["z"], r["x"], r["y"]): r["rgba"]
        for r in mt.tile_image_geo(rec, base_resampling="lanczos", zmin=zb, zmax=zb)
    }
    assert set(eng) == set(ora)
    for k, arr in eng.items():
        assert np.array_equal(arr, ora[k]), k


def test_grid_is_rectangular_and_base_zoom_is_mercator_minus_one():
    """The geodetic grid's defining properties on real fixture output:
    x may exceed 2^z - 1 (2^(z+1) columns), y never does (2^z rows), and
    the chosen base zoom is exactly the mercator base zoom - 1 (same
    256px tile, twice the angular width per zoom)."""
    saw_wide_x = False
    for rec in RECS:
        geo = mt.georef_of(rec["phash"], rec["w"], rec["h"])
        assert mt.base_zoom_geo(geo["gsd"]) == mt.base_zoom(geo["gsd"]) - 1
        tiles = render_image_pyramid_geodetic(rec)
        for z, x, y in tiles:
            assert 0 <= x < (1 << (z + 1))
            assert 0 <= y < (1 << z)
            if x >= (1 << z):
                saw_wide_x = True
    assert saw_wide_x, "fixture set never exercised the eastern hemisphere-half"


# ---------------------------------------------------------------------------
# geodetic tilemath twins: Column exprs == NumPy reference
# ---------------------------------------------------------------------------


def test_tilemath_geo_twins(spark):
    rng = np.random.default_rng(7)
    n = 4000
    lon = rng.uniform(-180.0, 180.0, n)
    lat = rng.uniform(-90.0, 90.0, n)
    z = rng.integers(0, 16, n)
    gsd = 2.0 ** rng.uniform(0.0, 14.0, n)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat, "z": z, "gsd": gsd}))
    got = (
        df.select(
            tm.tile_x_geo(F.col("lon"), F.col("z")).alias("tx"),
            tm.tile_y_geo_tms(F.col("lat"), F.col("z")).alias("ty"),
            tm.base_zoom_geo(F.col("gsd")).alias("zb"),
        )
        .toPandas()
    )
    etx, ety = tm.tile_xy_geo_np(lon, lat, z)
    ezb = tm.base_zoom_geo_np(gsd)
    assert np.array_equal(got.tx.to_numpy(), etx)
    assert np.array_equal(got.ty.to_numpy(), ety)
    assert np.array_equal(got.zb.to_numpy(), ezb)


def test_cover_range_geo_edge_rule():
    """An extent edge exactly on a tile boundary does not pull in the
    empty neighbor (half-open rule), and the clamp is rectangular."""
    # z=2: span = 45 deg; box exactly covering tile (tx=4, ty=2) = lon [0,45) lat [0,45)
    txmin, txmax, tymin, tymax = (int(v) for v in tm.cover_range_geo_np(0.0, 0.0, 45.0, 45.0, 2))
    assert (txmin, txmax, tymin, tymax) == (4, 4, 2, 2)
    # whole world at z=1: 4 x 2 tiles
    txmin, txmax, tymin, tymax = (int(v) for v in tm.cover_range_geo_np(-180.0, -90.0, 180.0, 90.0, 1))
    assert (txmin, txmax, tymin, tymax) == (0, 3, 0, 1)
    # oracle transcription agrees
    assert mt.cover_geo(0.0, 0.0, 45.0, 45.0, 2) == (4, 4, 2, 2)
    assert mt.cover_geo(-180.0, -90.0, 180.0, 90.0, 1) == (0, 3, 0, 1)


def test_tile_bounds_geo_roundtrip():
    z = np.array([3, 3, 5])
    tx = np.array([0, 15, 40])
    ty = np.array([0, 7, 20])
    lon0, lat0, lon1, lat1 = tm.tile_bounds_geo_np(z, tx, ty)
    # centers map back to the same tile
    ctx, cty = tm.tile_xy_geo_np((lon0 + lon1) / 2, (lat0 + lat1) / 2, z)
    assert np.array_equal(ctx, tx) and np.array_equal(cty, ty)
    # z=3 tile (0,0) is the SW corner tile
    assert lon0[0] == -180.0 and lat0[0] == -90.0


# ---------------------------------------------------------------------------
# distributed operator end-to-end
# ---------------------------------------------------------------------------


def test_plan_run_geodetic_profile(spark, tmp_path):
    """tile_pyramid.run(profile='geodetic') commits geodetic-grid tiles
    through the same resume machinery, and the plan guard refuses a
    profile flip on resume (mixed grids in one run are unrecoverable)."""
    from tilers_tools_spark.plans import tile_pyramid as tp
    from tilers_tools_spark.sources.catalog import Catalog

    rows = [
        (r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
        for r in RECS[:2]
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    cat = Catalog(spark, str(tmp_path / "cat"))
    m = tp.run(spark, images, cat, run_id="g1", n_parts=2, profile="geodetic")
    assert m["parts_run"] == 2
    got = cat.read("tiles").select("image_id", "z", "x", "y").toPandas()
    expected = set()
    for rec in RECS[:2]:
        for r in mt.tile_image_geo(rec):
            expected.add((rec["image_id"], r["z"], r["x"], r["y"]))
    assert set(zip(got.image_id, got.z, got.x, got.y)) == expected
    # resume with the OTHER profile must refuse loudly
    with pytest.raises(ValueError, match="profile"):
        tp.run(spark, images, cat, run_id="g1", n_parts=2, profile="mercator")
    # bad profile string refused up front
    with pytest.raises(ValueError, match="profile"):
        tp.run(spark, images, cat, run_id="g2", n_parts=2, profile="utm")


def test_render_pyramid_geodetic_dataframe(spark):
    rows = [
        (r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
        for r in RECS[:3]
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    out = render_pyramid_geodetic(images).toPandas()
    expected = {}
    for rec in RECS[:3]:
        for r in mt.tile_image_geo(rec):
            expected[(rec["image_id"], r["z"], r["x"], r["y"])] = r
    got_keys = set(zip(out.image_id, out.z, out.x, out.y))
    assert got_keys == set(expected)
    z = out.z.to_numpy(np.int64)
    assert np.array_equal(out.y_xyz.to_numpy(), (1 << z) - 1 - out.y.to_numpy())
    # s2 cell + tile-center lat/lon match the oracle row-for-row
    for t in out.itertuples():
        e = expected[(t.image_id, t.z, t.x, t.y)]
        assert t.s2_cell == e["s2_cell"]
        assert t.lat == e["lat"] and t.lon == e["lon"]
