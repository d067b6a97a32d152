"""heatmap (operators/heatmap.py) vs NumPy/scalar references: per-pixel
density counts, tile-assignment consistency with tilemath, the exact
sum-preserving halving identity, ramp anchors, and the end-to-end
pyramid render decoded back to pixels."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.functions import tilemath as tm
from tilers_tools_spark.operators import heatmap as hm


def _pts(n, seed=3):
    rng = random.Random(seed)
    O = tm.ORIGIN
    return [(i, rng.uniform(-O, O), rng.uniform(-O * 0.99, O * 0.99))
            for i in range(n)]


def _gp_ref(m, z):
    res = tm.RES0 / (1 << z)
    n_px = 256 * (1 << z)
    return int(min(n_px - 1, max(0, math.floor((m + tm.ORIGIN) / res))))


def test_density_counts_vs_scalar_reference(spark):
    pts = _pts(500)
    df = spark.createDataFrame(pts, "id long, mx double, my double")
    out = hm.point_density(df, z=4).collect()
    ref = {}
    for _, mx, my in pts:
        k = (_gp_ref(mx, 4), _gp_ref(my, 4))
        ref[k] = ref.get(k, 0) + 1
    got = {(r["gpx"], r["gpy"]): r["w"] for r in out}
    assert got == {k: float(v) for k, v in ref.items()}
    assert all(r["z"] == 4 for r in out)


def test_tile_projection_matches_tilemath(spark):
    # a density pixel must live in EXACTLY the tile tile_xy_np assigns
    # the source point to (same clamp, same floor, same TMS row)
    pts = _pts(300, seed=9)
    df = spark.createDataFrame(pts, "id long, mx double, my double")
    t = hm.density_tiles(hm.point_density(df, z=5))
    rows = t.collect()
    mx = np.array([p[1] for p in pts]); my = np.array([p[2] for p in pts])
    tx, ty = tm.tile_xy_np(mx, my, 5)
    ref_tiles = set(zip(tx.tolist(), ty.tolist()))
    assert {(r["x"], r["y"]) for r in rows} == ref_tiles
    assert all(0 <= r["px"] < 256 and 0 <= r["py"] < 256 for r in rows)


def test_pyramid_halving_equals_direct_assignment(spark):
    # floor into the z-1 grid directly == halve the z grid index: exact
    # for binary doubles (res doubles exactly per level); also total
    # weight is preserved at every level
    pts = _pts(400, seed=11)
    df = spark.createDataFrame(pts, "id long, mx double, my double")
    base = hm.point_density(df, z=6)
    pyr = hm.density_pyramid(base, 6, 3)
    for z in (5, 4, 3):
        got = {(r["gpx"], r["gpy"]): r["w"]
               for r in pyr.filter(F.col("z") == z).collect()}
        ref = {}
        for _, mx, my in pts:
            k = (_gp_ref(mx, z), _gp_ref(my, z))
            ref[k] = ref.get(k, 0) + 1
        assert got == {k: float(v) for k, v in ref.items()}
    sums = pyr.groupBy("z").agg(F.sum("w").alias("s")).collect()
    assert {r["s"] for r in sums} == {float(len(pts))}


def test_ramp_anchors_and_scalar_reconstruction():
    # anchors pinned by hand
    assert hm.ramp_rgba_np(np.array([0.0])).tolist() == [[0, 0, 64, 64]]
    assert hm.ramp_rgba_np(np.array([0.5])).tolist() == [[0, 255, 255, 192]]
    assert hm.ramp_rgba_np(np.array([1.0])).tolist() == [[255, 0, 0, 255]]
    # plain-python piecewise-linear reconstruction (independent of np.interp)
    anchors = [(0.0, (0, 0, 64, 64)), (0.25, (0, 64, 255, 128)),
               (0.5, (0, 255, 255, 192)), (0.75, (255, 255, 0, 255)),
               (1.0, (255, 0, 0, 255))]
    rng = random.Random(5)
    ts = [rng.random() for _ in range(200)] + [0.25, 0.75, 1.0]
    for t in ts:
        for (t0, c0), (t1, c1) in zip(anchors, anchors[1:]):
            if t0 <= t <= t1:
                f = 0.0 if t1 == t0 else (t - t0) / (t1 - t0)
                ref = [math.floor(a + (b - a) * f + 0.5)
                       for a, b in zip(c0, c1)]
                break
        got = hm.ramp_rgba_np(np.array([t]))[0].tolist()
        assert got == ref, t


def test_render_and_end_to_end_pyramid(spark):
    pts = _pts(600, seed=21)
    df = spark.createDataFrame(pts, "id long, mx double, my double")
    tiles = hm.heatmap_pyramid(df, z_base=5, z_min=3).collect()
    assert {r["z"] for r in tiles} == {3, 4, 5}
    # pyramid-wide v_max: recompute the density independently and check
    # the hottest pixel decodes to the exact ramp value
    base = hm.point_density(df, z=5)
    pyr = hm.density_pyramid(base, 5, 3)
    v_max = pyr.select(F.max("w")).first()[0]
    # group density rows per tile for the reference canvas
    per_tile = {}
    for r in hm.density_tiles(pyr).collect():
        per_tile.setdefault((r["z"], r["x"], r["y"]), []).append(r)
    assert set(per_tile) == {(r["z"], r["x"], r["y"]) for r in tiles}
    for row in tiles:
        key = (row["z"], row["x"], row["y"])
        arr = codecs.decode_png(bytes(row["tile"]))
        assert arr.shape == (256, 256, 4)
        ref = np.zeros((256, 256, 4), np.uint8)
        for r in per_tile[key]:
            t = math.log1p(r["w"]) / math.log1p(v_max)
            ref[r["py"], r["px"]] = hm.ramp_rgba_np(np.array([t]))[0]
        assert np.array_equal(arr, ref)


def test_render_rejects_bad_vmax(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, mx double, my double")
    t = hm.density_tiles(hm.point_density(df, z=2))
    with pytest.raises(ValueError):
        hm.render_heatmap_tiles(t, v_max=0.0)
