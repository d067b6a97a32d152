"""tiles_covering_polygon / tiles_in_polygon (operators/convert.py) vs an
independent scalar crossing-number brute force, plus a hand-enumerated
z=1 case and the planner-filter consistency contract."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tilers_tools_spark.functions import tilemath as tm  # noqa: E402
from tilers_tools_spark.operators import convert  # noqa: E402

RING = [
    (-60.0005, -40.0005),
    (20.0005, -40.0005),
    (20.0005, 30.0005),
    (-20.0005, 30.0005),
    (-20.0005, -10.0005),
    (-60.0005, -10.0005),
]


def _center_lonlat(z, x, y):
    span = 2.0 * tm.ORIGIN / (2.0**z)
    mx = (x + 0.5) * span - tm.ORIGIN
    my = (y + 0.5) * span - tm.ORIGIN
    lon = mx / tm.ORIGIN * 180.0
    lat = math.degrees(2.0 * math.atan(math.exp(my / 6378137.0)) - math.pi / 2.0)
    return lon, lat


def _pip(lon, lat, ring):
    """textbook even-odd ray cast, written independently of the operator
    (accumulates a parity bool, iterates j=i-1 pairs)."""
    inside = False
    j = len(ring) - 1
    for i in range(len(ring)):
        xi, yi = ring[i]
        xj, yj = ring[j]
        if (yi > lat) != (yj > lat):
            if lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
                inside = not inside
        j = i
    return inside


def _brute(ring, z):
    out = set()
    n = 2**z
    for x in range(n):
        for y in range(n):
            lon, lat = _center_lonlat(z, x, y)
            if _pip(lon, lat, ring):
                out.add((z, x, y))
    return out


def test_planner_matches_scalar_brute_force(spark):
    got = {(r["z"], r["x"], r["y"]) for r in convert.tiles_covering_polygon(spark, RING, 6).collect()}
    assert got == _brute(RING, 6)
    assert len(got) > 10  # the L actually covers a two-arm region


def test_hand_enumerated_z1(spark):
    ring = [(0.001, -80.0005), (179.999, -80.0005), (179.999, 80.0005), (0.001, 80.0005)]
    got = {(r["z"], r["x"], r["y"]) for r in convert.tiles_covering_polygon(spark, ring, 1).collect()}
    assert got == {(1, 1, 0), (1, 1, 1)}


def test_filter_variant_consistent_with_planner(spark):
    """tiles_in_polygon over a table containing the full z=6 grid must
    select exactly the planner's key set (and no UDF/exchange appears)."""
    n = 2**6
    full = spark.range(n * n).selectExpr(
        "CAST(6 AS BIGINT) AS z", f"id % {n} AS x", f"id DIV {n} AS y", "CAST(NULL AS BINARY) AS tile"
    )
    got = {(r["z"], r["x"], r["y"]) for r in convert.tiles_in_polygon(full, 6, RING).select("z", "x", "y").collect()}
    want = {(r["z"], r["x"], r["y"]) for r in convert.tiles_covering_polygon(spark, RING, 6).collect()}
    assert got == want
    plan = convert.tiles_in_polygon(full, 6, RING)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_nonconvex_notch_is_excluded(spark):
    """centers in the L's notch (lon in (-60, -20), lat in (-10, 30)) are
    out, while both arms are populated."""
    rows = convert.tiles_covering_polygon(spark, RING, 6).collect()
    arm_tall = arm_flat = 0
    for r in rows:
        lon, lat = _center_lonlat(6, r["x"], r["y"])
        assert not (-60.0005 < lon < -20.0005 and -10.0005 < lat < 30.0005), (lon, lat)
        if lon > -20.0005 and lat > -10.0005:
            arm_tall += 1
        if lon < -20.0005 and lat < -10.0005:
            arm_flat += 1
    assert arm_tall > 0 and arm_flat > 0
