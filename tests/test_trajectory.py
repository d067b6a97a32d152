"""Geodesy (haversine KATs) + sessionization hand cases."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import geodesy
from tilers_tools_spark.operators import trajectory


def test_haversine_kats():
    # antipodal: half the great circle
    import math

    assert abs(geodesy.haversine_scalar(0, 0, 0, 180) - math.pi * geodesy.EARTH_R_M) < 1e-6
    # one degree of longitude at the equator = R * pi/180
    assert abs(geodesy.haversine_scalar(0, 0, 0, 1) - geodesy.EARTH_R_M * math.pi / 180) < 1e-6
    # symmetric + zero
    assert geodesy.haversine_scalar(10, 20, 10, 20) == 0.0
    d1 = geodesy.haversine_scalar(51.5, -0.12, 48.85, 2.35)  # London-Paris
    assert 330_000 < d1 < 350_000
    assert abs(geodesy.haversine_scalar(48.85, 2.35, 51.5, -0.12) - d1) < 1e-9
    # NumPy twin agrees
    assert abs(geodesy.haversine_np([51.5], [-0.12], [48.85], [2.35])[0] - d1) < 1e-9


def test_sessionize_hand(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: events at 0s, 100s, 2000s (gap>600 -> new session), 2100s
        (1, 1, t0),
        (2, 1, t0 + dt.timedelta(seconds=100)),
        (3, 1, t0 + dt.timedelta(seconds=2000)),
        (4, 1, t0 + dt.timedelta(seconds=2100)),
        # user 2: single event
        (5, 2, t0),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    got = {
        r["event_id"]: r["session_idx"]
        for r in trajectory.sessionize(df, gap_s=600.0).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_trip_stats_hand(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, t0, 0.0, 0.0),
        (2, 1, t0 + dt.timedelta(seconds=10), 0.0, 1.0),  # 1 deg lon at equator
        (3, 1, t0 + dt.timedelta(seconds=5000), 5.0, 5.0),  # new session
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lat double, lon double"
    )
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in trajectory.trip_stats(df, gap_s=600.0).collect()
    }
    import math

    s0 = got[(1, 0)]
    assert s0["n_events"] == 2 and s0["dur_us"] == 10_000_000
    assert abs(s0["dist_m"] - geodesy.EARTH_R_M * math.pi / 180) < 1e-6
    s1 = got[(1, 1)]
    assert s1["n_events"] == 1 and s1["dur_us"] == 0 and s1["dist_m"] == 0.0


def _sp_ref(rows, cell, dwell_us, min_pings):
    """Scalar gaps-and-islands reference; rows = (event_id, user, us, x, y)."""
    import math as m

    by_user = {}
    for eid, u, us, x, y in rows:
        by_user.setdefault(u, []).append((us, eid, m.floor(x / cell), m.floor(y / cell)))
    out = {}
    for u, pings in by_user.items():
        pings.sort()
        islands = []
        for us, eid, cx, cy in pings:
            if islands and islands[-1][0] == (cx, cy):
                islands[-1][1].append(us)
            else:
                islands.append([(cx, cy), [us]])
        idx = 0
        for (cx, cy), uss in islands:
            if uss[-1] - uss[0] >= dwell_us and len(uss) >= min_pings:
                out[(u, idx)] = (cx, cy, uss[0], uss[-1], uss[-1] - uss[0], len(uss))
                idx += 1
    return out


def _sp_run(spark, rows, cell, min_dwell_s, min_pings):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (eid, u, t0 + dt.timedelta(microseconds=us), x, y)
        for eid, u, us, x, y in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp_ntz, x long, y long")
    off = int((t0 - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    got = {}
    for r in trajectory.stay_points(
            df, cell=cell, min_dwell_s=min_dwell_s, min_pings=min_pings).collect():
        got[(r["user_id"], r["stay_idx"])] = (
            r["cx"], r["cy"], r["enter_us"] - off, r["exit_us"] - off,
            r["dwell_us"], r["n_pings"])
    return got


def test_stay_points_hand(spark):
    # user 1: 3 pings in cell (0,0) over 120s (stay), 1 ping far away,
    # 2 pings back in (0,0) but only 5s apart (dwell < 60s -> dropped)
    rows = [
        (1, 1, 0, 10, 10),
        (2, 1, 60_000_000, 90, 20),
        (3, 1, 120_000_000, 5, 95),
        (4, 1, 180_000_000, 500, 500),
        (5, 1, 240_000_000, 20, 30),
        (6, 1, 245_000_000, 40, 40),
    ]
    got = _sp_run(spark, rows, cell=100, min_dwell_s=60.0, min_pings=2)
    assert got == {(1, 0): (0, 0, 0, 120_000_000, 120_000_000, 3)}


def test_stay_points_vs_scalar_reference_random(spark):
    import random as rnd

    rng = rnd.Random(83)
    rows = [
        (i, rng.randrange(4), i * 1_000_000 + rng.randrange(1000),
         rng.randrange(-50, 350), rng.randrange(-50, 350))
        for i in range(300)
    ]
    for cell, dwell_s, mp in ((100, 2.0, 2), (200, 0.0, 1), (64, 5.0, 3)):
        got = _sp_run(spark, rows, cell, dwell_s, mp)
        ref = _sp_ref([(e, u, us, x, y) for e, u, us, x, y in rows],
                      cell, int(dwell_s * 1e6), mp)
        assert got == ref, (cell, dwell_s, mp)


def test_stay_points_tie_break_and_negative_coords(spark):
    # two pings with IDENTICAL ts order by event_id; negative coords
    # floor toward -inf (cell -1), not toward zero
    rows = [(2, 1, 0, -5, -5), (1, 1, 0, -7, -3), (3, 1, 10_000_000, -9, -1)]
    got = _sp_run(spark, rows, cell=100, min_dwell_s=0.0, min_pings=3)
    assert got == {(1, 0): (-1, -1, 0, 10_000_000, 10_000_000, 3)}


def test_stay_points_validation(spark):
    import pytest as pt

    with pt.raises(ValueError):
        trajectory.stay_points(None, cell=0, min_dwell_s=1.0)
    with pt.raises(ValueError):
        trajectory.stay_points(None, cell=10, min_dwell_s=1.0, min_pings=0)
    with pt.raises(ValueError):
        trajectory.stay_points(None, cell=10, min_dwell_s=-1.0)


def test_od_matrix_hand(spark):
    # user 1 stays: cell A(0,0) -> B(1,0) -> A(0,0); user 2: C -> C
    # (self-loop kept). Travel = enter(next) - exit(prev).
    rows = [
        (1, 0, 0, 0, 100, 200), (1, 1, 1, 0, 500, 900), (1, 2, 0, 0, 1000, 1100),
        (2, 0, 5, 5, 0, 10), (2, 1, 5, 5, 50, 60),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, stay_idx long, cx long, cy long, enter_us long, exit_us long")
    got = {
        (r["from_cx"], r["from_cy"], r["to_cx"], r["to_cy"]):
            (r["n_trips"], r["sum_travel_us"])
        for r in trajectory.od_matrix(df).collect()
    }
    assert got == {
        (0, 0, 1, 0): (1, 300),
        (1, 0, 0, 0): (1, 100),
        (5, 5, 5, 5): (1, 40),
    }


def test_od_matrix_aggregates_across_users(spark):
    # the same cell pair travelled by two users aggregates into one row
    rows = [
        (1, 0, 0, 0, 0, 10), (1, 1, 9, 9, 20, 30),
        (2, 0, 0, 0, 0, 5), (2, 1, 9, 9, 105, 110),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, stay_idx long, cx long, cy long, enter_us long, exit_us long")
    got = trajectory.od_matrix(df).collect()
    assert len(got) == 1
    assert (got[0]["n_trips"], got[0]["sum_travel_us"]) == (2, 10 + 100)
