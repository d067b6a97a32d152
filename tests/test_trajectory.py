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
