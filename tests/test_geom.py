"""Ring metrics (functions/geom.py) vs scalar shoelace/centroid on hand
shapes and randoms."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tilers_tools_spark.functions import geom


def scalar_metrics(pts):
    n = len(pts)
    a2 = sx = sy = per = 0.0
    for i in range(n):
        x0, y0 = pts[i]
        x1, y1 = pts[(i + 1) % n]
        c = x0 * y1 - x1 * y0
        a2 += c
        sx += (x0 + x1) * c
        sy += (y0 + y1) * c
        per += math.hypot(x1 - x0, y1 - y0)
    a = a2 / 2.0
    if abs(a2) > 1e-12:
        return a, per, sx / (3.0 * a2), sy / (3.0 * a2)
    return a, per, None, None


def test_hand_shapes(spark):
    rows = [
        # CCW unit square: area +1, perimeter 4, centroid (.5, .5)
        {"i": 0, "xs": [0.0, 1.0, 1.0, 0.0], "ys": [0.0, 0.0, 1.0, 1.0]},
        # CW -> negative area
        {"i": 1, "xs": [0.0, 0.0, 1.0, 1.0], "ys": [0.0, 1.0, 1.0, 0.0]},
        # 3-4-5 triangle
        {"i": 2, "xs": [0.0, 3.0, 0.0], "ys": [0.0, 0.0, 4.0]},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["i"]: r for r in geom.ring_metrics(df).collect()}
    assert got[0]["signed_area"] == 1.0 and got[0]["perimeter"] == 4.0
    assert (got[0]["cx"], got[0]["cy"]) == (0.5, 0.5)
    assert got[1]["signed_area"] == -1.0
    assert got[2]["signed_area"] == 6.0 and got[2]["perimeter"] == 12.0
    assert abs(got[2]["cx"] - 1.0) < 1e-12 and abs(got[2]["cy"] - 4.0 / 3.0) < 1e-12
    assert (got[2]["xmin"], got[2]["xmax"], got[2]["ymin"], got[2]["ymax"]) == (0.0, 3.0, 0.0, 4.0)


def test_random_vs_scalar(spark):
    rng = np.random.default_rng(12)
    rows = []
    for i in range(30):
        n = int(rng.integers(3, 15))
        rows.append(
            {"i": i, "xs": rng.uniform(-100, 100, n).tolist(), "ys": rng.uniform(-100, 100, n).tolist()}
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["i"]: r for r in geom.ring_metrics(df).collect()}
    for row in rows:
        a, per, cx, cy = scalar_metrics(list(zip(row["xs"], row["ys"])))
        g = got[row["i"]]
        assert abs(g["signed_area"] - a) < 1e-9 * max(1.0, abs(a))
        assert abs(g["perimeter"] - per) < 1e-9 * per
        if cx is not None:
            assert abs(g["cx"] - cx) < 1e-9 * max(1.0, abs(cx))
            assert abs(g["cy"] - cy) < 1e-9 * max(1.0, abs(cy))
