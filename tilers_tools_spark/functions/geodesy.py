"""Great-circle geodesy as pure Column exprs (haversine distance,
initial bearing) — the lon/lat-space companion to the engine's
mercator-meter tile math (mercator distances are latitude-distorted;
trajectory/track analytics need true meters).

Haversine (published formula): a = sin^2(dphi/2) + cos(phi1) * cos(phi2)
* sin^2(dlmb/2); d = 2 R asin(min(1, sqrt(a))) with the documented mean
Earth radius R = 6371000.0 m (spherical model — |error| < 0.56% vs the
ellipsoid, the standard contract for this formula). Op order is fixed so
any IEEE engine reproduces it to <= a few ULP; gates quantize to mm so a
1-ULP libm difference cannot flip a comparison.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_R_M = 6371000.0


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters between two lon/lat degree pairs."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = F.radians(lat2 - lat1) / F.lit(2.0)
    dl = F.radians(lon2 - lon1) / F.lit(2.0)
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    # NULL-propagating clamp: F.least SKIPS nulls (least(1.0, NULL) = 1.0
    # in Spark AND DuckDB), which would turn a null input into pi*R; the
    # when() form keeps null -> null (a null condition takes otherwise())
    r = F.sqrt(a)
    return F.lit(2.0 * EARTH_R_M) * F.asin(F.when(r > 1.0, F.lit(1.0)).otherwise(r))


def bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing in degrees [0, 360)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    return F.pmod(F.degrees(F.atan2(y, x)), F.lit(360.0))


def haversine_np(lat1, lon1, lat2, lon2):
    """NumPy twin (same op order)."""
    import numpy as np

    p1 = np.radians(np.asarray(lat1, dtype=np.float64))
    p2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dp = np.radians(np.asarray(lat2, dtype=np.float64) - lat1) / 2.0
    dl = np.radians(np.asarray(lon2, dtype=np.float64) - lon1) / 2.0
    a = np.sin(dp) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl) ** 2
    return 2.0 * EARTH_R_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


def haversine_scalar(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2.0
    dl = math.radians(lon2 - lon1) / 2.0
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2.0 * EARTH_R_M * math.asin(min(1.0, math.sqrt(a)))
