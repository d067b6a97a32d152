"""Derived georeferencing — the engine's analog of map2gdal (SURVEY.md §1.5).

The binding input schema (BASELINE.json:15) carries no geo columns, so the
reference's georeferencing role (``map2gdal.py`` attaching GCPs/affines to a
bare image — reference checkout absent, SURVEY.md §0.1) is re-cast as a
deterministic derivation from ``phash``, spec'd in FIXTURES.md §2-3 so the
engine, the oracle, and the fixture generator agree exactly:

    lon_c = -180 + 360 * u01(splitmix64(phash ^ 1))
    lat_c =  -66 + 132 * u01(splitmix64(phash ^ 2))
    gsd   = 2 ** (4 + 6 * u01(splitmix64(phash ^ 3)))      # m/px in [16, 1024)
    HOT   : rows with phash % 5 == 0 cluster in a 2°x2° box at (139.7, 35.7)

World placement: north-up affine in EPSG:3857; top-left
``mx0 = mx_c - gsd*w/2``, ``my0 = my_c + gsd*h/2``; pixel (col,row) center maps
to ``(mx0 + gsd*(col+0.5), my0 - gsd*(row+0.5))``.

All uint64 math is NumPy (exact mod-2^64) and runs inside Arrow/pandas UDFs —
never in per-row Python (BASELINE.json:15).
"""

from __future__ import annotations

import numpy as np

from . import tilemath as tm

SEED = 42
TAG_LON, TAG_LAT, TAG_GSD, TAG_SIZE, TAG_PIX = 1, 2, 3, 4, 5
HOT_LON, HOT_LAT, HOT_HALF = 139.7, 35.7, 1.0  # 2°x2° urban box (FIXTURES.md §3)

_U64 = np.uint64


def splitmix64(x) -> np.ndarray:
    """Standard SplitMix64 finalizer, vectorized, exact mod 2^64 (FIXTURES.md §2)."""
    with np.errstate(over="ignore"):
        x = np.asarray(x).astype(np.uint64, copy=True)
        x += _U64(0x9E3779B97F4A7C15)
        x ^= x >> _U64(30)
        x *= _U64(0xBF58476D1CE4E5B9)
        x ^= x >> _U64(27)
        x *= _U64(0x94D049BB133111EB)
        x ^= x >> _U64(31)
    return x


def u01(x: np.ndarray) -> np.ndarray:
    """uint64 -> uniform double in [0, 1): top 53 bits / 2^53."""
    return (x >> _U64(11)).astype(np.float64) / float(1 << 53)


def derive_georef_np(phash, w, h):
    """phash,w,h arrays -> dict of float64 arrays: lon_c lat_c gsd mx0 my0 mx1 my1.

    (mx0,my1)..(mx1,my0) is the axis-aligned EPSG:3857 extent; my0 < my1
    (my0 = south edge), matching the half-open cover rule in
    ``tilemath.cover_range_np``.
    """
    ph = np.asarray(phash).astype(np.uint64)
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    lon_c = -180.0 + 360.0 * u01(splitmix64(ph ^ _U64(TAG_LON)))
    lat_c = -66.0 + 132.0 * u01(splitmix64(ph ^ _U64(TAG_LAT)))
    hot = (ph % _U64(5)) == _U64(0)
    if hot.any():
        # HOT rows re-draw inside the urban box (skew knob, FIXTURES.md §3)
        lon_c = np.where(hot, HOT_LON - HOT_HALF + 2.0 * HOT_HALF * u01(splitmix64(ph ^ _U64(TAG_LON))), lon_c)
        lat_c = np.where(hot, HOT_LAT - HOT_HALF + 2.0 * HOT_HALF * u01(splitmix64(ph ^ _U64(TAG_LAT))), lat_c)
    gsd = 2.0 ** (4.0 + 6.0 * u01(splitmix64(ph ^ _U64(TAG_GSD))))
    mx_c, my_c = tm.merc_np(lon_c, lat_c)
    mx0 = mx_c - gsd * w / 2.0
    my1 = my_c + gsd * h / 2.0  # north edge (top-left my)
    return {
        "lon_c": lon_c,
        "lat_c": lat_c,
        "gsd": gsd,
        "mx0": mx0,
        "my0": my1 - gsd * h,
        "mx1": mx0 + gsd * w,
        "my1": my1,
    }


def derive_size_np(phash):
    """w,h in {256,512,768,1024} from phash (FIXTURES.md §3)."""
    s = splitmix64(np.asarray(phash).astype(np.uint64) ^ _U64(TAG_SIZE))
    w = 256 * (1 + (s % _U64(4)).astype(np.int64))
    h = 256 * (1 + ((s >> _U64(8)) % _U64(4)).astype(np.int64))
    return w.astype(np.int32), h.astype(np.int32)
