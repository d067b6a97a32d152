"""Global-mercator tile math — the bit-for-tile contract (SURVEY.md §1.4).

Re-expresses the tile coordinate transforms of the reference's
``tiler_functions.py`` / ``gdal_tiler.py::Pyramid`` (meters <-> pixel <-> tile,
tile bounds, XYZ/TMS/ZYX y conventions, base-zoom selection) as BOTH:

* **NumPy twins** (``*_np``) — used by the single-process oracle
  (``oracle/minitiler.py``) and inside Arrow/pandas UDFs, and
* **Spark Column twins** — native Catalyst expressions (whole-stage codegen,
  no Python in the hot path).

The two flavors use the identical operation order on IEEE-754 doubles so they
agree bit-for-bit except at measure-zero tile boundaries (property-tested in
``tests/test_tilemath.py``).

Math is the published OSGeo/TMS + slippy-map scheme (SURVEY.md §1.4 [SPEC]):

    R        = 6378137.0
    ORIGIN   = pi * R = 20037508.342789244 m
    res(z)   = 2*ORIGIN / (256 * 2**z)
    mx       = lon * ORIGIN / 180
    my       = R * log(tan((90 + lat) * pi / 360))
    px, py   = (mx + ORIGIN)/res(z), (my + ORIGIN)/res(z)   # origin SW
    tx       = floor(px / 256)
    ty_tms   = floor(py / 256)                               # y grows north
    ty_xyz   = 2**z - 1 - ty_tms                             # y grows south

Reference parity note: ``/root/reference`` is empty this session
(SURVEY.md §0.1) — no file:line citations are possible; the contract is
BASELINE.json:6 ("bit-for-tile ... same z/x/y addressing and bounds math").
"""

from __future__ import annotations

import math

import numpy as np

try:  # Column twins are optional so the oracle can import this w/o Spark.
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    _HAVE_SPARK = True
except ImportError:  # pragma: no cover
    _HAVE_SPARK = False

R = 6378137.0
ORIGIN = math.pi * R  # 20037508.342789244
TILE = 256
RES0 = 2.0 * ORIGIN / TILE  # 156543.03392804097 m/px at z=0
MAX_LAT = math.degrees(math.atan(math.sinh(math.pi)))  # 85.05112877980659
Z_MAX = 30

# ---------------------------------------------------------------------------
# NumPy twins (float64 throughout; used by oracle + inside pandas UDFs)
# ---------------------------------------------------------------------------


def resolution_np(z):
    """Meters per pixel at zoom z."""
    return RES0 / (2.0 ** np.asarray(z, dtype=np.float64))


def merc_np(lon, lat):
    """lon/lat degrees (WGS84) -> EPSG:3857 meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    mx = lon * (ORIGIN / 180.0)
    my = np.log(np.tan((90.0 + lat) * (math.pi / 360.0))) * R
    return mx, my


def inv_merc_np(mx, my):
    """EPSG:3857 meters -> lon/lat degrees."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    lon = mx * (180.0 / ORIGIN)
    lat = np.degrees(2.0 * np.arctan(np.exp(my / R)) - math.pi / 2.0)
    return lon, lat


def tile_xy_np(mx, my, z):
    """Meters -> (tx, ty_tms) tile indices at zoom z, clamped to the grid."""
    res = resolution_np(z)
    tx = np.floor((np.asarray(mx, np.float64) + ORIGIN) / (res * TILE))
    ty = np.floor((np.asarray(my, np.float64) + ORIGIN) / (res * TILE))
    n = 2 ** np.asarray(z, dtype=np.int64)
    tx = np.clip(tx, 0, n - 1).astype(np.int64)
    ty = np.clip(ty, 0, n - 1).astype(np.int64)
    return tx, ty


def tms_to_xyz_np(ty, z):
    """TMS y (north-up) <-> XYZ/slippy y (south-down). Involution."""
    return (np.int64(1) << np.asarray(z, np.int64)) - 1 - np.asarray(ty, np.int64)


def tile_bounds_np(z, tx, ty_tms):
    """TMS tile -> (mx0, my0, mx1, my1) EPSG:3857 meter bounds (SW..NE)."""
    res = resolution_np(z)
    span = res * TILE
    mx0 = np.asarray(tx, np.float64) * span - ORIGIN
    my0 = np.asarray(ty_tms, np.float64) * span - ORIGIN
    return mx0, my0, mx0 + span, my0 + span


def cover_range_np(mx0, my0, mx1, my1, z):
    """Tiles intersecting the half-open box [mx0,mx1) x [my0,my1) at zoom z.

    Returns (txmin, txmax, tymin_tms, tymax_tms) inclusive, clamped. An
    extent edge exactly on a tile boundary does NOT pull in the empty
    neighbor tile (ceil(px1/TILE)-1 rule) — this is the rule both the engine
    explode and the oracle share (bit-for-tile, BASELINE.json:6).
    """
    res = resolution_np(z)
    span = res * TILE
    n = (np.int64(1) << np.asarray(z, np.int64)) - 1
    txmin = np.floor((np.asarray(mx0, np.float64) + ORIGIN) / span)
    tymin = np.floor((np.asarray(my0, np.float64) + ORIGIN) / span)
    txmax = np.ceil((np.asarray(mx1, np.float64) + ORIGIN) / span) - 1.0
    tymax = np.ceil((np.asarray(my1, np.float64) + ORIGIN) / span) - 1.0
    txmin = np.clip(txmin, 0, n).astype(np.int64)
    tymin = np.clip(tymin, 0, n).astype(np.int64)
    txmax = np.clip(np.maximum(txmax, txmin), 0, n).astype(np.int64)
    tymax = np.clip(np.maximum(tymax, tymin), 0, n).astype(np.int64)
    return txmin, txmax, tymin, tymax


def base_zoom_np(gsd):
    """Smallest z whose resolution is at least as fine as the source gsd:
    z = ceil(log2(RES0 / gsd)), clamped to [0, Z_MAX] (SURVEY.md §2.3 row 14).
    """
    z = np.ceil(np.log2(RES0 / np.asarray(gsd, dtype=np.float64)))
    return np.clip(z, 0, Z_MAX).astype(np.int64)


# ---------------------------------------------------------------------------
# global-geodetic (EPSG:4326 plate-carree) profile — the gdal2tiles
# `--profile geodetic` / OSGeo TMS "global-geodetic" grid: 256px tiles,
# 2^(z+1) columns x 2^z rows (two root tiles at z0), degree units.
# ---------------------------------------------------------------------------

RES0_GEO = 180.0 / TILE  # 0.703125 deg/px at z=0


def resolution_geo_np(z):
    """Degrees per pixel at geodetic zoom z."""
    return RES0_GEO / (2.0 ** np.asarray(z, dtype=np.float64))


def tile_xy_geo_np(lon, lat, z):
    """lon/lat degrees -> (tx, ty_tms) on the global-geodetic grid at z,
    clamped (x to 2^(z+1)-1, y to 2^z-1; ty counts up from the south)."""
    span = resolution_geo_np(z) * TILE  # 180 / 2^z degrees per tile
    tx = np.floor((np.asarray(lon, np.float64) + 180.0) / span)
    ty = np.floor((np.asarray(lat, np.float64) + 90.0) / span)
    n = np.int64(1) << np.asarray(z, dtype=np.int64)
    tx = np.clip(tx, 0, 2 * n - 1).astype(np.int64)
    ty = np.clip(ty, 0, n - 1).astype(np.int64)
    return tx, ty


def tile_bounds_geo_np(z, tx, ty_tms):
    """Geodetic TMS tile -> (lon0, lat0, lon1, lat1) degree bounds (SW..NE)."""
    span = resolution_geo_np(z) * TILE
    lon0 = np.asarray(tx, np.float64) * span - 180.0
    lat0 = np.asarray(ty_tms, np.float64) * span - 90.0
    return lon0, lat0, lon0 + span, lat0 + span


def cover_range_geo_np(lon0, lat0, lon1, lat1, z):
    """Geodetic tiles intersecting the half-open box [lon0,lon1) x
    [lat0,lat1) at z — the SAME edge rule as the mercator cover_range_np
    (an extent edge exactly on a tile boundary does not pull in the empty
    neighbor), with the rectangular 2^(z+1) x 2^z clamp."""
    span = resolution_geo_np(z) * TILE
    n = np.int64(1) << np.asarray(z, np.int64)
    txmin = np.floor((np.asarray(lon0, np.float64) + 180.0) / span)
    tymin = np.floor((np.asarray(lat0, np.float64) + 90.0) / span)
    txmax = np.ceil((np.asarray(lon1, np.float64) + 180.0) / span) - 1.0
    tymax = np.ceil((np.asarray(lat1, np.float64) + 90.0) / span) - 1.0
    txmin = np.clip(txmin, 0, 2 * n - 1).astype(np.int64)
    tymin = np.clip(tymin, 0, n - 1).astype(np.int64)
    txmax = np.clip(np.maximum(txmax, txmin), 0, 2 * n - 1).astype(np.int64)
    tymax = np.clip(np.maximum(tymax, tymin), 0, n - 1).astype(np.int64)
    return txmin, txmax, tymin, tymax


def base_zoom_geo_np(gsd):
    """Geodetic base zoom for an EPSG:3857 source gsd (meters/px): the
    ladder is chosen by the equivalent angular gsd at the equator,
    gsd_deg = gsd * 180/ORIGIN, then z = ceil(log2(RES0_GEO / gsd_deg))
    clamped to [0, Z_MAX]. Algebraically z_geo = ceil(log2(RES0/gsd)) - 1
    = mercator base zoom - 1 (the geodetic grid has twice the columns per
    zoom), but it is computed directly from the published definition."""
    gsd_deg = np.asarray(gsd, dtype=np.float64) * (180.0 / ORIGIN)
    z = np.ceil(np.log2(RES0_GEO / gsd_deg))
    return np.clip(z, 0, Z_MAX).astype(np.int64)


def pack_zxy_np(z, x, y):
    """Pack (z,x,y) into one int64 sort/join key: z<<58 | x<<29 | y.
    Valid for z<=29 (our Z_MAX cap for packed keys); monotone within a zoom.
    """
    z = np.asarray(z, np.int64)
    return (z << 58) | (np.asarray(x, np.int64) << 29) | np.asarray(y, np.int64)


# ---------------------------------------------------------------------------
# Spark Column twins — identical op order; pure Catalyst expressions
# ---------------------------------------------------------------------------

if _HAVE_SPARK:

    def _c(x):
        if isinstance(x, Column):
            return x
        if isinstance(x, str):  # pyspark convention: bare string = column name
            return F.col(x)
        return F.lit(x)

    def resolution(z) -> Column:
        return F.lit(RES0) / F.pow(F.lit(2.0), _c(z))

    def merc_x(lon) -> Column:
        return _c(lon) * F.lit(ORIGIN / 180.0)

    def merc_y(lat) -> Column:
        return F.log(F.tan((F.lit(90.0) + _c(lat)) * F.lit(math.pi / 360.0))) * F.lit(R)

    def inv_merc_lon(mx) -> Column:
        return _c(mx) * F.lit(180.0 / ORIGIN)

    def inv_merc_lat(my) -> Column:
        return F.degrees(F.lit(2.0) * F.atan(F.exp(_c(my) / F.lit(R))) - F.lit(math.pi / 2.0))

    def _clamped_floor_div(m, z, n_minus_1) -> Column:
        idx = F.floor((m + F.lit(ORIGIN)) / (resolution(z) * F.lit(float(TILE))))
        return F.greatest(F.lit(0), F.least(n_minus_1, idx)).cast("long")

    def n_tiles(z) -> Column:
        """2**z as a long column (z <= 30)."""
        return F.pow(F.lit(2.0), _c(z)).cast("long")

    def tile_x(mx, z) -> Column:
        return _clamped_floor_div(_c(mx), z, n_tiles(z) - F.lit(1))

    def tile_y_tms(my, z) -> Column:
        return _clamped_floor_div(_c(my), z, n_tiles(z) - F.lit(1))

    def tms_to_xyz(ty, z) -> Column:
        """y-flip; involution (SURVEY.md §2.4 row 21)."""
        return n_tiles(z) - F.lit(1) - _c(ty)

    def tile_bound(z, t) -> Column:
        """Lower meter bound of tile index t (either axis)."""
        return _c(t).cast("double") * resolution(z) * F.lit(float(TILE)) - F.lit(ORIGIN)

    def base_zoom(gsd) -> Column:
        z = F.ceil(F.log2(F.lit(RES0) / _c(gsd)))
        return F.greatest(F.lit(0), F.least(F.lit(Z_MAX), z)).cast("long")

    def cover_min(m, z) -> Column:
        span = resolution(z) * F.lit(float(TILE))
        return F.floor((_c(m) + F.lit(ORIGIN)) / span)

    def cover_max(m, z) -> Column:
        span = resolution(z) * F.lit(float(TILE))
        return F.ceil((_c(m) + F.lit(ORIGIN)) / span) - F.lit(1)

    def clamp_tile(t, z) -> Column:
        return F.greatest(F.lit(0), F.least(n_tiles(z) - F.lit(1), _c(t))).cast("long")

    def resolution_geo(z) -> Column:
        return F.lit(RES0_GEO) / F.pow(F.lit(2.0), _c(z))

    def tile_x_geo(lon, z) -> Column:
        """Geodetic column index (2^(z+1) columns), clamped."""
        span = resolution_geo(z) * F.lit(float(TILE))
        idx = F.floor((_c(lon) + F.lit(180.0)) / span)
        return F.greatest(
            F.lit(0), F.least(F.lit(2) * n_tiles(z) - F.lit(1), idx)
        ).cast("long")

    def tile_y_geo_tms(lat, z) -> Column:
        """Geodetic TMS row index (2^z rows, south-up), clamped."""
        span = resolution_geo(z) * F.lit(float(TILE))
        idx = F.floor((_c(lat) + F.lit(90.0)) / span)
        return F.greatest(F.lit(0), F.least(n_tiles(z) - F.lit(1), idx)).cast("long")

    def base_zoom_geo(gsd) -> Column:
        """Geodetic base zoom from an EPSG:3857 gsd (meters/px) — the
        Column twin of base_zoom_geo_np (same two-step formula)."""
        gsd_deg = _c(gsd) * F.lit(180.0 / ORIGIN)
        z = F.ceil(F.log2(F.lit(RES0_GEO) / gsd_deg))
        return F.greatest(F.lit(0), F.least(F.lit(Z_MAX), z)).cast("long")

    def pack_zxy(z, x, y) -> Column:
        return (
            F.shiftleft(_c(z).cast("long"), 58)
            .bitwiseOR(F.shiftleft(_c(x).cast("long"), 29))
            .bitwiseOR(_c(y).cast("long"))
        )
