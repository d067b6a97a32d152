"""Independence anchors for the shared Krueger-series UTM kernels.

The engine AND the warp_utm golden generator share
functions/utm.py (the same by-construction-bit-identity pattern as the
quantized Lanczos taps — see README independence caveat). These tests
pin that shared code against material computed WITHOUT it:

* closed-form anchors (central-meridian easting = false easting exactly;
  quarter-meridian northing vs the published WGS84 value),
* an INDEPENDENTLY CODED classic series — Snyder, "Map Projections — A
  Working Manual" (USGS PP 1395), eqs. 8-9..8-17, transcribed below from
  the published formulas, a different derivation than Karney's
  alpha/beta coefficients — agreeing to < 1 mm inside a UTM zone,
* forward/inverse roundtrip at float64 precision.
"""

import math

import numpy as np
import pytest

from tilers_tools_spark.functions import utm


def snyder_utm_forward(lat_deg: float, lon_deg: float, lon0_deg: float):
    """Snyder PP 1395 eqs. 8-9..8-15 (scalar, independent transcription).

    Stated accuracy: centimetres within |lon - lon0| <= 3 deg.
    """
    a = 6378137.0
    f = 1.0 / 298.257223563
    k0 = 0.9996
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    phi = math.radians(lat_deg)
    dlam = math.radians(lon_deg - lon0_deg)
    sinp, cosp, tanp = math.sin(phi), math.cos(phi), math.tan(phi)
    nu = a / math.sqrt(1.0 - e2 * sinp * sinp)  # eq. 4-20
    T = tanp * tanp
    C = ep2 * cosp * cosp
    A = dlam * cosp
    # eq. 3-21: meridian arc
    M = a * (
        (1.0 - e2 / 4.0 - 3.0 * e2**2 / 64.0 - 5.0 * e2**3 / 256.0) * phi
        - (3.0 * e2 / 8.0 + 3.0 * e2**2 / 32.0 + 45.0 * e2**3 / 1024.0) * math.sin(2.0 * phi)
        + (15.0 * e2**2 / 256.0 + 45.0 * e2**3 / 1024.0) * math.sin(4.0 * phi)
        - (35.0 * e2**3 / 3072.0) * math.sin(6.0 * phi)
    )
    x = k0 * nu * (
        A
        + (1.0 - T + C) * A**3 / 6.0
        + (5.0 - 18.0 * T + T * T + 72.0 * C - 58.0 * ep2) * A**5 / 120.0
    )
    y = k0 * (
        M
        + nu * tanp * (
            A * A / 2.0
            + (5.0 - T + 9.0 * C + 4.0 * C * C) * A**4 / 24.0
            + (61.0 - 58.0 * T + T * T + 600.0 * C - 330.0 * ep2) * A**6 / 720.0
        )
    )
    return 500000.0 + x, y


def test_central_meridian_anchors():
    e, n = utm.tm_forward(0.0, 9.0, 9.0)
    assert float(e) == 500000.0 and float(n) == 0.0
    # quarter meridian (published WGS84 value 10 001 965.7293 m) * k0
    e, n = utm.tm_forward(90.0, 9.0, 9.0)
    assert float(e) == 500000.0
    assert abs(float(n) - 0.9996 * 10001965.7293) < 1e-3
    # meridian arc scales by k0 exactly on lam=0: lat 45 deg vs Snyder arc
    _, n45 = utm.tm_forward(45.0, 9.0, 9.0)
    _, ns = snyder_utm_forward(45.0, 9.0, 9.0)
    assert abs(float(n45) - ns) < 1e-3


def test_agrees_with_independent_snyder_series():
    # grid over a zone 32-shaped window (lon0=9): |dlon| <= 2.5 deg
    worst = 0.0
    for lat in (-67.3, -33.0, -4.2, 0.0, 12.8, 37.5, 58.1, 71.2):
        for dlon in (-2.5, -1.3, -0.01, 0.0, 0.7, 1.9, 2.5):
            ek, nk = utm.tm_forward(lat, 9.0 + dlon, 9.0)
            es, ns = snyder_utm_forward(lat, 9.0 + dlon, 9.0)
            worst = max(worst, abs(float(ek) - es), abs(float(nk) - ns))
    assert worst < 1e-3, f"Krueger vs Snyder disagree by {worst} m"


def test_forward_inverse_roundtrip():
    lat = np.array([[-71.0], [-12.5], [0.0], [44.4], [83.9]])
    lon = np.array([[6.2, 8.0, 9.0, 10.5, 11.9]])
    E, N = utm.tm_forward(lat, lon, 9.0)
    la, lo = utm.tm_inverse(E, N, 9.0)
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(lo - lon).max() < 1e-11
    # southern false northing path
    lon0, fn = utm.utm_zone_params(32733)  # zone 33S
    assert lon0 == 15.0 and fn == 10000000.0
    E, N = utm.tm_forward(-33.9, 18.4 - 3.0 + 0.0, 15.0)
    la2, lo2 = utm.tm_inverse(E, np.asarray(N) + fn, 15.0, false_northing=fn)
    assert abs(float(la2) - (-33.9)) < 1e-11


def test_zone_params_validation():
    assert utm.utm_zone_params(32601) == (-177.0, 0.0)
    assert utm.utm_zone_params(32660) == (177.0, 0.0)
    with pytest.raises(ValueError):
        utm.utm_zone_params(4326)
    with pytest.raises(ValueError):
        utm.utm_zone_params(32661)


def test_vectorized_matches_scalar_calls():
    # broadcasting must not change bits vs one-point calls
    lat = np.array([[37.5], [58.1]])
    lon = np.array([[8.0, 10.5]])
    E, N = utm.tm_forward(lat, lon, 9.0)
    for i, la in enumerate((37.5, 58.1)):
        for j, lo in enumerate((8.0, 10.5)):
            e1, n1 = utm.tm_forward(la, lo, 9.0)
            assert float(e1) == E[i, j] and float(n1) == N[i, j]


def test_reproject_utm_spark_and_crs_gate(spark):
    """Engine path: NaN holes survive as sentinel counts; a 4326 GeoTIFF
    is rejected loudly (fail-loud CRS gate, same policy as
    reproject_4326); bilinear vs vectorized local replay is
    bit-identical (md5 of the quantized grid)."""
    import hashlib

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import translate as tr
    from tilers_tools_spark.operators.zonal import GRID_SENT

    h, w = 20, 26
    a = (np.arange(h * w, dtype=np.float32).reshape(h, w) % 83) * 2.5
    a[3:5, 4:9] = np.nan
    geo = {"gsd": 30.0, "mx0": 431000.0, "my1": 6655000.0, "epsg": 32632}
    blob = tiffcodec.encode_tiff(a, geo=geo)
    df = spark.createDataFrame([("t", bytearray(blob))], "image_id string, bytes binary")
    row = tr.reproject_utm(df, resample="bilinear").collect()[0]
    # local replay with the same shared kernels
    g = tr.utm_dest_grid(h, w, geo["mx0"], geo["my1"], geo["gsd"], geo["epsg"])
    out = tr._sample_grid(a.astype(np.float64), g["sx"], g["sy"], "bilinear")
    bad = ~np.isfinite(out)
    q = np.where(bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / 1e-3)).astype(np.int64)
    assert row.out_w == g["out_w"] and row.out_h == g["out_h"]
    assert row.n_nan == int(bad.sum()) > 0
    assert row.grid_md5 == hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest()

    wrong = tiffcodec.encode_tiff(a, geo={"gsd": 0.01, "mx0": 9.0, "my1": 60.0, "epsg": 4326})
    df2 = spark.createDataFrame([("x", bytearray(wrong))], "image_id string, bytes binary")
    with pytest.raises(Exception, match="not a UTM CRS"):
        tr.reproject_utm(df2).collect()
