"""WGS84 transverse Mercator (UTM) forward/inverse — pure NumPy.

Closes the engine's last reprojection gap: GDAL commonly emits UTM
GeoTIFFs (EPSG:326xx north / 327xx south), which the georef path used to
reject as "non-3857 CRS -> NaN row". `reproject_utm`
(operators/translate.py) uses these kernels to warp them onto the
EPSG:3857 render grid.

Algorithm: Krueger's n-series as given by Karney, "Transverse Mercator
with an accuracy of a few nanometers" (J. Geod. 85, 2011) — the same
6th-order alpha/beta coefficient set PROJ's `tmerc` (default approx
path) and GeographicLib document publicly. Accuracy within a UTM zone is
sub-micrometre, far below the operators' 1e-3 m quantization.

Determinism: everything is elementwise float64 (np.* transcendentals,
fixed 5-step Newton in the inverse — no data-dependent iteration
counts), so repeated runs on one platform are bit-identical. The golden
generator shares these kernels; independence is anchored by
tests/test_utm.py, which pins them against an INDEPENDENTLY CODED
classic series (Snyder, "Map Projections - A Working Manual", USGS PP
1395, eqs. 8-9..8-17 — a different published derivation) to < 1 mm,
plus closed-form anchors (central-meridian easting, quarter-meridian
northing) and forward-inverse roundtrips.
"""

from __future__ import annotations

import math

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)  # third flattening n
_E = math.sqrt(_F * (2.0 - _F))  # eccentricity e
# rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_RECT_A = _A / (1.0 + _N) * (1.0 + _N**2 / 4.0 + _N**4 / 64.0 + _N**6 / 256.0)

_K0 = 0.9996  # UTM scale on the central meridian
_FE = 500000.0  # false easting
_FN_SOUTH = 10000000.0  # false northing, southern hemisphere

# Karney (2011) eq. 35 — alpha_j to n^6 (forward series)
_ALPHA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 5.0 / 16.0 * _N**3 + 41.0 / 180.0 * _N**4
    - 127.0 / 288.0 * _N**5 + 7891.0 / 37800.0 * _N**6,
    13.0 / 48.0 * _N**2 - 3.0 / 5.0 * _N**3 + 557.0 / 1440.0 * _N**4
    + 281.0 / 630.0 * _N**5 - 1983433.0 / 1935360.0 * _N**6,
    61.0 / 240.0 * _N**3 - 103.0 / 140.0 * _N**4 + 15061.0 / 26880.0 * _N**5
    + 167603.0 / 181440.0 * _N**6,
    49561.0 / 161280.0 * _N**4 - 179.0 / 168.0 * _N**5
    + 6601661.0 / 7257600.0 * _N**6,
    34729.0 / 80640.0 * _N**5 - 3418889.0 / 1995840.0 * _N**6,
    212378941.0 / 319334400.0 * _N**6,
)

# Karney (2011) eq. 36 — beta_j to n^6 (inverse series)
_BETA = (
    _N / 2.0 - 2.0 / 3.0 * _N**2 + 37.0 / 96.0 * _N**3 - 1.0 / 360.0 * _N**4
    - 81.0 / 512.0 * _N**5 + 96199.0 / 604800.0 * _N**6,
    1.0 / 48.0 * _N**2 + 1.0 / 15.0 * _N**3 - 437.0 / 1440.0 * _N**4
    + 46.0 / 105.0 * _N**5 - 1118711.0 / 3870720.0 * _N**6,
    17.0 / 480.0 * _N**3 - 37.0 / 840.0 * _N**4 - 209.0 / 4480.0 * _N**5
    + 5569.0 / 90720.0 * _N**6,
    4397.0 / 161280.0 * _N**4 - 11.0 / 504.0 * _N**5
    - 830251.0 / 7257600.0 * _N**6,
    4583.0 / 161280.0 * _N**5 - 108847.0 / 3991680.0 * _N**6,
    20648693.0 / 638668800.0 * _N**6,
)


def utm_zone_params(epsg: int) -> tuple[float, float]:
    """(central meridian deg, false northing) for EPSG:326xx / 327xx."""
    if 32601 <= epsg <= 32660:
        zone, fn = epsg - 32600, 0.0
    elif 32701 <= epsg <= 32760:
        zone, fn = epsg - 32700, _FN_SOUTH
    else:
        raise ValueError(f"not a UTM EPSG code: {epsg}")
    return float(-183 + 6 * zone), fn


def tm_forward(lat_deg, lon_deg, lon0_deg: float):
    """(lat, lon) degrees -> UTM (easting, northing) metres, vectorized.

    Accepts broadcastable arrays (e.g. a column of latitudes against a
    row of longitudes) and returns float64 arrays of the broadcast
    shape. Northern-hemisphere false northing (0); callers add
    _FN_SOUTH for 327xx grids.
    """
    phi = np.deg2rad(np.asarray(lat_deg, np.float64))
    lam = np.deg2rad(np.asarray(lon_deg, np.float64) - lon0_deg)
    tau = np.tan(phi)
    # conformal latitude tan: tau' = tau*sqrt(1+sig^2) - sig*sqrt(1+tau^2)
    sig = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1.0 + tau * tau)))
    taup = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau)
    coslam = np.cos(lam)
    xip = np.arctan2(taup, coslam)
    etap = np.arcsinh(np.sin(lam) / np.hypot(taup, coslam))
    xi = xip.copy() + 0.0 * etap  # broadcast to full shape
    eta = etap + 0.0 * xip
    for j, a in enumerate(_ALPHA, start=1):
        xi = xi + a * np.sin(2.0 * j * xip) * np.cosh(2.0 * j * etap)
        eta = eta + a * np.cos(2.0 * j * xip) * np.sinh(2.0 * j * etap)
    east = _FE + _K0 * _RECT_A * eta
    north = _K0 * _RECT_A * xi
    return east, north


def tm_inverse(east, north, lon0_deg: float, false_northing: float = 0.0):
    """UTM (easting, northing) metres -> (lat, lon) degrees, vectorized.

    Fixed 5-iteration Newton solve for tau (converges to machine
    precision in <= 3; the fixed count keeps the op bit-reproducible)."""
    xi = (np.asarray(north, np.float64) - false_northing) / (_K0 * _RECT_A)
    eta = (np.asarray(east, np.float64) - _FE) / (_K0 * _RECT_A)
    xip = xi.copy() + 0.0 * eta
    etap = eta + 0.0 * xi
    for j, b in enumerate(_BETA, start=1):
        xip = xip - b * np.sin(2.0 * j * xi) * np.cosh(2.0 * j * eta)
        etap = etap - b * np.cos(2.0 * j * xi) * np.sinh(2.0 * j * eta)
    sinhe = np.sinh(etap)
    cosxi = np.cos(xip)
    taup = np.sin(xip) / np.hypot(sinhe, cosxi)
    lam = np.arctan2(sinhe, cosxi)
    e2 = _E * _E
    tau = taup / (1.0 - e2)  # first guess (Karney eq. 19ff)
    for _ in range(5):
        sig = np.sinh(_E * np.arctanh(_E * tau / np.sqrt(1.0 + tau * tau)))
        f_tau = tau * np.sqrt(1.0 + sig * sig) - sig * np.sqrt(1.0 + tau * tau) - taup
        dtau = (
            (np.sqrt(1.0 + sig * sig) * np.sqrt(1.0 + tau * tau) - sig * tau)
            * (1.0 - e2) * np.sqrt(1.0 + tau * tau)
            / (1.0 + (1.0 - e2) * tau * tau)
        )
        tau = tau - f_tau / dtau
    lat = np.rad2deg(np.arctan(tau))
    lon = np.rad2deg(lam) + lon0_deg
    return lat, lon
