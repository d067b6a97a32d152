"""SRTM .hgt (the GDAL SRTMHGT driver's format) raw DEM tile codec.

Layout (NASA SRTM / published SRTMHGT spec): a headerless square grid of
BIG-ENDIAN signed 16-bit elevations in meters, row-major starting at the
tile's NORTH-WEST corner and walking south; the void marker is -32768.
Published tile sizes: 1201x1201 (SRTM3, 3 arc-second) and 3601x3601
(SRTM1, 1 arc-second); rows/columns include BOTH edges, so adjacent
tiles share their border samples and the step is 1/(n-1) degrees.

All georeferencing lives in the FILE NAME: `N34W119.hgt` is the 1x1
degree cell whose SOUTH-WEST corner is (34N, 119W). CRS is always
EPSG:4326 — promotion into the engine's EPSG:3857 north-up contract
goes through the existing 4326 reprojection path (operators/translate.py
reproject_4326), never by reinterpreting degrees as meters.

Engine contract: voids become NaN in the decoded float64 array (the
auditable-NaN policy shared with the AAIGrid/GeoTIFF paths); a byte
count that is not a published tile size fails loudly (opt-out
`any_square=True` exists for synthetic test grids and is never set on
the ingest path's defaults).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals

VOID = -32768
_SIZES = (1201, 3601)

_NAME_RE = re.compile(r"^([NS])(\d{1,2})([EW])(\d{1,3})(?:\.hgt(?:\.zip)?)?$", re.IGNORECASE)


def parse_hgt_name(name: str) -> tuple[int, int]:
    """(lat0, lon0) of the tile's SW corner from an SRTM file name
    (basename or bare stem, case-insensitive, optional .hgt/.hgt.zip).
    Raises ValueError on anything else or out-of-range coordinates."""
    m = _NAME_RE.match(name.rsplit("/", 1)[-1])
    if not m:
        raise ValueError(f"not an SRTM tile name: {name!r} (want e.g. N34W119.hgt)")
    ns, lat, ew, lon = m.groups()
    lat0 = int(lat) * (1 if ns.upper() == "N" else -1)
    lon0 = int(lon) * (1 if ew.upper() == "E" else -1)
    if not (-90 <= lat0 <= 89) or not (-180 <= lon0 <= 179):
        raise ValueError(f"SRTM tile corner out of range: lat={lat0} lon={lon0}")
    return lat0, lon0


def decode_hgt(data: bytes, any_square: bool = False) -> np.ndarray:
    """Decode raw .hgt bytes to a float64 [n, n] array (row 0 = north
    edge) with NaN at void (-32768) samples. Size must be a published
    SRTM grid (1201 or 3601) unless `any_square=True` admits any n >= 2
    perfect square (synthetic fixtures only)."""
    if len(data) % 2:
        raise ValueError(f"hgt byte count {len(data)} is odd (int16 samples)")
    count = len(data) // 2
    n = math.isqrt(count)
    if n * n != count or n < 2:
        raise ValueError(f"hgt sample count {count} is not a square grid")
    if not any_square and n not in _SIZES:
        raise ValueError(
            f"hgt grid {n}x{n} is not a published SRTM size {_SIZES} "
            "(pass any_square=True for synthetic grids)"
        )
    arr = np.frombuffer(data, dtype=">i2").astype(np.float64).reshape(n, n)
    arr[arr == VOID] = np.nan
    return arr


def encode_hgt(arr: np.ndarray) -> bytes:
    """Write a square grid as raw big-endian int16 .hgt bytes; NaN cells
    become the void marker. Values must fit int16 (void excluded)."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] != a.shape[1] or a.shape[0] < 2:
        raise ValueError(f"hgt needs a square 2-D grid, got shape {a.shape}")
    finite = a[~np.isnan(a)]
    if finite.size and (finite.min() < -32767 or finite.max() > 32767):
        raise ValueError("hgt elevations must fit int16 (void -32768 reserved)")
    if np.any(finite != np.round(finite)):
        raise ValueError("hgt elevations must be integral meters")
    out = np.where(np.isnan(a), float(VOID), a).astype(">i2")
    return out.tobytes()


def hgt_georef(name: str, n: int) -> dict:
    """EPSG:4326 georef of a parsed tile: SW corner, 1/(n-1) degree step
    (edge-inclusive grid), 1x1 degree extent."""
    lat0, lon0 = parse_hgt_name(name)
    return {
        "lat0": float(lat0),
        "lon0": float(lon0),
        "lat1": float(lat0 + 1),
        "lon1": float(lon0 + 1),
        "step_deg": 1.0 / (n - 1),
        "n": n,
    }


def hgt_scan_udf(any_square: bool = False):
    """pandas UDF factory: (file_name, hgt_bytes) -> per-tile scan struct
    {n, n_void, lat0, lon0, step_deg, zmin, zmax, zsum, grid_md5}.
    Arrow-batched. A bad name or byte count yields the all-null row
    (callers coalesce to sentinels for exact compares)."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("n_void", LongType()),
            StructField("lat0", DoubleType()),
            StructField("lon0", DoubleType()),
            StructField("step_deg", DoubleType()),
            StructField("zmin", DoubleType()),
            StructField("zmax", DoubleType()),
            StructField("zsum", DoubleType()),
            StructField("grid_md5", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def udf(names: pd.Series, blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for name, blob in zip(names, blobs):
            try:
                arr = decode_hgt(bytes(blob), any_square=any_square)
                g = hgt_georef(str(name), arr.shape[0])
            except Exception:
                rows.append((None,) * len(cols))
                continue
            n_void = int(np.isnan(arr).sum())
            all_void = n_void == arr.size
            nan = float("nan")
            rows.append(
                (
                    arr.shape[0],
                    n_void,
                    g["lat0"],
                    g["lon0"],
                    g["step_deg"],
                    nan if all_void else float(np.nanmin(arr)),
                    nan if all_void else float(np.nanmax(arr)),
                    nan if all_void else float(np.nansum(arr)),
                    hashlib.md5(arr.tobytes()).hexdigest(),
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return udf
