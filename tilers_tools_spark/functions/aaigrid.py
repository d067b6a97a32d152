"""ESRI ASCII Grid (the GDAL AAIGrid driver's format) text raster codec.

Layout (Esri ArcInfo ASCII Grid, as GDAL reads/writes it): a short
whitespace-separated text header —

    ncols         <int>
    nrows         <int>
    xllcorner     <float>        (or xllcenter: shifted by cellsize/2)
    yllcorner     <float>        (or yllcenter)
    cellsize      <float>        (or GDAL's dx/dy pair for non-square)
    NODATA_value  <float>        (optional)

— followed by exactly nrows*ncols cell values, row-major with the TOP
row first (the lower-left anchor describes the grid extent, not the
first value read). Header keys are case-insensitive and may appear in
any order before the first bare-number line.

Engine contract: NODATA cells become NaN in the decoded float64 array
(the same auditable-NaN policy as the georef parsers); a dx/dy pair
with dx != dy fails loudly because the north-up render contract is
square-pixel (see functions/georef_parsers.py::parse_world_file). The
format carries no CRS — georef promotion to EPSG:3857 meters requires
a declaring sidecar .prj exactly like the world-file driver
(prj_is_web_mercator); grid-space consumers (gdaldem-family metrics,
raster stats) need no CRS.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals

_HEADER_KEYS = {
    "ncols",
    "nrows",
    "xllcorner",
    "xllcenter",
    "yllcorner",
    "yllcenter",
    "cellsize",
    "dx",
    "dy",
    "nodata_value",
}


def parse_aaigrid_header(data: bytes | str) -> tuple[dict, list]:
    """Parse just the header of an ESRI ASCII grid (cheap — no cell
    conversion): returns (meta dict as in parse_aaigrid, remaining value
    tokens). Raises on any structural header defect."""
    text = data.decode("ascii", errors="strict") if isinstance(data, bytes) else data
    tokens = text.split()
    hdr: dict[str, float] = {}
    i = 0
    # header: key/value token pairs until the first token that is not a
    # known key (GDAL stops the header scan the same way)
    while i + 1 < len(tokens) and tokens[i].lower() in _HEADER_KEYS:
        key = tokens[i].lower()
        try:
            hdr[key] = float(tokens[i + 1])
        except ValueError:
            raise ValueError(f"AAIGrid header {key}: bad value {tokens[i+1]!r}")
        i += 2
    for req in ("ncols", "nrows"):
        if req not in hdr:
            raise ValueError(f"AAIGrid header missing {req}")
    ncols, nrows = int(hdr["ncols"]), int(hdr["nrows"])
    if ncols < 1 or nrows < 1 or hdr["ncols"] != ncols or hdr["nrows"] != nrows:
        raise ValueError(f"AAIGrid bad dimensions ncols={hdr['ncols']} nrows={hdr['nrows']}")
    if "cellsize" in hdr:
        if "dx" in hdr or "dy" in hdr:
            raise ValueError("AAIGrid header has both cellsize and dx/dy")
        cs = hdr["cellsize"]
    elif "dx" in hdr and "dy" in hdr:
        if hdr["dx"] != hdr["dy"]:
            raise ValueError(
                f"AAIGrid anisotropic dx={hdr['dx']} dy={hdr['dy']} unsupported "
                "(square-pixel north-up contract)"
            )
        cs = hdr["dx"]
    else:
        raise ValueError("AAIGrid header missing cellsize (or dx/dy pair)")
    if not (cs > 0):
        raise ValueError(f"AAIGrid cellsize {cs} must be > 0")
    # anchor: corner or center spelling for each axis independently
    if "xllcorner" in hdr:
        xll = hdr["xllcorner"]
    elif "xllcenter" in hdr:
        xll = hdr["xllcenter"] - cs / 2.0
    else:
        raise ValueError("AAIGrid header missing xllcorner/xllcenter")
    if "yllcorner" in hdr:
        yll = hdr["yllcorner"]
    elif "yllcenter" in hdr:
        yll = hdr["yllcenter"] - cs / 2.0
    else:
        raise ValueError("AAIGrid header missing yllcorner/yllcenter")

    meta = {
        "ncols": ncols,
        "nrows": nrows,
        "xll": xll,
        "yll": yll,
        "cellsize": cs,
        "nodata": hdr.get("nodata_value"),
    }
    return meta, tokens[i:]


def parse_aaigrid(data: bytes | str) -> tuple[np.ndarray, dict]:
    """Decode an ESRI ASCII grid to (float64 array [nrows, ncols] with
    NaN at NODATA cells, meta dict). Meta keys: ncols, nrows, xll, yll
    (corner convention, floats), cellsize, nodata (float or None).
    Raises ValueError on missing keys, anisotropic dx/dy, a bad token,
    or a value-count mismatch — never mis-decodes silently."""
    meta, vals = parse_aaigrid_header(data)
    nrows, ncols = meta["nrows"], meta["ncols"]
    if len(vals) != nrows * ncols:
        raise ValueError(
            f"AAIGrid value count {len(vals)} != nrows*ncols {nrows * ncols}"
        )
    try:
        arr = np.array([float(v) for v in vals], dtype=np.float64).reshape(nrows, ncols)
    except ValueError as e:
        raise ValueError(f"AAIGrid bad cell value: {e}")
    nodata = meta["nodata"]
    if nodata is not None:
        arr[arr == nodata] = np.nan
    return arr, meta


def encode_aaigrid(
    arr: np.ndarray,
    xll: float = 0.0,
    yll: float = 0.0,
    cellsize: float = 1.0,
    nodata: float = -9999.0,
    centered: bool = False,
) -> bytes:
    """Write a 2-D array as an ESRI ASCII grid. NaN cells become the
    NODATA_value token; values render via repr() (shortest round-trip
    decimal) so decode(encode(a)) is bit-exact for float64 inputs.
    `centered=True` writes the xllcenter/yllcenter spelling."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError(f"AAIGrid needs a 2-D array, got shape {a.shape}")
    if np.isfinite(nodata) and np.any(a == nodata):
        raise ValueError(f"array contains the nodata sentinel {nodata} as a real value")
    anchor = ("xllcenter", "yllcenter") if centered else ("xllcorner", "yllcorner")
    ax = xll + cellsize / 2.0 if centered else xll
    ay = yll + cellsize / 2.0 if centered else yll
    lines = [
        f"ncols {a.shape[1]}",
        f"nrows {a.shape[0]}",
        f"{anchor[0]} {ax!r}",
        f"{anchor[1]} {ay!r}",
        f"cellsize {cellsize!r}",
        f"NODATA_value {nodata!r}",
    ]
    for row in a:
        lines.append(" ".join(repr(float(nodata)) if v != v else repr(float(v)) for v in row))
    return ("\n".join(lines) + "\n").encode("ascii")


def aaigrid_scan_udf():
    """pandas UDF factory: (asc_text, prj_text) -> per-grid scan struct
    {ncols, nrows, n_nodata, gsd, mx0, my1, zmin, zmax, zsum, grid_md5}.
    Arrow-batched, one parse per row. Parse failure -> all-null row
    (auditable, callers coalesce to sentinels for exact compares); a
    parseable grid whose .prj is missing/non-3857 keeps its grid-space
    stats but gets NaN georef fields — gdaldem-family metrics are
    CRS-free, the mercator render contract is not."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("ncols", LongType()),
            StructField("nrows", LongType()),
            StructField("n_nodata", LongType()),
            StructField("gsd", DoubleType()),
            StructField("mx0", DoubleType()),
            StructField("my1", DoubleType()),
            StructField("zmin", DoubleType()),
            StructField("zmax", DoubleType()),
            StructField("zsum", DoubleType()),
            StructField("grid_md5", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def udf(asc: pd.Series, prj: pd.Series) -> pd.DataFrame:
        rows = []
        for text, p in zip(asc, prj):
            try:
                arr, meta = parse_aaigrid(text)
            except Exception:
                rows.append((None,) * len(cols))
                continue
            nan = float("nan")
            try:
                g = aaigrid_georef(meta, p)
                gsd, mx0, my1 = g["gsd"], g["mx0"], g["my1"]
            except Exception:
                gsd = mx0 = my1 = nan
            n_nodata = int(np.isnan(arr).sum())
            all_nan = n_nodata == arr.size
            rows.append(
                (
                    meta["ncols"],
                    meta["nrows"],
                    n_nodata,
                    gsd,
                    mx0,
                    my1,
                    nan if all_nan else float(np.nanmin(arr)),
                    nan if all_nan else float(np.nanmax(arr)),
                    nan if all_nan else float(np.nansum(arr)),
                    hashlib.md5(arr.tobytes()).hexdigest(),
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return udf


def aaigrid_georef_udf():
    """pandas UDF factory for the map2gdal role: (asc_text, prj_text) ->
    {w, h, gsd, mx0, my0, mx1, my1} from the HEADER alone (no cell
    conversion). Parse failure or a missing/non-3857 .prj yields the
    auditable NaN georef (w/h stay real when the header parsed)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    schema = StructType(
        [
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("gsd", DoubleType()),
            StructField("mx0", DoubleType()),
            StructField("my0", DoubleType()),
            StructField("mx1", DoubleType()),
            StructField("my1", DoubleType()),
        ]
    )

    @F.pandas_udf(schema)
    def udf(asc: pd.Series, prj: pd.Series) -> pd.DataFrame:
        nan = float("nan")
        rows = []
        for text, p in zip(asc, prj):
            try:
                meta, _vals = parse_aaigrid_header(text)
            except Exception:
                rows.append((None, None, nan, nan, nan, nan, nan))
                continue
            try:
                g = aaigrid_georef(meta, p)
                geo = (g["gsd"], g["mx0"], g["my0"], g["mx1"], g["my1"])
            except Exception:
                geo = (nan,) * 5
            rows.append((meta["ncols"], meta["nrows"], *geo))
        return pd.DataFrame(rows, columns=["w", "h", "gsd", "mx0", "my0", "mx1", "my1"])

    return udf


def aaigrid_georef(meta: dict, prj: str | None = None, to_mercator: bool = True) -> dict:
    """Promote parsed AAIGrid meta to the engine's north-up georef dict
    (gsd/mx0/my0/mx1/my1 in EPSG:3857 meters). The format carries no
    CRS, so a declaring sidecar .prj is required — missing or non-3857
    raises (callers map that to the auditable NaN row), the identical
    policy to the world-file driver (functions/georef_parsers.py)."""
    if to_mercator:
        from .georef_parsers import prj_is_web_mercator

        if not prj_is_web_mercator(prj):
            raise ValueError(
                "AAIGrid without an EPSG:3857 .prj; reproject upstream (out of scope)"
            )
    cs = float(meta["cellsize"])
    mx0, my0 = float(meta["xll"]), float(meta["yll"])
    return {
        "gsd": cs,
        "mx0": mx0,
        "my0": my0,
        "mx1": mx0 + meta["ncols"] * cs,
        "my1": my0 + meta["nrows"] * cs,
    }
