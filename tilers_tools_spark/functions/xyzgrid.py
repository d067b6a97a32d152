"""Gridded-XYZ text raster codec (the GDAL XYZ driver's format) — the
INPUT direction of the gdal2xyz bridge (operators/zonal.py::raster_to_xyz
is the output direction).

Format: one cell per line, `x y z` (space/comma/semicolon/tab
separated, optional single header line of column names), where x/y are
CELL-CENTER coordinates on a regular axis-aligned grid. The GDAL driver
requires constant spacing per axis; missing cells become NaN here
(GDAL's behavior for sparse files), duplicate cells fail loudly. Row 0
of the decoded array is the NORTHERNMOST row (max y), matching every
other raster path in the engine. Square pixels (dx == dy) are required
by the north-up contract, like the AAIGrid driver; the corner-anchored
georef is x_min - dx/2 etc.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals

_SEP = re.compile(r"[,;\s]+")


def parse_xyz_grid(data: bytes | str, rel_tol: float = 1e-9) -> tuple[np.ndarray, dict]:
    """Decode gridded-XYZ text to (float64 [nrows, ncols] with NaN at
    absent cells, meta {ncols, nrows, xll, yll, cellsize}). Raises on
    irregular spacing (beyond rel_tol of the step), anisotropic dx/dy,
    duplicate cells, bad tokens, or a grid smaller than 2x2."""
    text = data.decode("ascii", errors="strict") if isinstance(data, bytes) else data
    lines = [ln for ln in text.splitlines() if ln.strip()]
    if not lines:
        raise ValueError("XYZ grid: empty input")
    start = 0
    first = _SEP.split(lines[0].strip())
    try:
        [float(t) for t in first[:3]]
    except ValueError:
        start = 1  # single header line of column names
    xs, ys, zs = [], [], []
    for ln in lines[start:]:
        toks = _SEP.split(ln.strip())
        if len(toks) < 3:
            raise ValueError(f"XYZ grid: line needs 3 columns: {ln!r}")
        try:
            xs.append(float(toks[0]))
            ys.append(float(toks[1]))
            zs.append(float(toks[2]))
        except ValueError:
            raise ValueError(f"XYZ grid: bad numeric token on line {ln!r}")
    x = np.asarray(xs)
    y = np.asarray(ys)
    z = np.asarray(zs)
    ux = np.unique(x)
    uy = np.unique(y)
    if ux.size < 2 or uy.size < 2:
        raise ValueError(f"XYZ grid needs >= 2 distinct coords per axis, got {ux.size}x{uy.size}")

    def step(u: np.ndarray, axis: str) -> float:
        d = np.diff(u)
        s = float(d.min())
        if s <= 0 or float(np.abs(d - s).max()) > rel_tol * s:
            raise ValueError(f"XYZ grid: irregular {axis} spacing (steps {d.min()}..{d.max()})")
        return s

    dx = step(ux, "x")
    dy = step(uy, "y")
    if abs(dx - dy) > rel_tol * dx:
        raise ValueError(f"XYZ grid anisotropic dx={dx} dy={dy} unsupported (square-pixel contract)")
    ncols, nrows = ux.size, uy.size
    ci = np.searchsorted(ux, x)
    # row 0 = max y (north-up)
    ri = (nrows - 1) - np.searchsorted(uy, y)
    keys = ri * np.int64(ncols) + ci
    if np.unique(keys).size != keys.size:
        raise ValueError("XYZ grid: duplicate cell")
    arr = np.full((nrows, ncols), np.nan)
    arr[ri, ci] = z
    # a NaN VALUE in the input is indistinguishable from an absent cell —
    # acceptable: both mean nodata under the engine contract
    return arr, {
        "ncols": ncols,
        "nrows": nrows,
        "xll": float(ux[0]) - dx / 2.0,
        "yll": float(uy[0]) - dx / 2.0,
        "cellsize": dx,
    }


def xyz_scan_udf():
    """pandas UDF factory: xyz_text -> per-grid scan struct {ncols,
    nrows, n_absent, xll, yll, cellsize, zmin, zmax, zsum, grid_md5}.
    Arrow-batched; parse failure -> all-null row (callers coalesce to
    sentinels). The format declares no CRS, so the anchor stays
    grid-space (xll/yll/cellsize verbatim) — promotion into the
    mercator contract needs a sidecar .prj exactly like AAIGrid."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("ncols", LongType()),
            StructField("nrows", LongType()),
            StructField("n_absent", LongType()),
            StructField("xll", DoubleType()),
            StructField("yll", DoubleType()),
            StructField("cellsize", DoubleType()),
            StructField("zmin", DoubleType()),
            StructField("zmax", DoubleType()),
            StructField("zsum", DoubleType()),
            StructField("grid_md5", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def udf(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for text in texts:
            try:
                arr, meta = parse_xyz_grid(text)
            except Exception:
                rows.append((None,) * len(cols))
                continue
            n_absent = int(np.isnan(arr).sum())
            all_nan = n_absent == arr.size
            nan = float("nan")
            rows.append(
                (
                    meta["ncols"],
                    meta["nrows"],
                    n_absent,
                    meta["xll"],
                    meta["yll"],
                    meta["cellsize"],
                    nan if all_nan else float(np.nanmin(arr)),
                    nan if all_nan else float(np.nanmax(arr)),
                    nan if all_nan else float(np.nansum(arr)),
                    hashlib.md5(arr.tobytes()).hexdigest(),
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return udf


def encode_xyz_grid(
    arr: np.ndarray,
    xll: float = 0.0,
    yll: float = 0.0,
    cellsize: float = 1.0,
    header: bool = False,
    skip_nan: bool = True,
) -> bytes:
    """Write a 2-D array (row 0 = north) as gridded-XYZ text, cell-center
    coords via repr() (exact roundtrip). NaN cells are skipped (sparse
    file, the gdal2xyz -skipnodata shape) unless skip_nan=False, which
    emits literal nan tokens."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim != 2:
        raise ValueError(f"XYZ grid needs a 2-D array, got shape {a.shape}")
    h, w = a.shape
    out = ["x y z"] if header else []
    for r in range(h):
        yc = yll + (h - 1 - r + 0.5) * cellsize
        for c in range(w):
            v = a[r, c]
            if v != v and skip_nan:
                continue
            out.append(f"{xll + (c + 0.5) * cellsize!r} {yc!r} {v!r}")
    return ("\n".join(out) + "\n").encode("ascii")
