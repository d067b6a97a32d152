"""ENVI raw-binary raster codec (the GDAL ENVI driver's format) — the
remote-sensing staple: a text ``.hdr`` sidecar describing a headerless
binary cube.

Header (published ENVI header format): ``ENVI`` magic line, then
``key = value`` lines (case-insensitive keys, values possibly {}-braced
multi-line lists). Required: samples, lines, bands, data type,
interleave, byte order. Supported here:

* data type — 1 (uint8), 2 (int16), 3 (int32), 4 (float32),
  5 (float64), 12 (uint16), 13 (uint32); complex types fail loudly.
* interleave — bsq (band-sequential), bil (band-interleaved-by-line),
  bip (band-interleaved-by-pixel).
* byte order — 0 little-endian, 1 big-endian.
* header offset — leading bytes to skip (default 0).
* data ignore value — becomes NaN (float read path), the engine's
  auditable-nodata convention.
* map info — ``{projection, ref_px, ref_py, ref_mx, ref_my, dx, dy,
  ...}``: converted to the engine's corner-anchored georef. The 1-based
  pixel convention references the CENTER of the upper-left pixel region
  per the published spec variant GDAL writes (x pixel 1.0 == corner);
  we take ref at pixel (px, py) as the CORNER convention GDAL uses
  (pixel 1.0 -> mx0 exactly). Only square pixels enter the georef.

The decode returns float64 [lines, samples] for 1 band or
[lines, samples, bands] otherwise — band-major storage is normalized,
so downstream consumers never see the interleave.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd  # module-level: pandas_udf type-hint resolution needs it in globals

_DTYPES = {
    1: "u1", 2: "i2", 3: "i4", 4: "f4", 5: "f8", 12: "u2", 13: "u4",
}


def parse_envi_header(text: bytes | str) -> dict:
    """Parse an ENVI .hdr into a normalized dict. Raises on a missing
    magic line, missing required keys, or unsupported values."""
    t = text.decode("ascii", errors="strict") if isinstance(text, bytes) else text
    lines = t.splitlines()
    if not lines or lines[0].strip().upper() != "ENVI":
        raise ValueError("not an ENVI header (magic 'ENVI' line missing)")
    # join {...} continuation blocks, then parse key = value
    joined: list[str] = []
    buf = ""
    for ln in lines[1:]:
        buf = (buf + " " + ln.strip()).strip() if buf else ln.strip()
        if buf.count("{") > buf.count("}"):
            continue
        if buf:
            joined.append(buf)
        buf = ""
    if buf:
        raise ValueError("ENVI header: unterminated { block")
    kv: dict[str, str] = {}
    for ln in joined:
        if "=" not in ln:
            continue
        k, v = ln.split("=", 1)
        kv[re.sub(r"\s+", " ", k.strip().lower())] = v.strip()

    def need_int(key: str) -> int:
        if key not in kv:
            raise ValueError(f"ENVI header missing {key!r}")
        return int(kv[key])

    dt = need_int("data type")
    if dt not in _DTYPES:
        raise ValueError(f"ENVI data type {dt} unsupported ({sorted(_DTYPES)} only)")
    il = kv.get("interleave", "").lower()
    if il not in ("bsq", "bil", "bip"):
        raise ValueError(f"ENVI interleave {il!r} unsupported (bsq|bil|bip)")
    bo = int(kv.get("byte order", "0"))
    if bo not in (0, 1):
        raise ValueError(f"ENVI byte order {bo} invalid")
    meta = {
        "samples": need_int("samples"),
        "lines": need_int("lines"),
        "bands": need_int("bands"),
        "dtype": ("<" if bo == 0 else ">") + _DTYPES[dt],
        "interleave": il,
        "header_offset": int(kv.get("header offset", "0")),
        "ignore": float(kv["data ignore value"]) if "data ignore value" in kv else None,
        "map_info": None,
    }
    if meta["samples"] < 1 or meta["lines"] < 1 or meta["bands"] < 1:
        raise ValueError("ENVI dims must be >= 1")
    if "map info" in kv:
        body = kv["map info"].strip()
        if not (body.startswith("{") and body.endswith("}")):
            raise ValueError("ENVI map info must be {}-braced")
        parts = [p.strip() for p in body[1:-1].split(",")]
        if len(parts) < 7:
            raise ValueError("ENVI map info needs >= 7 fields")
        proj = parts[0]
        px, py, mx, my, dx, dy = (float(p) for p in parts[1:7])
        if dx != dy:
            raise ValueError(f"ENVI anisotropic pixels dx={dx} dy={dy} unsupported")
        # ref pixel (1-based, corner convention): corner of pixel (1,1) is
        # (mx - (px-1)*dx, my + (py-1)*dy)
        meta["map_info"] = {
            "projection": proj,
            "gsd": dx,
            "mx0": mx - (px - 1.0) * dx,
            "my1": my + (py - 1.0) * dy,
        }
    return meta


def decode_envi(hdr: bytes | str, raw: bytes) -> tuple[np.ndarray, dict]:
    """Decode the raw cube per its header: float64 [lines, samples]
    (1 band) or [lines, samples, bands], ignore-value -> NaN. Raises on
    a byte-count mismatch — never mis-shapes silently."""
    meta = parse_envi_header(hdr)
    s, l_, b = meta["samples"], meta["lines"], meta["bands"]
    dt = np.dtype(meta["dtype"])
    off = meta["header_offset"]
    need = off + s * l_ * b * dt.itemsize
    if len(raw) < need:
        raise ValueError(f"ENVI raw too short: {len(raw)} bytes < {need}")
    flat = np.frombuffer(raw, dtype=dt, count=s * l_ * b, offset=off)
    if meta["interleave"] == "bsq":
        cube = flat.reshape(b, l_, s).transpose(1, 2, 0)
    elif meta["interleave"] == "bil":
        cube = flat.reshape(l_, b, s).transpose(0, 2, 1)
    else:  # bip
        cube = flat.reshape(l_, s, b)
    out = cube.astype(np.float64)
    if meta["ignore"] is not None:
        out[out == meta["ignore"]] = np.nan
    if b == 1:
        out = out[:, :, 0]
    return out, meta


def envi_scan_udf():
    """pandas UDF factory: (hdr_text, raw_bytes) -> per-cube scan struct
    {samples, lines, bands, n_nodata, gsd, mx0, my1, zmin, zmax, zsum,
    cube_md5}. Arrow-batched; failure -> all-null row (callers coalesce
    to sentinels). The map-info anchor is reported verbatim (the header
    declares no EPSG here) — promotion into the mercator contract is a
    separate, gated step like the other sidecar drivers."""
    import hashlib

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("samples", LongType()),
            StructField("lines", LongType()),
            StructField("bands", LongType()),
            StructField("n_nodata", LongType()),
            StructField("gsd", DoubleType()),
            StructField("mx0", DoubleType()),
            StructField("my1", DoubleType()),
            StructField("zmin", DoubleType()),
            StructField("zmax", DoubleType()),
            StructField("zsum", DoubleType()),
            StructField("cube_md5", StringType()),
        ]
    )
    cols = [f.name for f in schema.fields]

    @F.pandas_udf(schema)
    def udf(hdrs: pd.Series, raws: pd.Series) -> pd.DataFrame:
        rows = []
        for hdr, raw in zip(hdrs, raws):
            try:
                arr, meta = decode_envi(str(hdr), bytes(raw))
            except Exception:
                rows.append((None,) * len(cols))
                continue
            nan = float("nan")
            mi = meta["map_info"] or {}
            n_nodata = int(np.isnan(arr).sum())
            all_nan = n_nodata == arr.size
            rows.append(
                (
                    meta["samples"],
                    meta["lines"],
                    meta["bands"],
                    n_nodata,
                    mi.get("gsd", nan),
                    mi.get("mx0", nan),
                    mi.get("my1", nan),
                    nan if all_nan else float(np.nanmin(arr)),
                    nan if all_nan else float(np.nanmax(arr)),
                    nan if all_nan else float(np.nansum(arr)),
                    hashlib.md5(arr.tobytes()).hexdigest(),
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return udf


def encode_envi(
    arr: np.ndarray,
    interleave: str = "bsq",
    dtype: str = "<f4",
    ignore: float | None = None,
    map_info: dict | None = None,
    byte_order: int | None = None,
) -> tuple[bytes, bytes]:
    """(hdr_bytes, raw_bytes) for a [lines, samples] or
    [lines, samples, bands] array — the test/interop twin of
    decode_envi. NaN requires an explicit ignore value."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError(f"ENVI needs 2-D or 3-D, got {a.shape}")
    l_, s, b = a.shape
    dt = np.dtype(dtype)
    if ignore is not None and float(np.array([ignore]).astype(dt).astype(np.float64)[0]) != float(ignore):
        raise ValueError(f"ignore value {ignore} not representable in {dtype}")
    if np.isnan(a).any():
        if ignore is None:
            raise ValueError("NaN cells need an explicit ignore value")
        a = np.where(np.isnan(a), float(ignore), a)
    rev_dt = {v: k for k, v in _DTYPES.items()}
    code = rev_dt.get(dt.str[1:] if dt.str[0] in "<>|=" else dt.str)
    if code is None:
        raise ValueError(f"dtype {dtype} not an ENVI data type")
    bo = byte_order if byte_order is not None else (1 if dt.str[0] == ">" else 0)
    il = interleave.lower()
    if il not in ("bsq", "bil", "bip"):
        raise ValueError(f"bad interleave {interleave!r}")
    cube = a.astype(dt)
    if il == "bsq":
        raw = np.ascontiguousarray(cube.transpose(2, 0, 1)).tobytes()
    elif il == "bil":
        raw = np.ascontiguousarray(cube.transpose(0, 2, 1)).tobytes()
    else:
        raw = np.ascontiguousarray(cube).tobytes()
    hdr = [
        "ENVI",
        f"samples = {s}",
        f"lines = {l_}",
        f"bands = {b}",
        "header offset = 0",
        f"data type = {code}",
        f"interleave = {il}",
        f"byte order = {bo}",
    ]
    if ignore is not None:
        hdr.append(f"data ignore value = {float(ignore)!r}")
    if map_info is not None:
        hdr.append(
            "map info = {%s, 1.0, 1.0, %r, %r, %r, %r}"
            % (
                map_info.get("projection", "Arbitrary"),
                float(map_info["mx0"]),
                float(map_info["my1"]),
                float(map_info["gsd"]),
                float(map_info["gsd"]),
            )
        )
    return ("\n".join(hdr) + "\n").encode("ascii"), raw
