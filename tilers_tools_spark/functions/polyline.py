"""Google Encoded Polyline Algorithm Format — as pure Column exprs.

The wire format every routing/track API speaks (published spec:
coordinates quantized to 1e-5 degrees, per-point deltas, zigzag-signed,
5-bit little-endian chunks with a 0x20 continuation bit, +63 into
printable ASCII). A trajectory/route table at scale serializes each
geometry row map-side with ZERO Python and zero shuffle: quantize +
delta via array HOFs, the varint chunk loop unrolled (7 chunks covers
|delta| < 2^34 — lat/lon deltas fit 26 bits) into when/chr concats.

Rounding contract: q = floor(v * 1e5 + 0.5) (round-half-UP — Spark and
DuckDB mirror it literally; canonical Google rounding is half-away-from-
zero, which differs only for coordinates landing EXACTLY on half of the
1e-5 grid — documented deviation, tie-free for real data). Decode twin
is scalar/NumPy (sequential varint parse — used by tests and readers,
not a hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CHUNKS = 7  # covers zigzagged values < 2^35


def _zigzag(v: Column) -> Column:
    return F.when(v < 0, -(v * 2) - 1).otherwise(v * 2)


def _enc_value(v: Column) -> Column:
    """Polyline varint of one signed quantized delta (bigint Column)."""
    u = _zigzag(v.cast("bigint"))
    parts = []
    for k in range(_CHUNKS):
        uk = F.shiftright(u, 5 * k)
        has_more = F.shiftright(u, 5 * (k + 1)) > 0
        included = (uk > 0) | F.lit(k == 0)
        ch = F.char(
            F.lit(63) + (uk % 32) + F.when(has_more, F.lit(32)).otherwise(F.lit(0))
        )
        parts.append(F.when(included, ch).otherwise(F.lit("")))
    return F.concat(*parts)


def quantize_1e5(arr: Column) -> Column:
    """array<double> degrees -> array<bigint> 1e-5 grid (round-half-up)."""
    return F.transform(arr, lambda v: F.floor(v * 100000.0 + 0.5).cast("bigint"))


def _deltas(q: Column) -> Column:
    """array<bigint> -> per-point deltas (first element absolute)."""
    prev = F.concat(F.array(F.lit(0).cast("bigint")), F.slice(q, 1, F.size(q) - 1))
    return F.zip_with(q, prev, lambda a, b: a - b)


def polyline_encode(lat_arr: Column, lon_arr: Column) -> Column:
    """Column: the encoded polyline string of parallel array<double>
    lat/lon columns (lat delta then lon delta per point, per spec)."""
    dlat = _deltas(quantize_1e5(lat_arr))
    dlon = _deltas(quantize_1e5(lon_arr))
    pair = F.zip_with(dlat, dlon, lambda a, b: F.concat(_enc_value(a), _enc_value(b)))
    return F.concat_ws("", pair)


# --- scalar twin + decoder (tests / readers) -------------------------------


def encode_scalar(points: list[tuple[float, float]]) -> str:
    """Independent-ish scalar twin (same documented contract) for tests;
    points are (lat, lon) tuples."""
    import math

    out = []
    plat = plon = 0
    for lat, lon in points:
        qla = math.floor(lat * 100000.0 + 0.5)
        qlo = math.floor(lon * 100000.0 + 0.5)
        for d in (qla - plat, qlo - plon):
            u = d * 2 if d >= 0 else (-d * 2) - 1
            while u >= 0x20:
                out.append(chr(63 + 0x20 + (u & 0x1F)))
                u >>= 5
            out.append(chr(63 + u))
        plat, plon = qla, qlo
    return "".join(out)


def decode_scalar(s: str) -> list[tuple[float, float]]:
    """Published decode loop: returns (lat, lon) floats on the 1e-5 grid."""
    vals = []
    u = shift = 0
    for ch in s:
        b = ord(ch) - 63
        u |= (b & 0x1F) << shift
        if b & 0x20:
            shift += 5
        else:
            vals.append((u >> 1) ^ -(u & 1))
            u = shift = 0
    pts = []
    lat = lon = 0
    for i in range(0, len(vals), 2):
        lat += vals[i]
        lon += vals[i + 1]
        pts.append((lat / 100000.0, lon / 100000.0))
    return pts


def enc_value_sql(expr: str) -> str:
    """DuckDB mirror of _enc_value over a BIGINT SQL expression (same
    7-chunk unroll, chr/CASE for when/char)."""
    u = f"(CASE WHEN ({expr}) < 0 THEN -(({expr}) * 2) - 1 ELSE ({expr}) * 2 END)"
    parts = []
    for k in range(_CHUNKS):
        uk = f"({u} >> {5 * k})"
        more = f"({u} >> {5 * (k + 1)}) > 0"
        inc = f"({uk} > 0 OR {k} = 0)"
        ch = f"chr(CAST(63 + ({uk} % 32) + (CASE WHEN {more} THEN 32 ELSE 0 END) AS INT))"
        parts.append(f"CASE WHEN {inc} THEN {ch} ELSE '' END")
    return " || ".join(parts)
