"""Geohash (Niemeyer 2008, public-domain scheme) as pure Column exprs.

Completes the engine's point-indexing family (H3 `h3lite.py`, S2
`s2lite.py`, Bing quadkey `operators/convert.py::quadkey`) with the
base32 scheme every geo datastore speaks (Elasticsearch, Redis, Lucene
spatial prefixes). Like quadkey it is a prefix-truncatable spatial key:
`substring(geohash, 1, k)` is the ancestor cell, so rollups and
prefix-range scans are plain string ops that push into parquet
row-group stats — no UDF anywhere, the whole encode/decode stays in
whole-stage codegen (a 100 TB assign is one narrow projection).

Closed form instead of the textbook bisection loop: with B = 5*p total
bits, longitude takes ceil(B/2) bits and latitude floor(B/2) (the
interleave starts with a longitude bit); then

    lon_int = clamp(floor((lon + 180) / 360 * 2^lonbits), 0, 2^lonbits-1)
    lat_int = clamp(floor((lat +  90) / 180 * 2^latbits), 0, 2^latbits-1)

and global bit k (0-based, MSB-first) is lon bit (lonbits-1-k/2) for
even k, lat bit (latbits-1-(k-1)/2) for odd k; character j encodes bits
5j..5j+4 through the base32 alphabet. Equivalence with bisection: after
n halvings of an exact-power-of-two interval the midpoints are exact
doubles, so the bit sequence equals the binary expansion of the
quantized integer. (The closed form's single rounded division can, for
inputs within ~1 ULP of a cell edge, differ from bisection — the
engine's contract IS the closed form, mirrored term-for-term by the
DuckDB oracle; tests pin random-point agreement with an independent
scalar bisection implementation plus the published 'ezs42' KAT.)

Reference parity note: tilers-tools itself has no geohash surface; this
is part of the task brief's spatial-index family (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _splits(precision: int) -> tuple[int, int]:
    b = 5 * precision
    return (b + 1) // 2, b // 2  # lonbits, latbits


def _quantize(col: Column, offset: float, span: float, bits: int) -> Column:
    # (v + offset)/span * 2^bits, truncating cast == floor (value >= 0);
    # 2^bits is an exact double so the scaling is a single rounding step,
    # reproducible term-for-term in any IEEE engine (the DuckDB oracle).
    scaled = (col + F.lit(offset)) / F.lit(span) * F.lit(float(1 << bits))
    q = scaled.cast("bigint")
    return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))


def geohash_col(lat: Column, lon: Column, precision: int) -> Column:
    """Column: geohash string of (lat, lon) at fixed `precision` chars."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in 1..12, got {precision}")
    lonbits, latbits = _splits(precision)
    lon_i = _quantize(lon, 180.0, 360.0, lonbits)
    lat_i = _quantize(lat, 90.0, 180.0, latbits)

    def gbit(k: int) -> Column:
        if k % 2 == 0:
            return F.shiftright(lon_i, lonbits - 1 - k // 2) % 2
        return F.shiftright(lat_i, latbits - 1 - (k - 1) // 2) % 2

    chars = F.array(*[F.lit(c) for c in ALPHABET])
    out = []
    for j in range(precision):
        d: Column = F.lit(0)
        for b in range(5):
            d = d * 2 + gbit(5 * j + b)
        out.append(F.element_at(chars, (d + 1).cast("int")))
    return F.concat(*out)


def geohash(df: DataFrame, precision: int, lat_col: str = "lat",
            lon_col: str = "lon", out_col: str = "geohash") -> DataFrame:
    return df.withColumn(out_col, geohash_col(F.col(lat_col), F.col(lon_col), precision))


def from_geohash(df: DataFrame, precision: int, gh_col: str = "geohash") -> DataFrame:
    """Decode a fixed-precision geohash column: adds the interleave-split
    integer coordinates (`lon_int`, `lat_int` — exactly the quantized
    values `geohash_col` produced, so decode∘encode == quantize) and the
    cell-center degrees (`lon_c`, `lat_c`). Pure Column bit math; char
    values come from a literal map (no UDF)."""
    lonbits, latbits = _splits(precision)
    val = F.create_map(*[F.lit(v) for c, i in zip(ALPHABET, range(32)) for v in (c, i)])
    digs = [
        F.element_at(val, F.substring(F.col(gh_col), j + 1, 1)).cast("bigint")
        for j in range(precision)
    ]
    lon_i: Column = F.lit(0).cast("bigint")
    lat_i: Column = F.lit(0).cast("bigint")
    for k in range(5 * precision):
        j, b = divmod(k, 5)
        bit = F.shiftright(digs[j], 4 - b) % 2
        if k % 2 == 0:
            lon_i = lon_i * 2 + bit
        else:
            lat_i = lat_i * 2 + bit
    lon_c = (lon_i.cast("double") + F.lit(0.5)) * F.lit(360.0 / (1 << lonbits)) - F.lit(180.0)
    lat_c = (lat_i.cast("double") + F.lit(0.5)) * F.lit(180.0 / (1 << latbits)) - F.lit(90.0)
    return (
        df.withColumn("lon_int", lon_i)
        .withColumn("lat_int", lat_i)
        .withColumn("lon_c", lon_c)
        .withColumn("lat_c", lat_c)
    )


# NumPy twin (same closed form) for oracle/test use ------------------------


def geohash_np(lat, lon, precision: int):
    """Vectorized NumPy twin of geohash_col (value-identical; tested)."""
    import numpy as np

    lonbits, latbits = _splits(precision)
    lon_i = np.clip(((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
                     * float(1 << lonbits)).astype(np.int64), 0, (1 << lonbits) - 1)
    lat_i = np.clip(((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0
                     * float(1 << latbits)).astype(np.int64), 0, (1 << latbits) - 1)
    n = lon_i.shape[0]
    out = np.empty(n, dtype=object)
    for r in range(n):
        chars = []
        for j in range(precision):
            d = 0
            for b in range(5):
                k = 5 * j + b
                if k % 2 == 0:
                    bit = (int(lon_i[r]) >> (lonbits - 1 - k // 2)) & 1
                else:
                    bit = (int(lat_i[r]) >> (latbits - 1 - (k - 1) // 2)) & 1
                d = d * 2 + bit
            chars.append(ALPHABET[d])
        out[r] = "".join(chars)
    return out
