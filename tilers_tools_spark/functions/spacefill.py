"""Space-filling-curve keys over tile coordinates — Morton (Z-order) and
Hilbert — as pure Column bit math (no UDF, whole-stage codegen).

Why they exist in a tiling engine: a 100 TB tile/point table wants a
SINGLE sort/bucket key whose ranges are spatially compact, so viewport
and polygon queries touch few files (Iceberg/Parquet range pruning works
on one column). Morton is the quadkey's packed-integer twin (cheap,
good-enough locality, trivially invertible); Hilbert has strictly better
locality (consecutive keys are always grid neighbors — no Z jumps) and
is what S2 uses internally. ``bucket = shiftright(key, 2*(z-k))`` gives
the ancestor cell at zoom k for either curve's aperture-4 hierarchy
(Morton ancestors are aligned quads; Hilbert buckets are contiguous key
ranges).

Hilbert transcription: the published iterative xy2d algorithm (rotation
about the FULL grid n-1 each level, d += s^2 * ((3*rx) XOR ry)) unrolled
per fixed zoom into chained column rebinds — the DuckDB oracle mirrors
it level-for-level as chained CTEs, all-integer so bit-exact
cross-engine. Spec pinning: the defining adjacency property (consecutive
d are 4-neighbors over the whole grid) + bijectivity + the inverse d2xy
roundtrip, tested exhaustively at small orders.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, z: int) -> Column:
    """Packed Z-order key (x bits even, y bits odd — the numeric form of
    the base-4 quadkey over the same axes the caller passes; use XYZ y
    for quadkey parity). Fits a bigint for z <= 31."""
    xc, yc = x.cast("bigint"), y.cast("bigint")
    out: Column = F.lit(0).cast("bigint")
    for k in range(z):
        out = (
            out
            + F.shiftleft(F.shiftright(xc, k) % 2, 2 * k)
            + F.shiftleft(F.shiftright(yc, k) % 2, 2 * k + 1)
        )
    return out


def hilbert_key(df: DataFrame, z: int, x_col: str = "x", y_col: str = "y",
                out_col: str = "hilbert") -> DataFrame:
    """Add the Hilbert curve index of (x, y) on the 2^z x 2^z grid.
    Unrolls the published xy2d loop into z chained selects (each level
    rebinds the working coordinates — all integer Column ops)."""
    n = 1 << z
    d = df.select("*", F.col(x_col).cast("bigint").alias("_hx"),
                  F.col(y_col).cast("bigint").alias("_hy"),
                  F.lit(0).cast("bigint").alias("_hd"))
    for i in reversed(range(z)):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i) % 2
        ry = F.shiftright(F.col("_hy"), i) % 2
        nd = F.col("_hd") + F.lit(s * s).cast("bigint") * (F.lit(3) * rx).bitwiseXOR(ry)
        nx = F.when(ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - F.col("_hy")).otherwise(F.col("_hy"))
                    ).otherwise(F.col("_hx"))
        ny = F.when(ry == 0,
                    F.when(rx == 1, F.lit(n - 1) - F.col("_hx")).otherwise(F.col("_hx"))
                    ).otherwise(F.col("_hy"))
        d = d.select(*[c for c in d.columns if c not in ("_hx", "_hy", "_hd")],
                     nx.alias("_hx"), ny.alias("_hy"), nd.alias("_hd"))
    return d.select(*[c for c in d.columns if c not in ("_hx", "_hy", "_hd")],
                    F.col("_hd").alias(out_col))


# --- NumPy / scalar twins (tests + oracle building) ------------------------


def morton_np(x, y, z: int):
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    out = np.zeros_like(x)
    for k in range(z):
        out += ((x >> k) & 1) << (2 * k)
        out += ((y >> k) & 1) << (2 * k + 1)
    return out


def hilbert_np(x, y, z: int):
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    n = 1 << z
    d = np.zeros_like(x)
    for i in reversed(range(z)):
        s = 1 << i
        rx = (x >> i) & 1
        ry = (y >> i) & 1
        d += (s * s) * ((3 * rx) ^ ry)
        flip = (ry == 0) & (rx == 1)
        x2 = np.where(flip, n - 1 - y, np.where(ry == 0, y, x))
        y2 = np.where(flip, n - 1 - x, np.where(ry == 0, x, y))
        x, y = x2, y2
    return d


def hilbert_d2xy_scalar(d: int, z: int) -> tuple[int, int]:
    """Published inverse (d2xy) — scalar, used only by tests to pin the
    forward transcription by roundtrip."""
    n = 1 << z
    t = d
    x = y = 0
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def morton_sql_expr(x: str, y: str, z: int) -> str:
    """DuckDB mirror of morton_key (same unrolled arithmetic)."""
    terms = [
        f"((({x} >> {k}) & 1) << {2 * k}) + ((({y} >> {k}) & 1) << {2 * k + 1})"
        for k in range(z)
    ]
    return " + ".join(terms)


def hilbert_sql_ctes(src: str, z: int, keep: str, x: str = "x", y: str = "y",
                     prefix: str = "h") -> str:
    """DuckDB mirror of hilbert_key: chained CTEs `h0..h{z}` rebinding
    (hx, hy, hd) level-for-level; final CTE `h{z}` exposes `keep` columns
    + hd. Embed via `WITH ..., {this}` then select from h{z}. `prefix`
    renames the chain (g0..g{z}, ...) so one query can carry chains at
    several zooms without CTE-name collisions."""
    n = 1 << z
    parts = [f"{prefix}0 AS (SELECT {keep}, CAST({x} AS BIGINT) AS hx, "
             f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"]
    lvl = 0
    for i in reversed(range(z)):
        s = 1 << i
        rx, ry = f"((hx >> {i}) & 1)", f"((hy >> {i}) & 1)"
        parts.append(
            f"{prefix}{lvl + 1} AS (SELECT {keep}, "
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 THEN {n - 1} - hy ELSE hy END "
            f"ELSE hx END AS hx, "
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 THEN {n - 1} - hx ELSE hx END "
            f"ELSE hy END AS hy, "
            f"hd + {s * s} * xor(3 * {rx}, {ry}) AS hd FROM {prefix}{lvl})"
        )
        lvl += 1
    return ",\n".join(parts)
