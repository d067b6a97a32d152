"""Planning-stage tile explode — narrow (z,x,y) rows WITHOUT touching bytes
(SURVEY.md §2.3 row 15a, §4.2 column pruning).

Derives per-image georef + base zoom + covering tile range as pure Column
expressions plus one Arrow UDF (the splitmix64 derivation needs exact uint64
wraparound, which ANSI-safe Column math can't give), then
``sequence + explode`` twice. Used for statistics, skew probes, resume
planning, and join inputs; the render path does NOT consume this (rendering
is shuffle-free per image — operators/render.py), so the fat `bytes` column
never appears downstream of here. Verified via explain() in
tests/test_plan_asserts.py: the parquet scan for this plan must NOT read
`bytes` (ReadSchema pruning).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..functions import georef
from ..functions import tilemath as tm

_GEOREF_SCHEMA = StructType(
    [
        StructField("lon_c", DoubleType()),
        StructField("lat_c", DoubleType()),
        StructField("gsd", DoubleType()),
        StructField("mx0", DoubleType()),
        StructField("my0", DoubleType()),
        StructField("mx1", DoubleType()),
        StructField("my1", DoubleType()),
    ]
)


@F.pandas_udf(_GEOREF_SCHEMA)
def georef_udf(phash: pd.Series, w: pd.Series, h: pd.Series) -> pd.DataFrame:
    g = georef.derive_georef_np(
        phash.to_numpy(np.int64).astype(np.uint64), w.to_numpy(np.float64), h.to_numpy(np.float64)
    )
    return pd.DataFrame(g)


def with_georef(images: DataFrame) -> DataFrame:
    """Attach the derived georef struct + base zoom (SURVEY.md §1.5, row 14)."""
    return images.withColumn("georef", georef_udf("phash", "w", "h")).withColumn(
        "z_base", tm.base_zoom(F.col("georef.gsd")).cast("int")
    )


def explode_cover(
    images: DataFrame, zoom: Column | int | None = None, bbox: tuple[float, float, float, float] | None = None
) -> DataFrame:
    """Narrow (image_id, z, x, y[, tile center lat/lon]) rows covering each
    image's extent at `zoom` (default: its base zoom). No bytes involved.

    `bbox` = (mx0, my0, mx1, my1) mercator-meter window: a tile-range
    predicate PUSHED THROUGH the explode (SURVEY.md §4.3) — per-image cover
    ranges are intersected with the window's tile range BEFORE sequence+
    explode, so out-of-window tiles are never generated (vs. generating the
    full cover and filtering after). Result set is identical to
    filter-after-explode on the window's tile range (tested).
    """
    df = with_georef(images.select("image_id", "w", "h", "phash"))
    z = F.col("z_base") if zoom is None else (F.lit(zoom) if isinstance(zoom, int) else zoom)
    g = F.col("georef")
    txmin = tm.clamp_tile(tm.cover_min(g["mx0"], z), z)
    txmax = tm.clamp_tile(F.greatest(tm.cover_max(g["mx1"], z), tm.cover_min(g["mx0"], z)), z)
    tymin = tm.clamp_tile(tm.cover_min(g["my0"], z), z)
    tymax = tm.clamp_tile(F.greatest(tm.cover_max(g["my1"], z), tm.cover_min(g["my0"], z)), z)
    if bbox is not None:
        bx0, by0, bx1, by1 = (F.lit(float(v)) for v in bbox)
        txmin = F.greatest(txmin, tm.clamp_tile(tm.cover_min(bx0, z), z))
        txmax = F.least(txmax, tm.clamp_tile(F.greatest(tm.cover_max(bx1, z), tm.cover_min(bx0, z)), z))
        tymin = F.greatest(tymin, tm.clamp_tile(tm.cover_min(by0, z), z))
        tymax = F.least(tymax, tm.clamp_tile(F.greatest(tm.cover_max(by1, z), tm.cover_min(by0, z)), z))
    df = df.select(
        "image_id",
        z.alias("z"),
        txmin.alias("txmin"),
        txmax.alias("txmax"),
        tymin.alias("tymin"),
        tymax.alias("tymax"),
    )
    if bbox is not None:
        # images whose cover misses the window entirely produce empty
        # sequences -> drop them before the explode
        df = df.filter((F.col("txmin") <= F.col("txmax")) & (F.col("tymin") <= F.col("tymax")))
    df = df.select(
        "image_id",
        "z",
        F.explode(F.sequence("txmin", "txmax")).alias("x"),
        "tymin",
        "tymax",
    ).select("image_id", "z", "x", F.explode(F.sequence("tymin", "tymax")).alias("y"))
    # tile-center lon/lat as Column exprs (native, codegen'd)
    span = tm.resolution("z") * F.lit(float(tm.TILE))
    cmx = (F.col("x").cast("double") + F.lit(0.5)) * span - F.lit(tm.ORIGIN)
    cmy = (F.col("y").cast("double") + F.lit(0.5)) * span - F.lit(tm.ORIGIN)
    return df.withColumn("lon", tm.inv_merc_lon(cmx)).withColumn("lat", tm.inv_merc_lat(cmy))


def skew_probe(tiles_or_cover: DataFrame, key: str = "h3_cell", top: int = 20) -> DataFrame:
    """Cheap key-frequency probe used to size the salt factor (SURVEY.md §4.3).

    Returns per-key counts of the `top` heaviest keys plus approx distinct.
    """
    counts = tiles_or_cover.groupBy(key).count()
    return counts.orderBy(F.desc("count")).limit(top)


def auto_salt_factor(
    tiles_or_cover: DataFrame, key: str = "h3_cell", num_partitions: int = 32, max_salt: int = 64
) -> int:
    """Pick the salt factor from the skew probe (SURVEY.md §4.3): the
    hottest key must spread over enough salt buckets that its largest
    shard is no bigger than an average partition's load. One cheap
    aggregate over narrow rows (run it on the planning cover, not the
    rendered tiles).

    salt = clamp(ceil(hottest / (total / num_partitions)), 1, max_salt)
    """
    agg = tiles_or_cover.groupBy(key).count().agg(
        F.max("count").alias("hot"), F.sum("count").alias("total")
    ).collect()[0]
    hot, total = int(agg["hot"] or 0), int(agg["total"] or 0)
    if total == 0:
        return 1
    mean_load = max(1.0, total / float(num_partitions))
    import math

    return int(min(max_salt, max(1, math.ceil(hot / mean_load))))


def salt_column(salt_factor: int, *row_cols) -> Column:
    """Deterministic per-ROW salt bucket: pmod(xxhash64(row identity), S).

    The salt must vary WITHIN a hot (h3_cell, zoom) key, so it hashes
    row-identity columns (e.g. image_id, x, y) — NOT the key itself (a
    key-derived salt adds no distinct partition values and splits nothing).
    """
    return F.pmod(F.xxhash64(*row_cols), F.lit(salt_factor))


def salted_repartition(
    tiles: DataFrame,
    num_partitions: int,
    salt_factor: int = 8,
    row_cols: tuple[str, ...] = ("image_id", "x", "y"),
) -> DataFrame:
    """Repartition tiles by (zoom, h3_cell, salt) — the explicit
    skew-handling shuffle of BASELINE.json:6/14: a hot cell spreads over up
    to `salt_factor` partitions while staying zoom/cell-clustered for the
    sink; AQE skew-join remains the backstop for joins.
    """
    return tiles.withColumn("salt", salt_column(salt_factor, *row_cols)).repartition(
        num_partitions, F.col("z"), F.col("h3_cell"), F.col("salt")
    )
