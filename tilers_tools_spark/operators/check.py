"""Tile-set integrity lint: the pre-publish validation pass for a pyramid.

Role model: the sanity checks users of the reference toolchain run by hand
over its tile trees before publishing (key collisions across merged maps,
tiles addressed outside the zoom's grid, broken pyramids where a child has
no parent tile to zoom out to). At 10^9+ tiles these must be relational
scans, not filesystem walks — every check below is a pure key-space
DataFrame op (blobs are never read), so the whole lint is one narrow
key-column pass with map-side aggregation.

Checks emitted (one row per offending tile key):

* ``dup_key``      — the (z, x, y) triple appears more than once (container
                     writers are last-writer-wins; a dup means data loss).
* ``key_range``    — x or y outside [0, 2^z) for its zoom.
* ``orphan_child`` — a tile at z > min(z) whose parent (z-1, x//2, y//2)
                     is missing: zoom-out from this tile hits a hole.
                     (Parent halving is scheme-independent — XYZ and TMS
                     y both halve — and is evaluated over distinct,
                     in-range keys so range violations don't double-report.)

Driver gate ``tileset_check`` recomputes all three relationally in DuckDB
over a fixture with deliberately injected violations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tileset_check"]


def tileset_check(tiles: DataFrame) -> DataFrame:
    """Lint a tiles DF; returns (issue, z, x, y) violation rows.

    Key-space only — never touches the blob column. min(z) is one tiny
    driver-side aggregate (same pattern as the viewport/bbox planners);
    parent keys use shiftright halving (keys are non-negative by the
    key_range contract — negative keys are reported there, and excluded
    from the orphan scan).
    """
    keys = tiles.select(
        F.col("z").cast("long").alias("z"),
        F.col("x").cast("long").alias("x"),
        F.col("y").cast("long").alias("y"),
    )
    dup = (
        keys.groupBy("z", "x", "y")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > 1)
        .select(F.lit("dup_key").alias("issue"), "z", "x", "y")
    )
    # 2^z is exact in double up to z=52 (z <= 30 by contract), so the cast is safe
    n_side = F.pow(F.lit(2.0), F.col("z")).cast("long")
    bad_range = (F.col("x") < 0) | (F.col("y") < 0) | (F.col("x") >= n_side) | (F.col("y") >= n_side)
    distinct = keys.distinct()
    rng = distinct.where(bad_range).select(F.lit("key_range").alias("issue"), "z", "x", "y")
    ok = distinct.where(~bad_range)
    minz_row = ok.agg(F.min("z").alias("m")).first()
    if minz_row is None or minz_row["m"] is None:
        return dup.unionByName(rng)  # empty or range-only set: no orphan scan
    minz = int(minz_row["m"])
    children = ok.where(F.col("z") > F.lit(minz))
    parents = ok.select(
        (F.col("z") + 1).alias("pz"), F.col("x").alias("px"), F.col("y").alias("py")
    )
    orph = children.join(
        parents,
        on=[
            children["z"] == parents["pz"],
            F.shiftright(children["x"], 1) == parents["px"],
            F.shiftright(children["y"], 1) == parents["py"],
        ],
        how="left_anti",
    ).select(F.lit("orphan_child").alias("issue"), "z", "x", "y")
    return dup.unionByName(rng).unionByName(orph)
