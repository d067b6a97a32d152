"""Tile-set delta: diff two pyramids and patch one forward.

The incremental-republish primitive for a continuously re-rendered map at
scale: when the source imagery for one region updates, re-cut only that
region's tiles, `tileset_diff` the new cut against the published pyramid,
and ship the (tiny) delta to the serving container instead of re-writing
10^9 tiles. Role model: the rsync-style update loop users of the reference
toolchain script around its tile trees (re-run the tiler, rsync the
directory); here it is a first-class relational operator.

Scale design (the same two-phase shape as ``raster_compare``):

* **Phase 1 — digests only.** Both sides are projected to
  ``(keys..., md5(blob))`` map-side, so the full-outer join that classifies
  every key shuffles ~50 B/row regardless of tile size. Blobs NEVER enter
  this shuffle.
* **Phase 2 — survivor re-join.** Only when the caller asks for blobs
  (``with_blobs=True``) are the added/changed keys — typically a tiny
  fraction — joined back to the new side to pick up tile bytes. At 100 TB
  the delta is what ships, not the pyramid.
* ``tileset_patch`` applies a delta with one key-only left-anti join
  (unchanged blobs never move) plus a union of the delta's upserts.

Determinism: md5 is the engine's portable digest (same hex in DuckDB /
any other engine for the same bytes), so diffs are reproducible
cross-engine — the ``tileset_diff`` / ``tileset_patch`` driver gates
recompute the full classification relationally in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tileset_diff", "tileset_patch"]

_STATUSES = ("added", "removed", "changed")


def tileset_diff(
    old: DataFrame,
    new: DataFrame,
    keys=("z", "x", "y"),
    blob: str = "tile",
    with_blobs: bool = False,
) -> DataFrame:
    """Classify every tile key as added / removed / changed between two
    pyramids; unchanged keys are dropped (the delta is the output).

    Returns ``(keys..., status)``; with ``with_blobs=True`` also the NEW
    side's ``blob`` for added/changed rows (NULL for removed), ready to
    feed ``tileset_patch`` or a container writer.
    """
    keys = list(keys)
    ko = old.select(*keys, F.md5(F.col(blob)).alias("_d_old"))
    kn = new.select(*keys, F.md5(F.col(blob)).alias("_d_new"))
    j = ko.join(kn, on=keys, how="full_outer")
    status = (
        F.when(F.col("_d_old").isNull(), F.lit("added"))
        .when(F.col("_d_new").isNull(), F.lit("removed"))
        .when(F.col("_d_old") != F.col("_d_new"), F.lit("changed"))
    )
    delta = j.select(*keys, status.alias("status")).where(F.col("status").isNotNull())
    if not with_blobs:
        return delta
    ups = delta.where(F.col("status") != "removed").join(new, on=keys, how="inner")
    ups = ups.select(*keys, "status", F.col(blob).alias(blob))
    blob_t = dict(new.dtypes)[blob]
    rm = delta.where(F.col("status") == "removed").select(
        *keys, "status", F.lit(None).cast(blob_t).alias(blob)
    )
    return ups.unionByName(rm)


def tileset_patch(
    old: DataFrame,
    delta: DataFrame,
    keys=("z", "x", "y"),
    blob: str = "tile",
) -> DataFrame:
    """Apply a ``tileset_diff(..., with_blobs=True)`` delta to a pyramid.

    ``patch(old, diff(old, new, with_blobs=True)) == new`` exactly (pinned
    in tests/test_tileset_diff.py). Old rows not named by the delta pass
    through untouched (key-only left-anti join — their blobs never
    shuffle); removed keys vanish; added/changed take the delta's blob.
    """
    keys = list(keys)
    kept = old.join(delta.select(*keys), on=keys, how="left_anti").select(*keys, blob)
    ups = delta.where(F.col("status").isin("added", "changed")).select(*keys, blob)
    return kept.unionByName(ups)
