"""Directory tile-tree materializer (SURVEY.md §2.1 row 3 'optional
materializer'): writes `dest/<path>` files per partition for interop with
tools that expect gdal_tiler-style xyz/tms/zyx trees. The primary sink is
the tiles table; this exists for parity with the reference's filesystem
output. `noclobber=True` reproduces the reference's skip-existing resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.convert import tile_path


def write_tileset_dir(tiles: DataFrame, dest: str, scheme: str = "xyz", ext: str = "png", noclobber: bool = True) -> str:
    df = tile_path(tiles, scheme=scheme, ext=ext).select("path", "tile")

    def write_part(rows):
        for r in rows:
            p = os.path.join(dest, r["path"])
            if noclobber and os.path.exists(p):
                continue
            os.makedirs(os.path.dirname(p), exist_ok=True)
            tmp = p + ".tmp"
            with open(tmp, "wb") as f:
                f.write(bytes(r["tile"]))
            os.replace(tmp, p)

    df.foreachPartition(write_part)
    return dest


def read_tileset_dir(spark, src: str, scheme: str = "xyz"):
    """Walk a tile tree back into a canonical tiles DF (row 10: the tile-set
    walk IS a scan). Uses Spark's binaryFile source for a parallel read."""
    from pyspark.sql import functions as F

    from ..functions import tilemath as tm

    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.png").option("recursiveFileLookup", "true").load(src)
    parts = F.split(F.regexp_replace(F.col("path"), r"^.*?(\d+)/(\d+)/(\d+)\.png$", "$1/$2/$3"), "/")
    df = df.select(
        parts.getItem(0).cast("int").alias("z"),
        parts.getItem(1).cast("long").alias("a"),
        parts.getItem(2).cast("long").alias("b"),
        F.col("content").alias("tile"),
    )
    if scheme == "xyz":
        return df.select("z", F.col("a").alias("x"), tm.tms_to_xyz(F.col("b"), F.col("z")).alias("y"), "tile")
    if scheme == "tms":
        return df.select("z", F.col("a").alias("x"), F.col("b").alias("y"), "tile")
    if scheme == "zyx":
        return df.select("z", F.col("b").alias("x"), tm.tms_to_xyz(F.col("a"), F.col("z")).alias("y"), "tile")
    raise ValueError(scheme)
