"""MBTiles SQLite container source/sink (SURVEY.md §2.1 row 5; MBTiles 1.x
[SPEC]: tiles(zoom_level, tile_column, tile_row TMS, tile_data), metadata
k/v, unique index on the key triple).

Distributed write strategy (100TB-aware): each executor partition writes its
own `part-<pid>.mbtiles` shard via stdlib sqlite3 inside
``foreachPartition`` (no driver bottleneck, no cross-partition lock); a
small-set convenience path merges shards into a single file on the driver
(SQLite is single-writer, so a single global .mbtiles is inherently a
driver-side merge — documented interop limitation, the primary sink is the
tiles table itself per SURVEY.md §2.1 row 3).

Read side: shard(s) -> DataFrame via sqlite3 on the driver for small sets,
or binaryFile-style parallel scan of a shard directory.
"""

from __future__ import annotations

import glob
import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession

from ..operators.convert import from_mbtiles_keys, to_mbtiles_keys

_DDL = [
    "CREATE TABLE IF NOT EXISTS tiles (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, tile_data BLOB)",
    "CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT)",
    "CREATE UNIQUE INDEX IF NOT EXISTS tile_index ON tiles (zoom_level, tile_column, tile_row)",
]


def write_mbtiles(tiles: DataFrame, out_dir: str, metadata: dict | None = None, single_file: bool = False) -> str:
    """Write tiles DF to MBTiles shard(s) under out_dir; returns the path.

    `single_file=True` merges shards into out_dir/tiles.mbtiles (driver).

    NOTE: MBTiles keys tiles on (zoom_level, tile_column, tile_row) ONLY
    [SPEC] — a multi-image tiles DF with colliding (z,x,y) keys gets
    last-writer-wins per the spec's unique index (the reference resolves
    this by merging maps first). Composite overlapping sets with
    ``operators.convert.merge_tilesets`` before export.
    """
    os.makedirs(out_dir, exist_ok=True)
    kv = to_mbtiles_keys(tiles)

    def write_part(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.mbtiles")
        con = sqlite3.connect(path)
        for ddl in _DDL:
            con.execute(ddl)
        con.executemany(
            "INSERT OR REPLACE INTO tiles (zoom_level, tile_column, tile_row, tile_data) VALUES (?,?,?,?)",
            ((int(r["zoom_level"]), int(r["tile_column"]), int(r["tile_row"]), bytes(r["tile_data"])) for r in rows),
        )
        con.commit()
        con.close()

    kv.foreachPartition(write_part)
    shards = sorted(glob.glob(os.path.join(out_dir, "part-*.mbtiles")))
    if not single_file:
        _write_metadata(shards, metadata)
        return out_dir
    final = os.path.join(out_dir, "tiles.mbtiles")
    con = sqlite3.connect(final)
    for ddl in _DDL:
        con.execute(ddl)
    for s in shards:
        con.execute("ATTACH DATABASE ? AS shard", (s,))
        con.execute(
            "INSERT OR REPLACE INTO tiles SELECT zoom_level, tile_column, tile_row, tile_data FROM shard.tiles"
        )
        con.commit()
        con.execute("DETACH DATABASE shard")
        os.remove(s)
    _write_metadata([final], metadata)
    con.close()
    return final


def _write_metadata(paths, metadata: dict | None):
    for p in paths:
        con = sqlite3.connect(p)
        for ddl in _DDL:
            con.execute(ddl)
        for k, v in (metadata or {}).items():
            con.execute("INSERT OR REPLACE INTO metadata (name, value) VALUES (?,?)", (k, str(v)))
        con.commit()
        con.close()


_MBT_SCHEMA = "zoom_level int, tile_column long, tile_row long, tile_data binary"


def read_mbtiles(spark: SparkSession, path: str, parallel: bool | None = None) -> DataFrame:
    """MBTiles file or shard dir -> canonical tiles DF (z, x TMS, y, tile).

    Scale path (default for shard dirs): the file list is distributed and
    each executor partition opens its own shard(s) with per-partition
    sqlite3 inside ``mapInPandas`` — a distributed scan mirroring the
    sharded write path, not a driver-side createDataFrame of all rows.
    `parallel=False` forces the small-set driver path (single file default).
    """
    files = [path] if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.mbtiles")))
    if not files:
        raise FileNotFoundError(f"no .mbtiles under {path}")
    if parallel is None:
        parallel = len(files) > 1
    if not parallel:
        rows = []
        for f in files:
            con = sqlite3.connect(f)
            rows += [
                (int(z), int(x), int(y), bytes(b))
                for z, x, y, b in con.execute("SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles")
            ]
            con.close()
        return from_mbtiles_keys(spark.createDataFrame(rows, _MBT_SCHEMA))

    def read_shards(batches):
        import pandas as pd

        for pdf in batches:
            for f in pdf["path"]:
                con = sqlite3.connect(f)
                rows = con.execute(
                    "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
                ).fetchall()
                con.close()
                if rows:
                    yield pd.DataFrame(
                        rows, columns=["zoom_level", "tile_column", "tile_row", "tile_data"]
                    )

    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(len(files), "path")
    return from_mbtiles_keys(fdf.mapInPandas(read_shards, _MBT_SCHEMA))


def read_mbtiles_metadata(path: str) -> dict:
    f = path if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.mbtiles")))[0]
    con = sqlite3.connect(f)
    kv = dict(con.execute("SELECT name, value FROM metadata"))
    con.close()
    return kv
