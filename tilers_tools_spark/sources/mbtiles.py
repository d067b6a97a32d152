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

# Deduplicated layout (the TileMill/mbutil two-table variant: `map` holds
# the key triple -> tile_id (md5 hex of the blob), `images` stores each
# distinct blob ONCE, and `tiles` is a VIEW over the join — so every
# spec-level reader, including this module's own read paths, sees the
# standard tiles relation). The big win at scale is uniform tiles (ocean,
# empty land, nodata collars): 10^9 identical sea tiles cost one blob.
_DDL_DEDUP = [
    "CREATE TABLE IF NOT EXISTS map (zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER, tile_id TEXT)",
    "CREATE TABLE IF NOT EXISTS images (tile_id TEXT, tile_data BLOB)",
    "CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT)",
    "CREATE UNIQUE INDEX IF NOT EXISTS map_index ON map (zoom_level, tile_column, tile_row)",
    "CREATE UNIQUE INDEX IF NOT EXISTS images_id ON images (tile_id)",
    "CREATE VIEW IF NOT EXISTS tiles AS SELECT map.zoom_level AS zoom_level,"
    " map.tile_column AS tile_column, map.tile_row AS tile_row,"
    " images.tile_data AS tile_data FROM map JOIN images ON images.tile_id = map.tile_id",
]


def write_mbtiles(
    tiles: DataFrame,
    out_dir: str,
    metadata: dict | None = None,
    single_file: bool = False,
    dedup: bool = False,
) -> str:
    """Write tiles DF to MBTiles shard(s) under out_dir; returns the path.

    `single_file=True` merges shards into out_dir/tiles.mbtiles (driver).

    `dedup=True` writes the deduplicated two-table layout (map + images +
    tiles view): blobs are stored once per distinct md5 WITHIN each shard
    (sqlite `INSERT OR IGNORE`, no extra Spark shuffle — the blob column
    never leaves its partition), and once GLOBALLY after the single-file
    merge. Readers are unaffected: `tiles` is a view with the spec schema.

    NOTE: MBTiles keys tiles on (zoom_level, tile_column, tile_row) ONLY
    [SPEC] — a multi-image tiles DF with colliding (z,x,y) keys gets
    last-writer-wins per the spec's unique index (the reference resolves
    this by merging maps first). Composite overlapping sets with
    ``operators.convert.merge_tilesets`` before export.
    """
    os.makedirs(out_dir, exist_ok=True)
    kv = to_mbtiles_keys(tiles)
    ddl = _DDL_DEDUP if dedup else _DDL

    def write_part(rows):
        import hashlib

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.mbtiles")
        con = sqlite3.connect(path)
        for d in ddl:
            con.execute(d)
        if dedup:
            for r in rows:
                blob = bytes(r["tile_data"])
                tid = hashlib.md5(blob).hexdigest()
                con.execute(
                    "INSERT OR IGNORE INTO images (tile_id, tile_data) VALUES (?,?)", (tid, blob)
                )
                con.execute(
                    "INSERT OR REPLACE INTO map (zoom_level, tile_column, tile_row, tile_id) VALUES (?,?,?,?)",
                    (int(r["zoom_level"]), int(r["tile_column"]), int(r["tile_row"]), tid),
                )
        else:
            con.executemany(
                "INSERT OR REPLACE INTO tiles (zoom_level, tile_column, tile_row, tile_data) VALUES (?,?,?,?)",
                (
                    (int(r["zoom_level"]), int(r["tile_column"]), int(r["tile_row"]), bytes(r["tile_data"]))
                    for r in rows
                ),
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
    for d in ddl:
        con.execute(d)
    for s in shards:
        con.execute("ATTACH DATABASE ? AS shard", (s,))
        if dedup:
            con.execute("INSERT OR IGNORE INTO images SELECT tile_id, tile_data FROM shard.images")
            con.execute(
                "INSERT OR REPLACE INTO map SELECT zoom_level, tile_column, tile_row, tile_id FROM shard.map"
            )
        else:
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
        con.execute("CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT)")
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
