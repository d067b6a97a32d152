"""RMaps/BigPlanet SQLite tile container source/sink (SURVEY.md §2.4 row
22 family — the MOBAC "RMaps SQLite" atlas format, readable by RMaps,
OsmAnd (.sqlitedb), Locus; same interop role as the reference
tiles_convert's container targets).

Published schema [SPEC]:
    CREATE TABLE tiles (x int, y int, z int, s int, image blob,
                        PRIMARY KEY (x, y, z, s))
    CREATE TABLE info (minzoom int, maxzoom int)
with y in OSM/Google top-down convention, z STORED as 17 - zoom (the
BigPlanet legacy rule) and s = 0; info holds the min/max of the STORED
z values. Key math lives in operators.convert.to_rmaps_keys /
from_rmaps_keys (pure column projections).

Distributed write strategy mirrors sources/mbtiles.py: per-partition
`part-<pid>.sqlitedb` shards via stdlib sqlite3 in ``foreachPartition``
(no driver bottleneck); `single_file=True` merges shards on the driver
(SQLite is single-writer — documented interop limitation; the primary
sink remains the tiles table, SURVEY.md §2.1 row 3).
"""

from __future__ import annotations

import glob
import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession

from ..operators.convert import from_rmaps_keys, to_rmaps_keys

_DDL = [
    "CREATE TABLE IF NOT EXISTS tiles (x int, y int, z int, s int, image blob, PRIMARY KEY (x,y,z,s))",
    "CREATE TABLE IF NOT EXISTS info (minzoom int, maxzoom int)",
]


def write_rmaps(tiles: DataFrame, out_dir: str, single_file: bool = False) -> str:
    """Write tiles DF to RMaps sqlitedb shard(s) under out_dir; returns
    the path (out_dir, or the merged file when single_file=True).

    Collisions on (x, y, z, s) are last-writer-wins per the schema's
    primary key (same caveat as MBTiles — composite overlapping sets
    with ``operators.convert.merge_tilesets`` first)."""
    os.makedirs(out_dir, exist_ok=True)
    kv = to_rmaps_keys(tiles)

    def write_part(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.sqlitedb")
        con = sqlite3.connect(path)
        for ddl in _DDL:
            con.execute(ddl)
        con.executemany(
            "INSERT OR REPLACE INTO tiles (x, y, z, s, image) VALUES (?,?,?,?,?)",
            (
                (int(r["x"]), int(r["y"]), int(r["z"]), int(r["s"]), bytes(r["image"]))
                for r in rows
            ),
        )
        con.commit()
        con.close()

    kv.foreachPartition(write_part)
    shards = sorted(glob.glob(os.path.join(out_dir, "part-*.sqlitedb")))
    if not single_file:
        for s in shards:
            _write_info(s)
        return out_dir
    final = os.path.join(out_dir, "tiles.sqlitedb")
    con = sqlite3.connect(final)
    for ddl in _DDL:
        con.execute(ddl)
    for s in shards:
        con.execute("ATTACH DATABASE ? AS shard", (s,))
        con.execute("INSERT OR REPLACE INTO tiles SELECT x, y, z, s, image FROM shard.tiles")
        con.commit()
        con.execute("DETACH DATABASE shard")
        os.remove(s)
    con.close()
    _write_info(final)
    return final


def _write_info(path: str) -> None:
    """(Re)write the single info row from the shard's own stored-z range
    (MOBAC writes min/max of the stored 17-zoom values)."""
    con = sqlite3.connect(path)
    for ddl in _DDL:
        con.execute(ddl)
    zmin, zmax = con.execute("SELECT min(z), max(z) FROM tiles").fetchone()
    con.execute("DELETE FROM info")
    if zmin is not None:
        con.execute("INSERT INTO info (minzoom, maxzoom) VALUES (?,?)", (int(zmin), int(zmax)))
    con.commit()
    con.close()


_RMAPS_SCHEMA = "x long, y long, z int, s int, image binary"


def read_rmaps(spark: SparkSession, path: str, parallel: bool | None = None) -> DataFrame:
    """RMaps sqlitedb file or shard dir -> canonical tiles DF
    (z zoom, x, y TMS, tile). Scale path mirrors read_mbtiles: the file
    list is distributed and each partition opens its own shard(s) inside
    ``mapInPandas``; `parallel=False` forces the small-set driver path."""
    files = [path] if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.sqlitedb")))
    if not files:
        raise FileNotFoundError(f"no .sqlitedb under {path}")
    if parallel is None:
        parallel = len(files) > 1
    if not parallel:
        rows = []
        for f in files:
            con = sqlite3.connect(f)
            rows += [
                (int(x), int(y), int(z), int(s), bytes(b))
                for x, y, z, s, b in con.execute("SELECT x, y, z, s, image FROM tiles")
            ]
            con.close()
        return from_rmaps_keys(spark.createDataFrame(rows, _RMAPS_SCHEMA))

    def read_shards(batches):
        import pandas as pd

        for pdf in batches:
            for f in pdf["path"]:
                con = sqlite3.connect(f)
                rows = con.execute("SELECT x, y, z, s, image FROM tiles").fetchall()
                con.close()
                if rows:
                    yield pd.DataFrame(rows, columns=["x", "y", "z", "s", "image"])

    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(len(files), "path")
    return from_rmaps_keys(fdf.mapInPandas(read_shards, _RMAPS_SCHEMA))


def read_rmaps_info(path: str) -> dict:
    f = path if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.sqlitedb")))[0]
    con = sqlite3.connect(f)
    row = con.execute("SELECT minzoom, maxzoom FROM info").fetchone()
    con.close()
    return {"minzoom": row[0], "maxzoom": row[1]} if row else {}
