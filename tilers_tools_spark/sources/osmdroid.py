"""osmdroid sqlite tile-archive source/sink (SURVEY.md §2.4 row 22
family — the archive format of osmdroid's SqliteArchiveTileWriter /
DatabaseFileArchive, the stock Android map library; same interop role as
the reference tiles_convert's container targets).

Published schema [SPEC]:
    CREATE TABLE tiles (key INTEGER, provider TEXT, tile BLOB,
                        PRIMARY KEY (key, provider))
with key = (((z << z) + x) << z) + y and y in OSM/Google top-down
convention. Key math lives in operators.convert.to_osmdroid_keys /
from_osmdroid_keys (pure column projections, exact long arithmetic).

Distributed write strategy mirrors sources/rmaps.py: per-partition
`part-<pid>.sqlite` shards via stdlib sqlite3 in ``foreachPartition``
(no driver bottleneck); `single_file=True` merges shards on the driver
(SQLite is single-writer — documented interop limitation; the primary
sink remains the tiles table, SURVEY.md §2.1 row 3).
"""

from __future__ import annotations

import glob
import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession

from ..operators.convert import from_osmdroid_keys, to_osmdroid_keys

_DDL = (
    "CREATE TABLE IF NOT EXISTS tiles (key INTEGER, provider TEXT, tile BLOB, "
    "PRIMARY KEY (key, provider))"
)


def write_osmdroid(
    tiles: DataFrame, out_dir: str, provider: str = "tiles", single_file: bool = False
) -> str:
    """Write tiles DF to osmdroid sqlite shard(s) under out_dir; returns
    the path (out_dir, or the merged file when single_file=True).

    Collisions on (key, provider) are last-writer-wins per the schema's
    primary key (same caveat as MBTiles — composite overlapping sets
    with ``operators.convert.merge_tilesets`` first)."""
    os.makedirs(out_dir, exist_ok=True)
    kv = to_osmdroid_keys(tiles, provider=provider)

    def write_part(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.sqlite")
        con = sqlite3.connect(path)
        con.execute(_DDL)
        con.executemany(
            "INSERT OR REPLACE INTO tiles (key, provider, tile) VALUES (?,?,?)",
            ((int(r["key"]), str(r["provider"]), bytes(r["tile"])) for r in rows),
        )
        con.commit()
        con.close()

    kv.foreachPartition(write_part)
    shards = sorted(glob.glob(os.path.join(out_dir, "part-*.sqlite")))
    if not single_file:
        return out_dir
    final = os.path.join(out_dir, "tiles.sqlite")
    con = sqlite3.connect(final)
    con.execute(_DDL)
    for s in shards:
        con.execute("ATTACH DATABASE ? AS shard", (s,))
        con.execute("INSERT OR REPLACE INTO tiles SELECT key, provider, tile FROM shard.tiles")
        con.commit()
        con.execute("DETACH DATABASE shard")
        os.remove(s)
    con.close()
    return final


_OSMDROID_SCHEMA = "key long, provider string, tile binary"


def read_osmdroid(spark: SparkSession, path: str, parallel: bool | None = None) -> DataFrame:
    """osmdroid sqlite file or shard dir -> canonical tiles DF
    (z zoom, x, y TMS, tile). Scale path mirrors read_rmaps: the file
    list is distributed and each partition opens its own shard(s) inside
    ``mapInPandas``; `parallel=False` forces the small-set driver path."""
    files = [path] if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.sqlite")))
    if not files:
        raise FileNotFoundError(f"no .sqlite under {path}")
    if parallel is None:
        parallel = len(files) > 1
    if not parallel:
        rows = []
        for f in files:
            con = sqlite3.connect(f)
            rows += [
                (int(k), str(p), bytes(b))
                for k, p, b in con.execute("SELECT key, provider, tile FROM tiles")
            ]
            con.close()
        return from_osmdroid_keys(spark.createDataFrame(rows, _OSMDROID_SCHEMA))

    def read_shards(batches):
        import pandas as pd

        for pdf in batches:
            for f in pdf["path"]:
                con = sqlite3.connect(f)
                rows = con.execute("SELECT key, provider, tile FROM tiles").fetchall()
                con.close()
                if rows:
                    yield pd.DataFrame(rows, columns=["key", "provider", "tile"])

    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(len(files), "path")
    return from_osmdroid_keys(fdf.mapInPandas(read_shards, _OSMDROID_SCHEMA))
