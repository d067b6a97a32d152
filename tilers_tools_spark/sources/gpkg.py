"""OGC GeoPackage tile-pyramid source/sink (SURVEY.md §2.4 row 22 family
— the third SQLite tile container next to MBTiles and RMaps; same interop
role as the reference tiles_convert's container targets; GDAL driver
"GPKG", MOBAC/QGIS atlas format).

Published schema [SPEC, OGC 12-128r18 GeoPackage 1.3]:
    PRAGMA application_id = 0x47504B47 ('GPKG'); user_version = 10300
    gpkg_spatial_ref_sys  (required rows srs_id -1, 0, 4326; +3857 here)
    gpkg_contents         (table_name, data_type='tiles', bbox, srs_id)
    gpkg_tile_matrix_set  (one row: the full EPSG:3857 extent)
    gpkg_tile_matrix      (per zoom: 2^z x 2^z matrix, 256px tiles,
                           pixel size = RES0 / 2^z)
    <tiles>(id PK AUTOINCREMENT, zoom_level, tile_column, tile_row,
            tile_data, UNIQUE (zoom_level, tile_column, tile_row))
with tile_row in TOP-DOWN convention (row 0 north — opposite of
MBTiles' TMS rows). Key math lives in operators.convert.to_gpkg_keys /
from_gpkg_keys (pure column projections).

Distributed write strategy mirrors sources/mbtiles.py and rmaps.py:
per-partition `part-<pid>.gpkg` shards via stdlib sqlite3 in
``foreachPartition`` (each shard a fully valid standalone GeoPackage);
`single_file=True` merges shards on the driver (SQLite is single-writer
— documented interop limitation; the primary sink remains the tiles
table, SURVEY.md §2.1 row 3).
"""

from __future__ import annotations

import glob
import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession

from ..functions.tilemath import ORIGIN, RES0
from ..operators.convert import from_gpkg_keys, to_gpkg_keys

_APPLICATION_ID = 0x47504B47  # 'GPKG'
_USER_VERSION = 10300  # GeoPackage 1.3.0

# WKT definitions abridged to the spec's minimum useful content; GDAL and
# QGIS key on srs_id/organization_coordsys_id, not the WKT text.
_SRS_ROWS = [
    ("Undefined cartesian SRS", -1, "NONE", -1, "undefined",
     "undefined cartesian coordinate reference system"),
    ("Undefined geographic SRS", 0, "NONE", 0, "undefined",
     "undefined geographic coordinate reference system"),
    ("WGS 84 geodetic", 4326, "EPSG", 4326,
     'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
     '298.257223563]],PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433],'
     'AUTHORITY["EPSG","4326"]]',
     "longitude/latitude coordinates in decimal degrees on the WGS 84 spheroid"),
    ("WGS 84 / Pseudo-Mercator", 3857, "EPSG", 3857,
     'PROJCS["WGS 84 / Pseudo-Mercator",GEOGCS["WGS 84",DATUM["WGS_1984",'
     'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
     'UNIT["degree",0.0174532925199433]],PROJECTION["Mercator_1SP"],'
     'UNIT["metre",1],AUTHORITY["EPSG","3857"]]',
     "Spherical Mercator used by web tile schemes"),
]


def _ddl(table: str) -> list:
    return [
        "CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys ("
        " srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY,"
        " organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,"
        " definition TEXT NOT NULL, description TEXT)",
        "CREATE TABLE IF NOT EXISTS gpkg_contents ("
        " table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL,"
        " identifier TEXT UNIQUE, description TEXT DEFAULT '',"
        " last_change DATETIME NOT NULL,"
        " min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,"
        " srs_id INTEGER,"
        " CONSTRAINT fk_gc_r_srs_id FOREIGN KEY (srs_id)"
        "  REFERENCES gpkg_spatial_ref_sys(srs_id))",
        "CREATE TABLE IF NOT EXISTS gpkg_tile_matrix_set ("
        " table_name TEXT NOT NULL PRIMARY KEY, srs_id INTEGER NOT NULL,"
        " min_x DOUBLE NOT NULL, min_y DOUBLE NOT NULL,"
        " max_x DOUBLE NOT NULL, max_y DOUBLE NOT NULL)",
        "CREATE TABLE IF NOT EXISTS gpkg_tile_matrix ("
        " table_name TEXT NOT NULL, zoom_level INTEGER NOT NULL,"
        " matrix_width INTEGER NOT NULL, matrix_height INTEGER NOT NULL,"
        " tile_width INTEGER NOT NULL, tile_height INTEGER NOT NULL,"
        " pixel_x_size DOUBLE NOT NULL, pixel_y_size DOUBLE NOT NULL,"
        " PRIMARY KEY (table_name, zoom_level))",
        f"CREATE TABLE IF NOT EXISTS \"{table}\" ("
        " id INTEGER PRIMARY KEY AUTOINCREMENT,"
        " zoom_level INTEGER NOT NULL, tile_column INTEGER NOT NULL,"
        " tile_row INTEGER NOT NULL, tile_data BLOB NOT NULL,"
        " UNIQUE (zoom_level, tile_column, tile_row))",
    ]


def _init_gpkg(con: sqlite3.Connection, table: str) -> None:
    con.execute(f"PRAGMA application_id = {_APPLICATION_ID}")
    con.execute(f"PRAGMA user_version = {_USER_VERSION}")
    for ddl in _ddl(table):
        con.execute(ddl)
    con.executemany(
        "INSERT OR IGNORE INTO gpkg_spatial_ref_sys"
        " (srs_name, srs_id, organization, organization_coordsys_id,"
        "  definition, description) VALUES (?,?,?,?,?,?)",
        _SRS_ROWS,
    )


def _finalize(path: str, table: str, identifier: str, last_change: str) -> None:
    """(Re)write gpkg_contents / gpkg_tile_matrix_set / gpkg_tile_matrix
    from the shard's own tile keys (like MOBAC/GDAL, the contents bbox is
    the actual data extent at each shard's own zooms; matrix rows are the
    global 2^z x 2^z EPSG:3857 grid the keys are addressed in)."""
    con = sqlite3.connect(path)
    _init_gpkg(con, table)
    zs = [int(z) for (z,) in con.execute(
        f'SELECT DISTINCT zoom_level FROM "{table}" ORDER BY zoom_level')]
    con.execute("DELETE FROM gpkg_tile_matrix WHERE table_name = ?", (table,))
    for z in zs:
        n = 1 << z
        px = RES0 / float(n)
        con.execute(
            "INSERT INTO gpkg_tile_matrix (table_name, zoom_level,"
            " matrix_width, matrix_height, tile_width, tile_height,"
            " pixel_x_size, pixel_y_size) VALUES (?,?,?,?,?,?,?,?)",
            (table, z, n, n, 256, 256, px, px),
        )
    con.execute("DELETE FROM gpkg_tile_matrix_set WHERE table_name = ?", (table,))
    con.execute(
        "INSERT INTO gpkg_tile_matrix_set (table_name, srs_id,"
        " min_x, min_y, max_x, max_y) VALUES (?,?,?,?,?,?)",
        (table, 3857, -ORIGIN, -ORIGIN, ORIGIN, ORIGIN),
    )
    con.execute("DELETE FROM gpkg_contents WHERE table_name = ?", (table,))
    if zs:
        zmax = zs[-1]
        tsz = RES0 * 256.0 / float(1 << zmax)  # tile size in meters at zmax
        cmin, cmax, rmin, rmax = con.execute(
            f'SELECT min(tile_column), max(tile_column),'
            f' min(tile_row), max(tile_row) FROM "{table}"'
            f" WHERE zoom_level = ?", (zmax,)).fetchone()
        bbox = (
            -ORIGIN + cmin * tsz,          # min_x
            ORIGIN - (rmax + 1) * tsz,     # min_y (rows are top-down)
            -ORIGIN + (cmax + 1) * tsz,    # max_x
            ORIGIN - rmin * tsz,           # max_y
        )
    else:
        bbox = (-ORIGIN, -ORIGIN, ORIGIN, ORIGIN)
    con.execute(
        "INSERT INTO gpkg_contents (table_name, data_type, identifier,"
        " description, last_change, min_x, min_y, max_x, max_y, srs_id)"
        " VALUES (?,?,?,?,?,?,?,?,?,?)",
        (table, "tiles", identifier, "tilers_tools_spark tile pyramid",
         last_change, *bbox, 3857),
    )
    con.commit()
    con.close()


def write_gpkg(
    tiles: DataFrame,
    out_dir: str,
    table: str = "tiles",
    single_file: bool = False,
    last_change: str = "2000-01-01T00:00:00.000Z",
) -> str:
    """Write tiles DF to GeoPackage shard(s) under out_dir; returns the
    path (out_dir, or the merged .gpkg when single_file=True).

    ``last_change`` defaults to a fixed timestamp so output bytes are
    deterministic (house reproducibility rule); pass a real ISO-8601
    instant for interop metadata freshness. Collisions on the key triple
    are last-writer-wins per the UNIQUE constraint (same caveat as the
    MBTiles twin — composite overlapping sets with
    ``operators.convert.merge_tilesets`` first)."""
    os.makedirs(out_dir, exist_ok=True)
    kv = to_gpkg_keys(tiles)

    def write_part(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.gpkg")
        con = sqlite3.connect(path)
        _init_gpkg(con, table)
        con.executemany(
            f'INSERT OR REPLACE INTO "{table}"'
            " (zoom_level, tile_column, tile_row, tile_data) VALUES (?,?,?,?)",
            (
                (int(r["zoom_level"]), int(r["tile_column"]),
                 int(r["tile_row"]), bytes(r["tile_data"]))
                for r in rows
            ),
        )
        con.commit()
        con.close()

    kv.foreachPartition(write_part)
    shards = sorted(glob.glob(os.path.join(out_dir, "part-*.gpkg")))
    if not single_file:
        for s in shards:
            _finalize(s, table, os.path.basename(s), last_change)
        return out_dir
    final = os.path.join(out_dir, "tiles.gpkg")
    con = sqlite3.connect(final)
    _init_gpkg(con, table)
    for s in shards:
        con.execute("ATTACH DATABASE ? AS shard", (s,))
        con.execute(
            f'INSERT OR REPLACE INTO "{table}"'
            " (zoom_level, tile_column, tile_row, tile_data)"
            f' SELECT zoom_level, tile_column, tile_row, tile_data FROM shard."{table}"'
        )
        con.commit()
        con.execute("DETACH DATABASE shard")
        os.remove(s)
    con.close()
    _finalize(final, table, table, last_change)
    return final


_GPKG_SCHEMA = "zoom_level int, tile_column long, tile_row long, tile_data binary"


def _tiles_table(con: sqlite3.Connection) -> str:
    row = con.execute(
        "SELECT table_name FROM gpkg_contents WHERE data_type = 'tiles'"
    ).fetchone()
    if row is None:
        raise ValueError("GeoPackage has no tiles entry in gpkg_contents")
    return row[0]


def read_gpkg(
    spark: SparkSession, path: str, table: str | None = None,
    parallel: bool | None = None,
) -> DataFrame:
    """GeoPackage file or shard dir -> canonical tiles DF (z zoom, x,
    y TMS, tile). Scale path mirrors read_mbtiles: the file list is
    distributed and each partition opens its own shard(s) inside
    ``mapInPandas``; `parallel=False` forces the small-set driver path.
    ``table`` defaults to the gpkg_contents tiles entry per file."""
    files = [path] if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.gpkg")))
    if not files:
        raise FileNotFoundError(f"no .gpkg under {path}")
    if parallel is None:
        parallel = len(files) > 1
    if not parallel:
        rows = []
        for f in files:
            con = sqlite3.connect(f)
            t = table or _tiles_table(con)
            rows += [
                (int(z), int(c), int(r), bytes(b))
                for z, c, r, b in con.execute(
                    f'SELECT zoom_level, tile_column, tile_row, tile_data FROM "{t}"')
            ]
            con.close()
        return from_gpkg_keys(spark.createDataFrame(rows, _GPKG_SCHEMA))

    def read_shards(batches):
        import pandas as pd

        for pdf in batches:
            for f in pdf["path"]:
                con = sqlite3.connect(f)
                t = table or _tiles_table(con)
                rows = con.execute(
                    f'SELECT zoom_level, tile_column, tile_row, tile_data FROM "{t}"'
                ).fetchall()
                con.close()
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=["zoom_level", "tile_column", "tile_row", "tile_data"],
                    )

    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(len(files), "path")
    return from_gpkg_keys(fdf.mapInPandas(read_shards, _GPKG_SCHEMA))


def read_gpkg_info(path: str, table: str | None = None) -> dict:
    """Driver-side metadata peek: contents bbox + per-zoom matrix rows."""
    f = path if os.path.isfile(path) else sorted(glob.glob(os.path.join(path, "*.gpkg")))[0]
    con = sqlite3.connect(f)
    t = table or _tiles_table(con)
    c = con.execute(
        "SELECT identifier, min_x, min_y, max_x, max_y, srs_id"
        " FROM gpkg_contents WHERE table_name = ?", (t,)).fetchone()
    matrices = con.execute(
        "SELECT zoom_level, matrix_width, matrix_height, tile_width,"
        " tile_height, pixel_x_size, pixel_y_size FROM gpkg_tile_matrix"
        " WHERE table_name = ? ORDER BY zoom_level", (t,)).fetchall()
    app_id = con.execute("PRAGMA application_id").fetchone()[0]
    con.close()
    return {
        "table": t,
        "application_id": app_id,
        "identifier": c[0],
        "bbox": tuple(c[1:5]),
        "srs_id": c[5],
        "matrices": matrices,
    }
