"""spark-submit entry point — incremental tile-set republish (the
rsync-style update loop scripted around the reference's tile trees, as a
first-class job over operators/diff.py):

    # emit the delta as its own artifact (upsert tiles + removed-key list)
    spark-submit --py-files dist/engine.zip jobs/tiles_update.py \
        --old <dir|.mbtiles> --old-format dir --new <dir|.mbtiles> \
        --mode emit --dst /path/delta [--dst-format dir|mbtiles]

    # apply the diff directly into a published single-file MBTiles
    spark-submit ... jobs/tiles_update.py \
        --old <published.mbtiles> --old-format mbtiles --new <fresh dir> \
        --mode apply

Scale notes: the diff classifies keys on md5 digests only (blobs never
shuffle); only added/changed blobs are materialized. `apply` mutates the
SQLite file on the driver (SQLite is single-writer — same documented
interop limitation as the single-file merge path) streaming the delta via
toLocalIterator, so driver memory stays O(batch); it handles BOTH plain
`tiles`-table files and the deduplicated map+images layout (detected from
sqlite_master; dedup apply also garbage-collects orphaned blobs).
"""

from __future__ import annotations

import argparse
import json
import os
import sqlite3


def _read(spark, path, fmt, scheme):
    from tilers_tools_spark.sources import mbtiles as mbt
    from tilers_tools_spark.sources import tileset

    if fmt == "dir":
        return tileset.read_tileset_dir(spark, path, scheme=scheme)
    if fmt == "mbtiles":
        return mbt.read_mbtiles(spark, path)
    if fmt == "rmaps":
        from tilers_tools_spark.sources import rmaps

        return rmaps.read_rmaps(spark, path)
    if fmt == "gpkg":
        from tilers_tools_spark.sources import gpkg

        return gpkg.read_gpkg(spark, path)
    raise ValueError(f"unsupported src format {fmt!r}")


def apply_delta_mbtiles(delta_rows, path: str) -> dict:
    """Apply (z, x TMS, y, status, tile) rows to an MBTiles file in place.

    Layout-aware: plain `tiles` table, or the deduplicated map+images
    variant (upserts insert the blob once per md5 and point the map row at
    it; removals delete the map row; orphaned images rows are swept at the
    end). Returns per-status counters.
    """
    con = sqlite3.connect(path)
    kinds = dict(
        con.execute("SELECT name, type FROM sqlite_master WHERE name IN ('tiles','map')")
    )
    dedup = kinds.get("map") == "table"
    n = {"added": 0, "removed": 0, "changed": 0}
    import hashlib

    for r in delta_rows:
        z, x, y, status = int(r["z"]), int(r["x"]), int(r["y"]), r["status"]
        n[status] += 1
        if status == "removed":
            if dedup:
                con.execute(
                    "DELETE FROM map WHERE zoom_level=? AND tile_column=? AND tile_row=?", (z, x, y)
                )
            else:
                con.execute(
                    "DELETE FROM tiles WHERE zoom_level=? AND tile_column=? AND tile_row=?",
                    (z, x, y),
                )
            continue
        blob = bytes(r["tile"])
        if dedup:
            tid = hashlib.md5(blob).hexdigest()
            con.execute("INSERT OR IGNORE INTO images (tile_id, tile_data) VALUES (?,?)", (tid, blob))
            con.execute(
                "INSERT OR REPLACE INTO map (zoom_level, tile_column, tile_row, tile_id) VALUES (?,?,?,?)",
                (z, x, y, tid),
            )
        else:
            con.execute(
                "INSERT OR REPLACE INTO tiles (zoom_level, tile_column, tile_row, tile_data) VALUES (?,?,?,?)",
                (z, x, y, blob),
            )
    if dedup:
        con.execute("DELETE FROM images WHERE tile_id NOT IN (SELECT DISTINCT tile_id FROM map)")
    con.commit()
    con.close()
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True)
    ap.add_argument("--old-format", default="dir", choices=("dir", "mbtiles", "rmaps", "gpkg"))
    ap.add_argument("--new", required=True)
    ap.add_argument("--new-format", default="dir", choices=("dir", "mbtiles", "rmaps", "gpkg"))
    ap.add_argument("--scheme", default="xyz", choices=("xyz", "tms", "zyx"))
    ap.add_argument("--mode", default="emit", choices=("emit", "apply"))
    ap.add_argument("--dst", default=None, help="emit: delta artifact path (required)")
    ap.add_argument("--dst-format", default="dir", choices=("dir", "mbtiles"))
    ap.add_argument("--name", default="delta")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import diff as tdiff
    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources import mbtiles as mbt
    from tilers_tools_spark.sources import tileset

    spark = get_spark(app="tiles_update", master=args.master)
    old = _read(spark, args.old, args.old_format, args.scheme)
    new = _read(spark, args.new, args.new_format, args.scheme)
    delta = tdiff.tileset_diff(old, new, with_blobs=True).cache()
    counts = {r["status"]: r["n"] for r in delta.groupBy("status").agg(F.count("*").alias("n")).collect()}
    counts = {s: int(counts.get(s, 0)) for s in ("added", "removed", "changed")}

    if args.mode == "apply":
        if args.old_format != "mbtiles" or not os.path.isfile(args.old):
            raise SystemExit("--mode apply requires --old to be a single-file .mbtiles")
        apply_delta_mbtiles(delta.toLocalIterator(), args.old)
        out = args.old
    else:
        if not args.dst:
            raise SystemExit("--mode emit requires --dst")
        ups = delta.where(F.col("status") != "removed").select("z", "x", "y", "tile")
        if args.dst_format == "dir":
            tileset.write_tileset_dir(ups, args.dst, scheme=args.scheme)
            out = args.dst
        else:
            out = mbt.write_mbtiles(ups, args.dst, metadata={"name": args.name}, single_file=True)
        removed = delta.where(F.col("status") == "removed").select("z", "x", "y")
        removed.coalesce(1).write.mode("overwrite").parquet(os.path.join(args.dst, "removed_keys.parquet"))
    print(json.dumps({**counts, "out": out}))
    spark.stop()


if __name__ == "__main__":
    main()
