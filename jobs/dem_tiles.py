"""spark-submit entry point — web-DEM tiling (the rio-rgbify role):
EPSG:3857 GeoTIFF DEM table -> Terrarium/Mapbox Terrain-RGB PNG tiles,
written to an XYZ/TMS directory tree (with tilemapresource.xml +
leaflet.html) or sharded MBTiles.

    spark-submit --py-files dist/engine.zip jobs/dem_tiles.py \
        --images dem_table.parquet --out /data/terrain \
        --zooms 10,11,12 --encoding terrarium --dst-format dir

Chain: jobs/dem_ingest.py (.hgt/.asc/.xyz/ENVI -> GeoTIFF table), then
`gdal_utils warp --src 4326` for .hgt rows, then this job. Tiles from
different source DEMs that collide on a key are deduplicated
first-wins per (z, x, y) to keep the sink layout valid (mosaic the
DEMs upstream for seam-aware merging).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="parquet of image_id/bytes 3857 GeoTIFF DEMs")
    ap.add_argument("--out", required=True)
    ap.add_argument("--zooms", required=True, help="comma-separated zoom list, e.g. 10,11,12")
    ap.add_argument("--encoding", default="terrarium", choices=("terrarium", "mapbox"))
    ap.add_argument("--resample", default="nearest", choices=("nearest", "bilinear"))
    ap.add_argument("--dst-format", default="dir", choices=("dir", "mbtiles"))
    ap.add_argument("--dst-scheme", default="xyz", choices=("xyz", "tms"))
    ap.add_argument("--single-file", action="store_true")
    ap.add_argument("--name", default="terrain")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tilers_tools_spark.operators.terrain import dem_tiles
    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources import mbtiles as mbt, tileset

    spark = get_spark(app="dem_tiles", master=args.master)
    images = spark.read.parquet(args.images).filter(F.col("bytes").isNotNull())
    zooms = tuple(int(z) for z in args.zooms.split(","))
    tiles = (
        dem_tiles(images, zooms=zooms, encoding=args.encoding, resample=args.resample)
        .filter(F.col("z") >= 0)  # drop the unreadable-row sentinels
        .dropDuplicates(["z", "x", "y"])  # first-wins on cross-DEM collisions
        .select("z", "x", "y", "tile")
    )
    n = tiles.count()
    if args.dst_format == "dir":
        tileset.write_tileset_dir(tiles, args.out, scheme=args.dst_scheme)
        tileset.write_tilemap_xml(tiles, args.out, title=args.name)
        tileset.write_leaflet_html(tiles, args.out, title=args.name, scheme=args.dst_scheme)
        out = args.out
    else:
        out = mbt.write_mbtiles(
            tiles, args.out, metadata={"name": args.name, "format": "png"},
            single_file=args.single_file,
        )
    print(json.dumps({"tiles": n, "zooms": list(zooms), "encoding": args.encoding, "out": out}))
    spark.stop()


if __name__ == "__main__":
    main()
