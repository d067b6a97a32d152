"""spark-submit entry point — heatmap density tile publishing (the
datashader / Leaflet-heat server-side role):

    spark-submit --py-files dist/engine.zip jobs/heatmap_tiles.py \
        --points events.parquet --lon-col lon --lat-col lat \
        --z-base 8 --z-min 4 --dst out_dir

Points -> per-pixel counts at --z-base -> sum-preserving overview
pyramid down to --z-min -> colorized RGBA PNG tiles for every OCCUPIED
tile at every level, written as a dest/z/x/y.png tree (or MBTiles with
--dst-format mbtiles) plus TileJSON. One color scale spans all zooms
(pyramid-wide max pixel weight); --weight-col switches count density to
weighted density; --linear switches the log1p intensity to linear.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True, help="parquet of point rows")
    ap.add_argument("--lon-col", default="lon")
    ap.add_argument("--lat-col", default="lat")
    ap.add_argument("--weight-col", default=None)
    ap.add_argument("--z-base", type=int, required=True)
    ap.add_argument("--z-min", type=int, default=0)
    ap.add_argument("--linear", action="store_true",
                    help="linear intensity instead of log1p")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--dst-format", default="dir", choices=("dir", "mbtiles"))
    ap.add_argument("--name", default="heatmap")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.z_min > args.z_base:
        raise SystemExit("--z-min must be <= --z-base")

    from tilers_tools_spark.functions import tilemath as tm
    from tilers_tools_spark.operators import heatmap as hm
    from tilers_tools_spark.session import get_spark

    spark = get_spark(app="heatmap_tiles", master=args.master)
    pts = spark.read.parquet(args.points).select(
        tm.merc_x(args.lon_col).alias("mx"),
        tm.merc_y(args.lat_col).alias("my"),
        *([args.weight_col] if args.weight_col else []),
    )
    tdf = hm.heatmap_pyramid(
        pts, z_base=args.z_base, z_min=args.z_min,
        weight_col=args.weight_col, log_scale=not args.linear,
    )
    if args.dst_format == "dir":
        from tilers_tools_spark.sources import tileset

        out = tileset.write_tileset_dir(tdf, args.dst, scheme="xyz", ext="png")
        tileset.write_tilejson(tdf, args.dst, name=args.name, ext="png",
                               scheme="xyz")
    else:
        from tilers_tools_spark.sources import mbtiles as mbt

        out = mbt.write_mbtiles(
            tdf, args.dst,
            metadata={"name": args.name, "format": "png"},
            single_file=True)
    n = tdf.count()
    print(json.dumps({"tiles": n, "out": out,
                      "z_base": args.z_base, "z_min": args.z_min}))
    spark.stop()


if __name__ == "__main__":
    main()
