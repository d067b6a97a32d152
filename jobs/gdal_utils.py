"""spark-submit entry point — the GDAL-utility toolbox over a raster
table (parquet of ``image_id string, bytes binary`` GeoTIFF blobs), one
subcommand per utility family this engine implements as table operators:

    spark-submit --py-files dist/engine.zip jobs/gdal_utils.py \
        info      --images img.parquet --out rep.parquet
        tindex    --images img.parquet --out idx.parquet
        addo      --images img.parquet --out cogs.parquet \
                  [--levels 2,4] [--resample average|nearest] \
                  [--tile 256] [--cog]
        cogcheck  --images img.parquet --out chk.parquet [--threshold 512]
        buildvrt  --images img.parquet --out vrt.parquet \
                  [--group-col vrt_group] [--resolution average|highest|lowest]
        warp      --images img.parquet --out warped.parquet \
                  [--src 4326|utm] [--resample bilinear|nearest] [--out-gsd G]
        hillshade --images img.parquet --out shade.parquet \
                  [--mode standard|combined|multidirectional] \
                  [--azimuth 315] [--altitude 45] [--z-factor 1]
        terrainrgb --images img.parquet --out trgb.parquet \
                  [--encoding terrarium|mapbox]

Each prints ONE JSON metrics line ({"rows": N, "out": path}). All the
underlying operators are per-raster Arrow passes — the CLI is a thin
argparse shim over the same code the driver gate verifies.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--images", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("--master", default=None)

    common(sub.add_parser("info"))
    common(sub.add_parser("tindex"))
    p = sub.add_parser("addo"); common(p)
    p.add_argument("--levels", default="2,4")
    p.add_argument("--resample", default="average", choices=("average", "nearest"))
    p.add_argument("--tile", type=int, default=None)
    p.add_argument("--cog", action="store_true")
    p = sub.add_parser("cogcheck"); common(p)
    p.add_argument("--threshold", type=int, default=512)
    p = sub.add_parser("buildvrt"); common(p)
    p.add_argument("--group-col", default="vrt_group")
    p.add_argument("--xml-dir", default=None,
                   help="also write one GDAL .vrt XML document per clean group")
    p.add_argument("--resolution", default="average",
                   choices=("average", "highest", "lowest"))
    p = sub.add_parser("warp"); common(p)
    p.add_argument("--src", default="utm", choices=("4326", "utm"))
    p.add_argument("--resample", default="bilinear", choices=("bilinear", "nearest"))
    p.add_argument("--out-gsd", type=float, default=None)
    p = sub.add_parser("hillshade"); common(p)
    p.add_argument("--mode", default="standard",
                   choices=("standard", "combined", "multidirectional"))
    p.add_argument("--azimuth", type=float, default=315.0)
    p.add_argument("--altitude", type=float, default=45.0)
    p.add_argument("--z-factor", type=float, default=1.0)
    p = sub.add_parser("terrainrgb"); common(p)
    p.add_argument("--encoding", default="terrarium", choices=("terrarium", "mapbox"))
    args = ap.parse_args()

    from tilers_tools_spark.session import get_spark

    spark = get_spark(app=f"gdal_utils_{args.cmd}", master=args.master)
    images = spark.read.parquet(args.images)

    if args.cmd == "info":
        from tilers_tools_spark.operators.info import raster_info

        out = raster_info(images)
    elif args.cmd == "tindex":
        from tilers_tools_spark.operators.info import raster_tindex

        out = raster_tindex(images)
    elif args.cmd == "addo":
        from tilers_tools_spark.operators.translate import build_overviews

        out = build_overviews(
            images,
            levels=tuple(int(x) for x in args.levels.split(",")),
            resample=args.resample,
            tile=args.tile,
            cog_layout=args.cog,
        )
    elif args.cmd == "cogcheck":
        from tilers_tools_spark.operators.info import cog_check

        out = cog_check(images, overview_threshold=args.threshold)
    elif args.cmd == "buildvrt":
        from tilers_tools_spark.operators.info import vrt_build, vrt_xml

        out = vrt_build(images, group_col=args.group_col,
                        resolution=args.resolution)
        if args.xml_dir:
            # gdalbuildvrt's actual artifact: one .vrt document per clean
            # group. One tiny row per group — a driver collect is the
            # right scale (the placement table itself ships via --out).
            # cache: the placement feeds BOTH the collect here and the
            # parquet write below — without it the whole binaryFile scan
            # + tags parse + group shuffle would run twice.
            import os as _os

            out = out.cache()
            _os.makedirs(args.xml_dir, exist_ok=True)
            for r in vrt_xml(out, group_col=args.group_col).collect():
                safe = str(r[args.group_col]).replace(_os.sep, "_")
                with open(_os.path.join(args.xml_dir, f"{safe}.vrt"), "w") as f:
                    f.write(r["vrt_xml"])
    elif args.cmd == "warp":
        from tilers_tools_spark.operators.translate import (
            reproject_4326,
            reproject_utm,
        )

        fn = reproject_4326 if args.src == "4326" else reproject_utm
        out = fn(images, out_gsd=args.out_gsd, resample=args.resample)
    elif args.cmd == "terrainrgb":
        from tilers_tools_spark.operators.terrain import dem_terrain_rgb

        out = dem_terrain_rgb(images, encoding=args.encoding)
    else:  # hillshade
        from tilers_tools_spark.operators.terrain import dem_hillshade

        out = dem_hillshade(
            images, azimuth=args.azimuth, altitude=args.altitude,
            z_factor=args.z_factor, mode=args.mode,
        )

    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"rows": n, "out": args.out}))


if __name__ == "__main__":
    main()
