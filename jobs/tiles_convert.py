"""spark-submit entry point — the tiles_convert role (SURVEY.md §2.4,
reference CLI parity: `tiles_convert.py --from=<fmt> --to=<fmt> src dst`):

    spark-submit --py-files dist/engine.zip jobs/tiles_convert.py \
        --src <dir|.mbtiles|catalog_root> --src-format dir|mbtiles|table \
        --src-scheme xyz --dst <path> --dst-format dir|mbtiles \
        --dst-scheme tms [--transcode jpeg] [--single-file]

Container conversion never touches pixel bytes unless --transcode is set
(SURVEY.md §3.2 E2': one narrow projection stage).
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--src-format", default="dir", choices=("dir", "mbtiles", "rmaps", "gpkg", "osmdroid", "pmtiles", "table"))
    ap.add_argument("--src-scheme", default="xyz", choices=("xyz", "tms", "zyx"))
    ap.add_argument("--dst", required=True)
    ap.add_argument("--dst-format", default="mbtiles", choices=("dir", "mbtiles", "rmaps", "gpkg", "osmdroid", "pmtiles", "kml"))
    ap.add_argument("--dst-scheme", default="xyz", choices=("xyz", "tms", "zyx", "zoomify"))
    ap.add_argument("--transcode", default=None, choices=(None, "png", "jpeg", "raw", "tiff", "webp", "bmp", "gif"))
    ap.add_argument("--src-fmt-blob", default="png", help="blob codec of the source tiles (for --transcode)")
    ap.add_argument(
        "--jpeg-subsampling", default="444", choices=("444", "420"),
        help="chroma layout for --transcode jpeg (420 = ~25-40%% smaller photographic tiles)",
    )
    ap.add_argument("--single-file", action="store_true", help="merge MBTiles shards into one file")
    ap.add_argument(
        "--dedup",
        action="store_true",
        help="MBTiles dst only: deduplicated map+images layout (tiles as a view)",
    )
    ap.add_argument(
        "--lint",
        action="store_true",
        help="validate source keys (dup/range/orphan pyramid lint) and abort on violations",
    )
    ap.add_argument("--overzoom-to", type=int, default=None,
                    help="materialize this zoom from shallower source tiles (quarter-crop + nearest upscale, depth <= 4) before writing")
    ap.add_argument("--name", default="tiles")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tilers_tools_spark.operators import convert
    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources import mbtiles as mbt
    from tilers_tools_spark.sources import tileset
    from tilers_tools_spark.sources.catalog import Catalog

    spark = get_spark(app="tiles_convert", master=args.master)
    if args.src_format == "dir":
        tiles = tileset.read_tileset_dir(spark, args.src, scheme=args.src_scheme)
    elif args.src_format == "mbtiles":
        tiles = mbt.read_mbtiles(spark, args.src)
    elif args.src_format == "rmaps":
        from tilers_tools_spark.sources import rmaps

        tiles = rmaps.read_rmaps(spark, args.src)
    elif args.src_format == "gpkg":
        from tilers_tools_spark.sources import gpkg

        tiles = gpkg.read_gpkg(spark, args.src)
    elif args.src_format == "osmdroid":
        from tilers_tools_spark.sources import osmdroid

        tiles = osmdroid.read_osmdroid(spark, args.src)
    elif args.src_format == "pmtiles":
        import glob as _glob
        import os as _os

        from tilers_tools_spark.sources import pmtiles as pmt

        paths = (
            sorted(_glob.glob(_os.path.join(args.src, "part-*.pmtiles")))
            if _os.path.isdir(args.src) else [args.src]
        )
        if not paths:
            raise SystemExit(f"tiles_convert: no .pmtiles archives under {args.src}")
        tiles = pmt.read_pmtiles(spark, paths[0]).drop("tileid")
        for p in paths[1:]:
            tiles = tiles.unionByName(pmt.read_pmtiles(spark, p).drop("tileid"))
    else:
        tiles = Catalog(spark, args.src).read("tiles").select("z", "x", "y", "tile")
    if args.lint:
        from pyspark.sql import functions as F

        from tilers_tools_spark.operators import check as tcheck

        bad = (
            tcheck.tileset_check(tiles)
            .groupBy("issue")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        if bad:
            print(json.dumps({"lint": {r["issue"]: int(r["n"]) for r in bad}}))
            raise SystemExit("tiles_convert: tile-set lint failed (see counts above)")
    if args.overzoom_to is not None:
        tiles = convert.overzoom_tiles(tiles, args.overzoom_to)
    if args.transcode:
        tiles = convert.transcode(
            tiles, src_fmt=args.src_fmt_blob, dst_fmt=args.transcode,
            subsampling=args.jpeg_subsampling,
        )
        out_fmt = args.transcode
    else:
        # pass-through: label what is ACTUALLY inside the blobs (magic-byte
        # sniff) rather than trusting a flag default. Single-container
        # assumption: a tile SET has one codec; we validate over a 64-tile
        # sample (one bounded driver job) and fail loudly on a mixed set
        # (e.g. merged PNG+JPEG sources) instead of mislabeling every
        # extension. A set mixed only beyond the sample is undetected —
        # use --transcode to force a uniform container in that case.
        from tilers_tools_spark.functions import codecs

        heads = tiles.select("tile").head(64)
        if heads:
            fmts = {codecs.sniff_fmt(bytes(r["tile"])) for r in heads}
            if len(fmts) > 1:
                raise SystemExit(
                    f"tiles_convert: mixed tile containers in pass-through mode {sorted(fmts)}; "
                    "re-run with --transcode to unify the codec"
                )
            out_fmt = fmts.pop()
        else:
            out_fmt = args.src_fmt_blob
    # sniff_fmt can return png/jpeg/raw/tiff/webp — name files for what the
    # blobs actually are (a TIFF blob in a *.png file breaks consumers)
    ext = {"jpeg": "jpg", "raw": "raw", "tiff": "tif", "webp": "webp", "pnm": "pnm", "bmp": "bmp", "gif": "gif"}.get(out_fmt, "png")
    if args.dst_format == "dir":
        tileset.write_tileset_dir(tiles, args.dst, scheme=args.dst_scheme, ext=ext)
        tileset.write_tilemap_xml(tiles, args.dst, title=args.name, ext=ext)
        if args.dst_scheme in ("xyz", "tms"):  # gdal2tiles -w leaflet/openlayers role
            tileset.write_leaflet_html(
                tiles, args.dst, title=args.name, ext=ext, scheme=args.dst_scheme
            )
            tileset.write_openlayers_html(
                tiles, args.dst, title=args.name, ext=ext, scheme=args.dst_scheme
            )
            tileset.write_tilejson(
                tiles, args.dst, name=args.name, ext=ext, scheme=args.dst_scheme
            )
        if args.dst_scheme == "xyz":  # WMTS TileRow is top-down = xyz layout
            tileset.write_wmts_capabilities(tiles, args.dst, name=args.name, ext=ext)
        out = args.dst
    elif args.dst_format == "kml":
        # Google-Earth SuperOverlay: xyz image tree + per-tile KML docs +
        # root doc.kml (the reference toolchain's KML output mode)
        tileset.write_tileset_dir(tiles, args.dst, scheme="xyz", ext=ext)
        tileset.write_superoverlay_kml(tiles, args.dst, ext=ext, name=args.name)
        out = args.dst
    elif args.dst_format == "rmaps":
        from tilers_tools_spark.sources import rmaps

        out = rmaps.write_rmaps(tiles, args.dst, single_file=args.single_file)
    elif args.dst_format == "gpkg":
        from tilers_tools_spark.sources import gpkg

        out = gpkg.write_gpkg(tiles, args.dst, single_file=args.single_file)
    elif args.dst_format == "osmdroid":
        from tilers_tools_spark.sources import osmdroid

        out = osmdroid.write_osmdroid(tiles, args.dst, provider=args.name, single_file=args.single_file)
    elif args.dst_format == "pmtiles":
        from tilers_tools_spark.sources import pmtiles as pmt

        if args.single_file:
            out = pmt.write_pmtiles(
                tiles, args.dst, metadata={"name": args.name, "format": ext}
            )
        else:
            out = pmt.write_pmtiles_shards(
                tiles, args.dst,
                n_shards=max(spark.sparkContext.defaultParallelism, 1),
                metadata={"name": args.name, "format": ext},
            )
    else:
        out = mbt.write_mbtiles(
            tiles,
            args.dst,
            metadata={"name": args.name, "format": ext},
            single_file=args.single_file,
            dedup=args.dedup,
        )
    n = tiles.count()
    print(json.dumps({"tiles": n, "out": out}))
    spark.stop()


if __name__ == "__main__":
    main()
