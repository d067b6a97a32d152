"""spark-submit entry point — the map2gdal role (SURVEY.md §2.1 rows 7-9):
parse chart georeferencing headers (OziExplorer .map, BSB/KAP, GEO/NOS
sidecar, KML GroundOverlay) into a georef table, distributed via Spark's
binaryFile source + the Arrow parser UDFs in functions/georef_parsers.py.

    spark-submit --py-files dist/engine.zip jobs/map2gdal.py \
        --charts '/data/charts' --out /data/georef.parquet

Output schema: (path, kind, w, h, gsd, mx0, my0, mx1, my1) — the engine
georef box (SURVEY.md §1.5 shape); rows whose header fails to parse carry
NaN georef (kept, so failures are auditable).
"""

from __future__ import annotations

import argparse
import json

_KIND_OF_EXT = {
    "map": "ozi",
    "kap": "kap",
    "geo": "geo",
    "kml": "kml",
    # GeoTIFF georef comes from the raster's own tags (functions/tiffcodec)
    "tif": "geotiff",
    "tiff": "geotiff",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--charts", required=True, help="directory of .map/.kap/.geo/.kml files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--width", type=int, default=1024, help="raster width when no sidecar dimensions exist")
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tilers_tools_spark.functions.georef_parsers import parse_georef_udf
    from tilers_tools_spark.session import get_spark

    spark = get_spark(app="map2gdal", master=args.master)
    out = None
    for ext, kind in _KIND_OF_EXT.items():
        df = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", f"*.{ext}")
            .option("recursiveFileLookup", "true")
            .load(args.charts)
        )
        if df.isEmpty():
            continue
        header = (
            F.col("content") if kind in ("kap", "geotiff") else F.col("content").cast("string")
        )
        if kind == "geotiff":
            # the raster carries its own dimensions — emit the real w/h
            # (a tags-only parse; --width/--height are sidecar defaults)
            from tilers_tools_spark.functions.georef_parsers import tiff_dims_udf

            df = df.withColumn("dims", tiff_dims_udf()(F.col("content")))
            wcol, hcol = F.col("dims.w"), F.col("dims.h")
        else:
            wcol, hcol = F.lit(args.width), F.lit(args.height)
        g = df.select(
            "path",
            F.lit(kind).alias("kind"),
            wcol.alias("w"),
            hcol.alias("h"),
            parse_georef_udf(kind)(header, wcol, hcol).alias("georef"),
        ).select("path", "kind", "w", "h", "georef.*")
        out = g if out is None else out.unionByName(g)
    # world-file sidecars (png+world driver, SURVEY.md §2.1 row 1): the
    # 6-line affine lives in *.wld/*.pgw/*.jgw/*.tfw next to the raster and
    # the CRS in a same-stem .prj — join the two sidecar sets on the stem
    # (a tiny file-listing join; broadcast by AQE)
    from tilers_tools_spark.functions.georef_parsers import parse_world_udf

    worlds = (
        spark.read.format("binaryFile")
        # Hadoop glob alternation: one listing + one action for all four
        # world-file spellings (they all feed the same parser)
        .option("pathGlobFilter", "*.{wld,pgw,jgw,tfw}")
        .option("recursiveFileLookup", "true")
        .load(args.charts)
    )
    if not worlds.isEmpty():
        stem = lambda c: F.regexp_replace(c, r"\.[^.]+$", "")  # noqa: E731
        prjs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.prj")
            .option("recursiveFileLookup", "true")
            .load(args.charts)
            .select(stem(F.col("path")).alias("_stem"), F.col("content").cast("string").alias("_prj"))
        )
        w = worlds.select(
            "path", stem(F.col("path")).alias("_stem"), F.col("content").cast("string").alias("_world")
        ).join(prjs, "_stem", "left")
        wcol, hcol = F.lit(args.width), F.lit(args.height)
        g = w.select(
            "path",
            F.lit("world").alias("kind"),
            wcol.alias("w"),
            hcol.alias("h"),
            parse_world_udf()(F.col("_world"), F.col("_prj"), wcol, hcol).alias("georef"),
        ).select("path", "kind", "w", "h", "georef.*")
        out = g if out is None else out.unionByName(g)
    # ESRI ASCII grids (.asc): real dimensions from the header; the CRS
    # comes from a same-stem .prj (same EPSG:3857 gate as world files)
    from tilers_tools_spark.functions.aaigrid import aaigrid_georef_udf

    ascs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.asc")
        .option("recursiveFileLookup", "true")
        .load(args.charts)
    )
    if not ascs.isEmpty():
        stem = lambda c: F.regexp_replace(c, r"\.[^.]+$", "")  # noqa: E731
        prjs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.prj")
            .option("recursiveFileLookup", "true")
            .load(args.charts)
            .select(stem(F.col("path")).alias("_stem"), F.col("content").cast("string").alias("_prj"))
        )
        a = ascs.select(
            "path", stem(F.col("path")).alias("_stem"), F.col("content").cast("string").alias("_asc")
        ).join(prjs, "_stem", "left")
        g = a.withColumn("g", aaigrid_georef_udf()(F.col("_asc"), F.col("_prj"))).select(
            "path",
            F.lit("aaigrid").alias("kind"),
            F.coalesce(F.col("g.w"), F.lit(0)).alias("w"),
            F.coalesce(F.col("g.h"), F.lit(0)).alias("h"),
            F.col("g.gsd").alias("gsd"),
            F.col("g.mx0").alias("mx0"),
            F.col("g.my0").alias("my0"),
            F.col("g.mx1").alias("mx1"),
            F.col("g.my1").alias("my1"),
        )
        out = g if out is None else out.unionByName(g)
    if out is None:
        print(json.dumps({"charts": 0, "out": args.out}))
        spark.stop()
        return
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"charts": n, "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
