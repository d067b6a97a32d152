"""spark-submit entry point — DEM ingestion: convert a directory of
SRTM .hgt tiles and/or ESRI ASCII grids (.asc + same-stem .prj) into
the engine's raster table (``image_id string, kind string, bytes
binary`` Float32 GeoTIFF blobs), the input shape every jobs/gdal_utils.py
subcommand consumes.

    spark-submit --py-files dist/engine.zip jobs/dem_ingest.py \
        --src /data/dem --out /data/dem_table.parquet

Georef mapping:
* ``.hgt`` — filename georef (SW corner), EPSG:4326 GeoTIFF with the
  edge-inclusive 1/(n-1) degree step; chain ``gdal_utils warp --src
  4326`` to land in the EPSG:3857 north-up contract.
* ``.asc`` — EPSG:3857 GeoTIFF when the same-stem .prj declares 3857;
  otherwise a georef-less TIFF (grid-space consumers only), per the
  engine's no-undeclared-CRS policy.

Unreadable files become (image_id, kind, NULL) rows — kept, auditable.
One Arrow pass per file; blobs never shuffle.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="directory of .hgt / .asc(+.prj) files")
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--any-square",
        action="store_true",
        help="accept non-published .hgt grid sizes (synthetic fixtures only)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tilers_tools_spark.session import get_spark

    spark = get_spark(app="dem_ingest", master=args.master)
    any_square = args.any_square
    out = None

    hgts = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.hgt")
        .option("recursiveFileLookup", "true")
        .load(args.src)
    )
    if not hgts.isEmpty():

        def hgt_fn(it):
            import pandas as pd

            from tilers_tools_spark.functions import hgt, tiffcodec

            for pdf in it:
                rows = []
                for path, blob in zip(pdf["path"], pdf["content"]):
                    name = str(path).rsplit("/", 1)[-1]
                    try:
                        arr = hgt.decode_hgt(bytes(blob), any_square=any_square)
                        g = hgt.hgt_georef(name, arr.shape[0])
                        tif = tiffcodec.encode_tiff(
                            arr.astype("float32"),
                            geo={
                                "gsd": g["step_deg"],
                                "mx0": g["lon0"],
                                "my1": g["lat1"],
                                "epsg": 4326,
                            },
                            compression="deflate",
                        )
                    except Exception:
                        tif = None
                    rows.append((name, "hgt", tif))
                yield pd.DataFrame(rows, columns=["image_id", "kind", "bytes"])

        g = hgts.select("path", "content").mapInPandas(
            hgt_fn, schema="image_id string, kind string, bytes binary"
        )
        out = g

    ascs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.asc")
        .option("recursiveFileLookup", "true")
        .load(args.src)
    )
    if not ascs.isEmpty():
        stem = lambda c: F.regexp_replace(c, r"\.[^.]+$", "")  # noqa: E731
        prjs = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.prj")
            .option("recursiveFileLookup", "true")
            .load(args.src)
            .select(stem(F.col("path")).alias("_stem"), F.col("content").cast("string").alias("_prj"))
        )
        joined = ascs.select(
            "path", stem(F.col("path")).alias("_stem"), "content"
        ).join(prjs, "_stem", "left")

        def asc_fn(it):
            import pandas as pd

            from tilers_tools_spark.functions import aaigrid, tiffcodec

            for pdf in it:
                rows = []
                for path, blob, prj in zip(pdf["path"], pdf["content"], pdf["_prj"]):
                    name = str(path).rsplit("/", 1)[-1]
                    try:
                        arr, meta = aaigrid.parse_aaigrid(bytes(blob))
                        try:
                            g = aaigrid.aaigrid_georef(meta, prj)
                            geo = {"gsd": g["gsd"], "mx0": g["mx0"], "my1": g["my1"], "epsg": 3857}
                        except Exception:
                            geo = None  # undeclared CRS: grid-space TIFF
                        tif = tiffcodec.encode_tiff(
                            arr.astype("float32"), geo=geo, compression="deflate"
                        )
                    except Exception:
                        tif = None
                    rows.append((name, "aaigrid", tif))
                yield pd.DataFrame(rows, columns=["image_id", "kind", "bytes"])

        g = joined.select("path", "content", "_prj").mapInPandas(
            asc_fn, schema="image_id string, kind string, bytes binary"
        )
        out = g if out is None else out.unionByName(g)

    xyzs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xyz")
        .option("recursiveFileLookup", "true")
        .load(args.src)
    )
    if not xyzs.isEmpty():

        def xyz_fn(it):
            import pandas as pd

            from tilers_tools_spark.functions import tiffcodec, xyzgrid

            for pdf in it:
                rows = []
                for path, blob in zip(pdf["path"], pdf["content"]):
                    name = str(path).rsplit("/", 1)[-1]
                    try:
                        arr, _meta = xyzgrid.parse_xyz_grid(bytes(blob))
                        # the format declares no CRS: grid-space TIFF only
                        tif = tiffcodec.encode_tiff(
                            arr.astype("float32"), compression="deflate"
                        )
                    except Exception:
                        tif = None
                    rows.append((name, "xyz", tif))
                yield pd.DataFrame(rows, columns=["image_id", "kind", "bytes"])

        g = xyzs.select("path", "content").mapInPandas(
            xyz_fn, schema="image_id string, kind string, bytes binary"
        )
        out = g if out is None else out.unionByName(g)

    hdrs = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.hdr")
        .option("recursiveFileLookup", "true")
        .load(args.src)
    )
    if not hdrs.isEmpty():
        stem2 = lambda c: F.regexp_replace(c, r"\.[^.]+$", "")  # noqa: E731
        raws = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.{img,bin,dat,raw}")
            .option("recursiveFileLookup", "true")
            .load(args.src)
            .select(stem2(F.col("path")).alias("_stem"), F.col("content").alias("_raw"))
        )
        joined = hdrs.select(
            "path", stem2(F.col("path")).alias("_stem"), "content"
        ).join(raws, "_stem", "inner")

        def envi_fn(it):
            import numpy as _np
            import pandas as pd

            from tilers_tools_spark.functions import envi, tiffcodec

            for pdf in it:
                rows = []
                for path, hdr, raw in zip(pdf["path"], pdf["content"], pdf["_raw"]):
                    name = str(path).rsplit("/", 1)[-1]
                    try:
                        arr, meta = envi.decode_envi(bytes(hdr), bytes(raw))
                        band0 = arr if arr.ndim == 2 else arr[:, :, 0]
                        # map-info anchor carries no declared EPSG:
                        # grid-space TIFF (band 0; multiband kept out of
                        # the single-band DEM table by contract)
                        tif = tiffcodec.encode_tiff(
                            _np.asarray(band0, dtype="float32"), compression="deflate"
                        )
                    except Exception:
                        tif = None
                    rows.append((name, "envi", tif))
                yield pd.DataFrame(rows, columns=["image_id", "kind", "bytes"])

        g = joined.select("path", "content", "_raw").mapInPandas(
            envi_fn, schema="image_id string, kind string, bytes binary"
        )
        out = g if out is None else out.unionByName(g)

    if out is None:
        print(json.dumps({"rows": 0, "failed": 0, "out": args.out}))
        spark.stop()
        return
    out.write.mode("overwrite").parquet(args.out)
    res = spark.read.parquet(args.out)
    n = res.count()
    failed = res.filter(F.col("bytes").isNull()).count()
    print(json.dumps({"rows": n, "failed": failed, "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
