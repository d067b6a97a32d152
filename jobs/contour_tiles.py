"""contour_tiles: DEM GeoTIFF table -> contour-line Mapbox Vector Tiles.

Closes the raster->vector->serving loop inside one engine: the
gdal_contour parity operator (distributed marching squares + canonical
polyline chaining, operators/terrain.py::contour_lines include_wkt=True)
feeds the MVT line builder (operators/vectortiles.py::line_vector_tiles)
and the tile tree + TileJSON writers — the job `gdal_contour | tippecanoe`
pipelines with two tools and an intermediate GeoJSON dump, in one
spark-submit.

Scale shape: contouring is the distributed pass (one Arrow pass per
raster, shuffle-free); the traced polylines are the SMALL side (vector
contours of a chart set are KBs against GBs of raster) and follow the
engine's broadcast-geometry contract into the tile builder. Georef is a
tags-only pass — pixel strips are never decompressed twice.

Usage:
  spark-submit --py-files dist/engine.zip jobs/contour_tiles.py \
      --dems /data/dems.parquet --levels 100,200,500 --z 9 \
      --dst /tiles/contours [--simplify-px 1.0] [--master local[8]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dems", required=True, help="parquet of (image_id, bytes[, fmt]) GeoTIFF rows")
    ap.add_argument("--levels", required=True, help="comma-separated contour levels")
    ap.add_argument("--z", type=int, required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--layer", default="contours")
    ap.add_argument("--simplify-px", type=float, default=0.0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tilers_tools_spark.functions import tilemath as tm
    from tilers_tools_spark.operators import vectortiles as vt
    from tilers_tools_spark.operators.terrain import contour_lines
    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources import tileset

    spark = get_spark(app="contour_tiles", master=args.master)
    dems = spark.read.parquet(args.dems)
    levels = [float(x) for x in args.levels.split(",")]

    # tags-only georef pass (pixel strips untouched)
    def georef_fn(it):
        import pandas as pd

        from tilers_tools_spark.functions import tiffcodec

        for pdf in it:
            rows = {"image_id": [], "gsd": [], "mx0": [], "my1": [], "epsg": []}
            for r in pdf.itertuples():
                info = tiffcodec.read_tiff_tags(bytes(r.bytes))
                g = info["geo"]
                if g is None or g.get("epsg") != 3857:
                    continue  # fail-loud convention: un-georeferenced rows skipped, reported below
                rows["image_id"].append(r.image_id)
                rows["gsd"].append(g["gsd"])
                rows["mx0"].append(g["mx0"])
                rows["my1"].append(g["my1"])
                rows["epsg"].append(int(g["epsg"]))
            yield pd.DataFrame(rows)

    geo = {
        r["image_id"]: r
        for r in dems.select("image_id", "bytes").mapInPandas(
            georef_fn, schema="image_id string, gsd double, mx0 double, my1 double, epsg int"
        ).collect()
    }
    n_skipped = dems.count() - len(geo)

    # distributed contouring; traced polylines are the small vector side
    wkt_rows = contour_lines(dems, levels, include_wkt=True).where(
        F.col("line_idx") >= 0
    ).collect()

    import numpy as np

    lines = []
    for r in wkt_rows:
        g = geo.get(r["image_id"])
        if g is None:
            continue
        body = r["wkt"][r["wkt"].index("(") + 1 : r["wkt"].rindex(")")]
        px = np.array([[float(v) for v in tok.split()] for tok in body.split(",")])
        mx = g["mx0"] + g["gsd"] * px[:, 0]
        my = g["my1"] - g["gsd"] * px[:, 1]
        lon = mx * (180.0 / tm.ORIGIN)
        lat = np.degrees(2.0 * np.arctan(np.exp(my / 6378137.0)) - np.pi / 2.0)
        wkt = "LINESTRING (" + ", ".join(f"{a} {b}" for a, b in zip(lon, lat)) + ")"
        lines.append((f"{r['image_id']}/{r['level']:g}/{r['line_idx']}", wkt))

    tiles = vt.line_vector_tiles(
        spark, lines, args.z, layer_name=args.layer, simplify_px=args.simplify_px
    )
    tdf = tiles.select("z", "x", "y", "tile")
    tileset.write_tileset_dir(tdf, args.dst, scheme="xyz", ext="pbf")
    tj = tileset.write_tilejson(tdf, args.dst, name=args.layer, ext="pbf", scheme="xyz")
    doc = json.load(open(tj))
    doc["vector_layers"] = [{"id": args.layer, "fields": {"line_id": "String"}}]
    with open(tj, "w") as f:
        json.dump(doc, f, sort_keys=True)
    n_tiles = tdf.count()
    print(json.dumps({
        "dst": args.dst, "z": args.z, "n_lines": len(lines),
        "n_tiles": int(n_tiles), "rasters_skipped_no_georef": int(n_skipped),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
