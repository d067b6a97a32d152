"""spark-submit entry point — vector-tile publishing (the tippecanoe /
ogr2ogr-MVT role over the engine's point and polygon inputs):

    spark-submit --py-files dist/engine.zip jobs/vector_tiles.py \
        --points events.parquet --id-col event_id --lon-col lon --lat-col lat \
        --z 6 --dst out_dir --dst-format dir
    spark-submit ... jobs/vector_tiles.py \
        --polys regions.tsv --z 8 --dst out --dst-format mbtiles --single-file

--polys is a TSV of `poly_id<TAB>WKT` lon/lat polygons (the engine's
broadcast-polygon contract). dir output writes a `dest/z/x/y.pbf` tree
plus a vector TileJSON (tiles.json with `vector_layers`); mbtiles output
writes `metadata` rows `format=pbf` and the `json` vector_layers
document — the published MBTiles 1.3 vector-tileset convention.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--points", default=None, help="parquet of point rows")
    src.add_argument("--polys", default=None, help="TSV poly_id<TAB>WKT POLYGON")
    src.add_argument("--lines", default=None, help="TSV line_id<TAB>WKT LINESTRING")
    src.add_argument("--shp", default=None,
                     help="ESRI polygon shapefile (.shp; holes carried as extra rings)")
    src.add_argument("--geoparquet", default=None,
                     help="GeoParquet polygon file/dir (WKB geometry column per "
                          "the v1.0 'geo' footer; holes + multipolygon members "
                          "carried as extra rings)")
    ap.add_argument("--id-col", default="event_id")
    ap.add_argument("--lon-col", default="lon")
    ap.add_argument("--lat-col", default="lat")
    ap.add_argument("--z", type=int, required=True)
    ap.add_argument("--extent", type=int, default=4096)
    ap.add_argument("--cluster-px", type=float, default=0.0,
                    help="supercluster-style grid cluster radius in web-mercator pixels at this zoom (points only; 0 = off)")
    ap.add_argument("--simplify-px", type=float, default=0.0,
                    help="Douglas-Peucker tolerance in tile pixels at this zoom (polys/lines only; 0 = off)")
    ap.add_argument("--layer", default=None, help="layer name (default points/polys)")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--dst-format", default="dir", choices=("dir", "mbtiles"))
    ap.add_argument("--single-file", action="store_true")
    ap.add_argument("--name", default="vtiles")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tilers_tools_spark.operators import vectortiles as vt
    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources import mbtiles as mbt
    from tilers_tools_spark.sources import tileset

    spark = get_spark(app="vector_tiles", master=args.master)
    if args.points:
        layer = args.layer or "points"
        pts = spark.read.parquet(args.points)
        if args.cluster_px > 0:
            tiles = vt.clustered_point_vector_tiles(
                pts, args.z, args.cluster_px, extent=args.extent,
                layer_name=layer, id_col=args.id_col,
                lon_col=args.lon_col, lat_col=args.lat_col,
            )
        else:
            tiles = vt.point_vector_tiles(
                pts, args.z, extent=args.extent, layer_name=layer,
                id_col=args.id_col, lon_col=args.lon_col, lat_col=args.lat_col,
            )
    else:
        if args.shp:
            # driver-side parse under the same small-broadcast-side
            # contract as the TSV path; fid becomes poly_id, multi-ring
            # records keep their holes (even-odd downstream)
            from tilers_tools_spark.sources import shapefile as shpf

            with open(args.shp, "rb") as f:
                _hdr, recs = shpf.parse_shp(f.read())
            rows = []
            for fid, kind, _hz, parts in recs:
                if kind != "polygon" or not parts:
                    continue
                rings_txt = ", ".join(
                    "(" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + ")"
                    for ring in parts
                )
                rows.append((str(fid), f"POLYGON ({rings_txt})"))
        elif args.geoparquet:
            # driver-side parse under the same small-broadcast-side
            # contract; the 'geo' footer picks the geometry column, holes
            # and multipolygon members become extra rings (even-odd)
            import glob as _glob
            import os as _os

            import pyarrow.parquet as pq

            from tilers_tools_spark.sources import geoparquet as gpq

            files = (sorted(_glob.glob(_os.path.join(args.geoparquet, "*.parquet")))
                     if _os.path.isdir(args.geoparquet) else [args.geoparquet])
            meta = pq.read_schema(files[0]).metadata or {}
            gcol = "geometry"
            if b"geo" in meta:
                gcol = json.loads(meta[b"geo"]).get("primary_column", "geometry")
            rows = []
            for fpath in files:
                tab = pq.read_table(fpath)
                names = tab.column_names
                ids = (tab[args.id_col].to_pylist() if args.id_col in names
                       else range(len(rows), len(rows) + tab.num_rows))
                for pid, blob in zip(ids, tab[gcol].to_pylist()):
                    comps, _srid = gpq.parse_wkb(bytes(blob))
                    rings = [r for kind, _hz, _hole, r in comps
                             if kind in ("polygon", "multipolygon")]
                    if not rings:
                        continue
                    rings_txt = ", ".join(
                        "(" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + ")"
                        for ring in rings
                    )
                    rows.append((str(pid), f"POLYGON ({rings_txt})"))
        else:
            path = args.polys or args.lines
            rows = []
            with open(path) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if line:
                        pid, wkt = line.split("\t", 1)
                        rows.append((pid, wkt))
        if args.polys or args.shp or args.geoparquet:
            layer = args.layer or "polys"
            tiles = vt.polygon_vector_tiles(
                spark, rows, args.z, extent=args.extent, layer_name=layer,
                simplify_px=args.simplify_px,
            )
        else:
            layer = args.layer or "lines"
            tiles = vt.line_vector_tiles(
                spark, rows, args.z, extent=args.extent, layer_name=layer,
                simplify_px=args.simplify_px,
            )
    fields = {} if args.points else ({"poly_id": "String"} if (args.polys or args.shp or args.geoparquet) else {"line_id": "String"})
    vector_layers = [{"id": layer, "fields": fields}]
    tdf = tiles.select("z", "x", "y", "tile")
    if args.dst_format == "dir":
        tileset.write_tileset_dir(tdf, args.dst, scheme="xyz", ext="pbf")
        tj = tileset.write_tilejson(tdf, args.dst, name=args.name, ext="pbf", scheme="xyz")
        doc = json.load(open(tj))
        doc["vector_layers"] = vector_layers
        with open(tj, "w") as f:
            json.dump(doc, f, sort_keys=True)
        out = args.dst
    else:
        out = mbt.write_mbtiles(
            tdf,
            args.dst,
            metadata={
                "name": args.name,
                "format": "pbf",
                "json": json.dumps({"vector_layers": vector_layers}),
            },
            single_file=args.single_file,
        )
    n = tdf.count()
    print(json.dumps({"tiles": n, "out": out, "layer": layer}))
    spark.stop()


if __name__ == "__main__":
    main()
