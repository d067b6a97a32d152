"""spark-submit entry point — the tiles_merge role (SURVEY.md §2.4 row 24):
union of two tile sets; colliding (z,x,y) keys src-over alpha-composited
(overlay on top of base).

    spark-submit --py-files dist/engine.zip jobs/tiles_merge.py \
        --base <dir> --overlay <dir> --out <dir> [--scheme xyz]
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--overlay", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scheme", default="xyz", choices=("xyz", "tms", "zyx"))
    ap.add_argument("--out-format", default="dir", choices=("dir", "mbtiles"))
    ap.add_argument("--name", default="merged")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tilers_tools_spark.operators.convert import merge_tilesets
    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources import mbtiles as mbt
    from tilers_tools_spark.sources import tileset

    spark = get_spark(app="tiles_merge", master=args.master)
    base = tileset.read_tileset_dir(spark, args.base, scheme=args.scheme)
    over = tileset.read_tileset_dir(spark, args.overlay, scheme=args.scheme)
    merged = merge_tilesets(base, over)
    if args.out_format == "dir":
        tileset.write_tileset_dir(merged, args.out, scheme=args.scheme)
        tileset.write_tilemap_xml(merged, args.out, title=args.name)
        out = args.out
    else:
        out = mbt.write_mbtiles(merged, args.out, metadata={"name": args.name}, single_file=True)
    print(json.dumps({"tiles": merged.count(), "out": out}))
    spark.stop()


if __name__ == "__main__":
    main()
