"""spark-submit entry point (BASELINE.json:6 'spark-submit --py-files'):

    python tools/make_dist.py   # builds dist/engine.zip
    spark-submit --master local[32] --py-files dist/engine.zip \
        jobs/tile_pyramid.py --images <parquet> --out <catalog_root> \
        --run-id r1 --parts 64

Runs the E1' pipeline (plans/tile_pyramid.run) with idempotent resume.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--overviews", type=int, default=2)
    ap.add_argument("--resampling", default="average", choices=("average", "antialias", "nearest"))
    ap.add_argument(
        "--base-resampling", default="bilinear", choices=("bilinear", "cubic", "lanczos", "nearest")
    )
    ap.add_argument("--profile", default="mercator", choices=("mercator", "geodetic"),
                    help="tile grid: EPSG:3857 mercator or global-geodetic plate-carree "
                         "(gdal2tiles --profile geodetic)")
    ap.add_argument("--no-stage-input", action="store_true",
                    help="skip the partitioned staging write (input already partitioned by part)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tilers_tools_spark.session import get_spark
    from tilers_tools_spark.sources.catalog import Catalog
    from tilers_tools_spark.plans import tile_pyramid as tp

    spark = get_spark(app="tile_pyramid", master=args.master)
    images = spark.read.parquet(args.images)
    cat = Catalog(spark, args.out)
    metrics = tp.run(
        spark,
        images,
        cat,
        run_id=args.run_id,
        n_parts=args.parts,
        overview_levels=args.overviews,
        resampling=args.resampling,
        base_resampling=args.base_resampling,
        stage_input=not args.no_stage_input,
        profile=args.profile,
    )
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
