"""spark-submit entry point — table-layout OPTIMIZE (the ZORDER-rewrite
role): rewrite a parquet tile/point table clustered by its Hilbert key
so footer min/max stats on (x, y) range-prune viewport queries, and
report the measured pruning before vs after on a probe viewport.

    spark-submit --py-files dist/engine.zip jobs/tiles_optimize.py \
        --in <parquet> --out <parquet> --zoom 8 [--files 16] \
        [--viewport x0,y0,x1,y1] [--max-records-per-file 0]

Prints one JSON metrics line: row counts, output file count, and (when a
probe viewport is given) row-group read fractions for input vs output —
the number a 100 TB table cares about."""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--zoom", type=int, required=True,
                    help="grid order: keys on the 2^zoom x 2^zoom grid")
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--x-col", default="x")
    ap.add_argument("--y-col", default="y")
    ap.add_argument("--max-records-per-file", type=int, default=0)
    ap.add_argument("--viewport", default=None,
                    help="x0,y0,x1,y1 probe rectangle (inclusive)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from tilers_tools_spark.operators import optimize
    from tilers_tools_spark.session import get_spark

    spark = get_spark(app="tiles_optimize", master=args.master)
    df = spark.read.parquet(args.inp)
    n_in = df.count()
    optimize.cluster_write(
        df, args.out, z=args.zoom, n_files=args.files,
        x_col=args.x_col, y_col=args.y_col,
        max_records_per_file=args.max_records_per_file,
    )
    n_out = spark.read.parquet(args.out).count()
    metrics = {"rows_in": n_in, "rows_out": n_out, "out": args.out,
               "files": args.files}
    if args.viewport:
        vp = tuple(int(v) for v in args.viewport.split(","))
        if len(vp) != 4:
            raise SystemExit("--viewport wants x0,y0,x1,y1")
        before = optimize.pruning_ratio(args.inp, vp, args.x_col, args.y_col)
        after = optimize.pruning_ratio(args.out, vp, args.x_col, args.y_col)
        metrics["viewport"] = list(vp)
        metrics["read_fraction_before"] = round(before["read_fraction"], 4)
        metrics["read_fraction_after"] = round(after["read_fraction"], 4)
        metrics["row_groups_before"] = before["row_groups"]
        metrics["row_groups_after"] = after["row_groups"]
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
