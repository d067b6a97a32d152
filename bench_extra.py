"""Round-6 optimization harness (guide §1): time individual declared
queries in isolation with the noop sink and capture .explain("formatted")
plans. This file is NOT the driver bench (bench.py is frozen for
measurement) — it exists so before/after evidence in OPTIMIZATION_r06.md
is reproducible.

Usage:
  python bench_extra.py --queries dbscan,charlm_ppl [--runs 3]
      [--tree /tmp/tree_r05] [--explain plans/r06 --suffix _before]
      [--sf /root/testdata/sf0.1] [--json /tmp/out.json]

--tree prepends an alternate checkout (e.g. the round-start tree from
`git archive HEAD^ | tar -x -C /tmp/tree_r05`) so before numbers come
from the exact round-start code in a fresh process.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from statistics import median


def _steal():
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:]]
    return (v[7] if len(v) > 7 else 0), sum(v)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tree", default=os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain", default=None, help="directory for explain dumps")
    ap.add_argument("--suffix", default="", help="plan filename suffix (_before/_after)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    sys.path.insert(0, args.tree)
    from tilers_tools_spark.plans.queries import QUERIES
    from tilers_tools_spark.session import get_spark

    spark = get_spark(app="bench_extra", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    detail = {}
    for name in args.queries.split(","):
        fn = QUERIES[name][0]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            p = os.path.join(args.explain, f"{name}{args.suffix}.txt")
            with open(p, "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        runs = []
        for _ in range(args.runs):
            s0, j0 = _steal()
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            s1, j1 = _steal()
            runs.append((round(w, 3), round((s1 - s0) / max(1, j1 - j0), 4)))
        if not runs:
            continue
        clean = [w for w, s in runs if s <= 0.10] or [w for w, _ in runs]
        out[name] = round(median(clean), 3)
        detail[name] = runs
        print(f"{name:24s} med={out[name]:8.3f}s  runs={runs}", flush=True)
    spark.stop()
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"medians": out, "runs": detail, "sf": args.sf}, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
