"""Locality layout (sources/layout.py): correctness of the pruned
viewport read AND the pruning itself (inputFiles subset), plus the
locality advantage over a row-major layout."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import spacefill as sf
from tilers_tools_spark.sources import layout


def _tiles(z=6):
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return pd.DataFrame(
        {"z": z, "x": xs.ravel(), "y": ys.ravel(), "v": xs.ravel() * 1000 + ys.ravel()}
    )


def test_viewport_scan_correct_and_pruned(spark, tmp_path):
    z, shift = 6, 6
    pdf = _tiles(z)
    path = str(tmp_path / "hsorted")
    layout.write_locality_sorted(spark.createDataFrame(pdf), path, z, bucket_shift=shift)

    box = (10, 17, 20, 27)  # 8x8 viewport
    got = layout.viewport_scan(spark, path, z, *box, bucket_shift=shift)
    rows = got.collect()
    assert len(rows) == 8 * 8
    assert {(r["x"], r["y"]) for r in rows} == {
        (x, y) for x in range(10, 18) for y in range(20, 28)
    }
    # v column survives the layout roundtrip
    assert all(r["v"] == r["x"] * 1000 + r["y"] for r in rows)

    # pruning: the physical scan carries the bucket IN-list as a
    # PARTITION filter (directory pruning) and the x/y ranges as pushed
    # parquet filters (inputFiles() ignores pruning, the plan does not)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [hbucket" in plan and " IN (" in plan
    assert "PushedFilters: [IsNotNull(x)" in plan
    n_buckets_total = 4**z >> shift
    n_buckets_touched = len(layout.viewport_buckets(z, *box, bucket_shift=shift))
    assert n_buckets_touched <= n_buckets_total // 4  # locality: few buckets
    # hilbert locality beats row-major bucketing: the same viewport under
    # a row-major key (x * n + y) >> shift touches MORE buckets
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(10, 18), np.arange(20, 28), indexing="ij")
    rowmajor = sorted(set(((xs.ravel() * n + ys.ravel()) >> shift).tolist()))
    assert n_buckets_touched <= len(rowmajor)


def test_bucket_contiguity_on_disk(spark, tmp_path):
    # within one bucket the hilbert keys are one contiguous range — the
    # property that keeps the IN-list short and row-group stats tight
    z, shift = 5, 4
    pdf = _tiles(z)
    d = sf.hilbert_np(pdf["x"].values, pdf["y"].values, z)
    byb = {}
    for v in d:
        byb.setdefault(v >> shift, []).append(v)
    for b, vals in byb.items():
        vals = sorted(vals)
        assert vals == list(range(vals[0], vals[0] + len(vals)))
