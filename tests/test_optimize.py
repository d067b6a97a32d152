"""Hilbert-clustered table rewrite (operators/optimize.py): the audit
report vs a NumPy brute force, and the REAL claim — footer min/max
pruning: an ingest-order (spatially random) layout reads ~every row
group for a small viewport, the Hilbert rewrite reads a handful."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.functions import spacefill
from tilers_tools_spark.operators import optimize


def _ntile_sizes(n, b):
    """Standard SQL ntile: first n % b buckets get one extra row."""
    q, r = divmod(n, b)
    return [q + 1] * r + [q] * (b - r)


def test_bucket_extents_vs_numpy(spark):
    rng = np.random.default_rng(3)
    pts = {(int(x), int(y)) for x, y in rng.integers(0, 32, size=(150, 2))}
    rows = sorted(pts)
    df = spark.createDataFrame(rows, "x long, y long")
    got = {r["bucket"]: r.asDict() for r in
           optimize.bucket_extents(df, z=5, buckets=8).collect()}

    xs = np.array([p[0] for p in rows])
    ys = np.array([p[1] for p in rows])
    order = np.argsort(spacefill.hilbert_np(xs, ys, 5))
    sizes = _ntile_sizes(len(rows), 8)
    i = 0
    for b, sz in enumerate(sizes, start=1):
        sel = order[i:i + sz]
        i += sz
        g = got[b]
        assert g["n"] == sz
        assert (g["min_x"], g["max_x"]) == (xs[sel].min(), xs[sel].max())
        assert (g["min_y"], g["max_y"]) == (ys[sel].min(), ys[sel].max())
        assert g["extent_cells"] == (
            (g["max_x"] - g["min_x"] + 1) * (g["max_y"] - g["min_y"] + 1))


@pytest.fixture(scope="module")
def grid(spark):
    """Full 64x64 tile grid (z=6) with a payload column."""
    xs, ys = np.meshgrid(np.arange(64), np.arange(64))
    rows = [(int(x), int(y), float(x * 64 + y)) for x, y in
            zip(xs.ravel(), ys.ravel())]
    return spark.createDataFrame(rows, "x long, y long, v double")


def test_pruning_random_vs_hilbert(grid, tmp_path):
    """16 files x 256 rows each. Ingest order = hash order (spatially
    random): a 8x8 viewport overlaps essentially every row group.
    Hilbert rewrite: every 256-row group is a compact block, so the same
    footer stats prune >= 75% of the table."""
    rand_path = str(tmp_path / "ingest")
    (grid.withColumn("_k", F.xxhash64("x", "y"))
         .repartitionByRange(16, "_k").sortWithinPartitions("_k").drop("_k")
         .write.mode("overwrite").parquet(rand_path))
    hil_path = str(tmp_path / "hilbert")
    optimize.cluster_write(grid, hil_path, z=6, n_files=16)

    viewport = (8, 16, 15, 23)  # 8x8 cells = 64 of 4096 rows
    pr_rand = optimize.pruning_ratio(rand_path, viewport)
    pr_hil = optimize.pruning_ratio(hil_path, viewport)
    assert pr_rand["rows_total"] == pr_hil["rows_total"] == 4096
    assert pr_rand["read_fraction"] >= 0.9      # random layout: ~all groups
    assert pr_hil["read_fraction"] <= 0.25      # clustered: a handful
    assert pr_hil["overlapping"] >= 1
    # correctness of the audit itself: scanned rows can never be fewer
    # than the true viewport row count
    assert pr_hil["rows_scanned"] >= 64 and pr_rand["rows_scanned"] >= 64


def test_cluster_write_is_sorted_and_disjoint(grid, tmp_path, spark):
    """Rewrite preserves the row set; within every file the key is
    sorted; across files the key ranges are disjoint (range partitioner
    contract) — i.e. the table is globally clustered, not just locally."""
    path = str(tmp_path / "keyed")
    optimize.cluster_write(grid, path, z=6, n_files=8, keep_key=True)
    back = spark.read.parquet(path).withColumn(
        "_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
    assert back.count() == 4096
    assert back.select("x", "y", "v").exceptAll(grid).count() == 0

    per_file = back.groupBy("_file").agg(
        F.min("hilbert").alias("lo"), F.max("hilbert").alias("hi")).collect()
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
        assert lo > hi_prev  # disjoint, ordered ranges
    # verify the hilbert column matches the recomputed key
    chk = spacefill.hilbert_key(back.select("x", "y"), 6, out_col="h2")
    joined = back.join(chk.withColumnRenamed("h2", "h2"),
                       ["x", "y"]).filter(F.col("hilbert") != F.col("h2"))
    assert joined.count() == 0
