"""Space-filling keys (functions/spacefill.py): Hilbert pinned by the
DEFINING spec properties (bijection over the grid, consecutive keys are
4-neighbors) + roundtrip vs the published inverse d2xy; Morton by bit
identities; Column exprs vs NumPy twins."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tilers_tools_spark.functions import spacefill as sf


def test_hilbert_spec_properties():
    for z in (1, 2, 3, 4):
        n = 1 << z
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        d = sf.hilbert_np(xs.ravel(), ys.ravel(), z)
        # bijection onto [0, n^2)
        assert sorted(d.tolist()) == list(range(n * n))
        # adjacency: consecutive d are grid 4-neighbors (THE Hilbert property)
        pos = np.empty((n * n, 2), dtype=np.int64)
        pos[d] = np.stack([xs.ravel(), ys.ravel()], axis=1)
        step = np.abs(np.diff(pos, axis=0)).sum(axis=1)
        assert (step == 1).all()
        # roundtrip vs the published inverse
        for dd in range(n * n):
            x, y = sf.hilbert_d2xy_scalar(dd, z)
            assert sf.hilbert_np([x], [y], z)[0] == dd


def test_morton_identities():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 10, 200)
    y = rng.integers(0, 1 << 10, 200)
    m = sf.morton_np(x, y, 10)
    # de-interleave recovers inputs
    def unshuffle(v, off):
        out = np.zeros_like(v)
        for k in range(10):
            out += ((v >> (2 * k + off)) & 1) << k
        return out
    assert (unshuffle(m, 0) == x).all() and (unshuffle(m, 1) == y).all()
    # quadkey parity: morton ancestor = shiftright by 2 per level
    assert (sf.morton_np(x >> 1, y >> 1, 9) == (m >> 2)).all()


def test_columns_match_np(spark):
    rng = np.random.default_rng(4)
    z = 8
    pdf = pd.DataFrame(
        {
            "i": np.arange(300),
            "x": rng.integers(0, 1 << z, 300),
            "y": rng.integers(0, 1 << z, 300),
        }
    )
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    got = (
        sf.hilbert_key(df.withColumn("morton", sf.morton_key(F.col("x"), F.col("y"), z)), z)
        .orderBy("i")
        .collect()
    )
    wm = sf.morton_np(pdf["x"].values, pdf["y"].values, z)
    wh = sf.hilbert_np(pdf["x"].values, pdf["y"].values, z)
    assert [r["morton"] for r in got] == wm.tolist()
    assert [r["hilbert"] for r in got] == wh.tolist()


def test_hilbert_bucket_contiguity():
    # locality claim the docstring makes: shiftright(hd, 2) buckets an
    # order-z curve into contiguous quarters == the order-(z-1) cells
    z = 5
    n = 1 << z
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = sf.hilbert_np(xs.ravel(), ys.ravel(), z)
    parent = sf.hilbert_np(xs.ravel() >> 1, ys.ravel() >> 1, z - 1)
    assert ((d >> 2) == parent).all()
