"""Column twins of H3/S2 parent truncation vs the NumPy indexers."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import cellcols, h3lite, s2lite

RNG = np.random.default_rng(31)
N = 5000
LON = RNG.uniform(-180, 180, N)
LAT = RNG.uniform(-85, 85, N)


def test_h3_parent_column_twin(spark):
    c12 = h3lite.latlng_to_cell(LAT, LON, 12)
    df = spark.createDataFrame(pd.DataFrame({"h3_cell": c12}))
    for pr in (0, 4, 9):
        got = df.select(cellcols.h3_parent("h3_cell", pr).alias("p")).toPandas()["p"].to_numpy()
        want = h3lite.cell_to_parent(c12, pr)
        assert np.array_equal(got, want)
    got_res = df.select(cellcols.h3_res("h3_cell").alias("r")).toPandas()["r"]
    assert (got_res == 12).all()
    got_base = df.select(cellcols.h3_base_cell("h3_cell").alias("b")).toPandas()["b"].to_numpy()
    assert np.array_equal(got_base, h3lite.cell_base(c12))


def test_s2_parent_column_twin(spark):
    c30 = s2lite.latlng_to_cell(LAT, LON, 30)
    df = spark.createDataFrame(pd.DataFrame({"s2_cell": c30}))
    for lv in (0, 10, 25):
        got = df.select(cellcols.s2_parent("s2_cell", lv).alias("p")).toPandas()["p"].to_numpy()
        assert np.array_equal(got, s2lite.parent(c30, lv))


def test_h3_rollup_counts(spark):
    c12 = h3lite.latlng_to_cell(LAT, LON, 12)
    df = spark.createDataFrame(pd.DataFrame({"h3_cell": c12}))
    out = cellcols.h3_rollup_counts(df, resolutions=(0, 5)).toPandas()
    assert out[out.res == 0]["n"].sum() == N
    assert out[out.res == 5]["n"].sum() == N
    assert len(out[out.res == 0]) == 20  # res0 = the 20 faces
    # rollup is codegen'd (no Python nodes)
    plan = cellcols.h3_rollup_counts(df, resolutions=(0, 5))._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "HashAggregate" in plan
