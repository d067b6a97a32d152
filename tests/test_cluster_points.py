"""Grid point clustering (operators/vectortiles.py::cluster_points) vs a
pandas brute force, and the clustered MVT builder's supercluster props."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import tilemath as tm
from tilers_tools_spark.operators import vectortiles as vt


def _fixture(n=400, seed=5):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "lon": rng.uniform(-170.0, 170.0, n),
            "lat": rng.uniform(-80.0, 80.0, n),
        }
    )


def _brute(pdf: pd.DataFrame, z: int, radius_px: float) -> pd.DataFrame:
    cell = radius_px * (tm.RES0 / (2.0**z))
    mx = pdf["lon"].to_numpy() * (tm.ORIGIN / 180.0)
    my = np.log(np.tan((90.0 + pdf["lat"].to_numpy()) * (math.pi / 360.0))) * 6378137.0
    g = pd.DataFrame(
        {
            "cell_x": np.floor(mx / cell).astype(np.int64),
            "cell_y": np.floor(my / cell).astype(np.int64),
            "id": pdf["event_id"],
            "mx": mx,
            "my": my,
        }
    )
    return (
        g.groupby(["cell_x", "cell_y"])
        .agg(n=("id", "size"), min_id=("id", "min"), cx=("mx", "mean"), cy=("my", "mean"))
        .reset_index()
    )


def test_cluster_points_vs_brute(spark):
    pdf = _fixture()
    df = spark.createDataFrame(pdf)
    for z, r in ((2, 40.0), (5, 64.0)):
        got = (
            vt.cluster_points(df, z, r)
            .orderBy("cell_x", "cell_y")
            .toPandas()
        )
        want = _brute(pdf, z, r).sort_values(["cell_x", "cell_y"]).reset_index(drop=True)
        assert got[["cell_x", "cell_y", "n", "min_id"]].values.tolist() == \
            want[["cell_x", "cell_y", "n", "min_id"]].values.tolist()
        # centroids: mean of doubles — order-free tolerance
        assert np.allclose(got["cx"], want["cx"], rtol=1e-12)
        assert np.allclose(got["cy"], want["cy"], rtol=1e-12)
    # conservation: cluster sizes sum to the point count
    total = vt.cluster_points(df, 3, 48.0).agg(F.sum("n")).collect()[0][0]
    assert total == len(pdf)


def test_clustered_point_vector_tiles_props(spark):
    from tilers_tools_spark.functions import mvtcodec as mvt

    # 3 coincident points + 1 far loner -> one cluster feature with
    # point_count=3 and one plain feature
    pdf = pd.DataFrame(
        {
            "event_id": [10, 11, 12, 99],
            "lon": [10.0, 10.001, 10.002, -120.0],
            "lat": [20.0, 20.001, 20.002, -40.0],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = vt.clustered_point_vector_tiles(df, z=3, cluster_radius_px=40.0).collect()
    feats = []
    for r in rows:
        for layer, d in mvt.decode_mvt(bytes(r["tile"])).items():
            assert layer == "points"
            feats += d["features"]
    by_id = {f["id"]: f for f in feats}
    assert set(by_id) == {10, 99}
    assert by_id[10]["props"] == {"cluster": True, "point_count": 3}
    assert by_id[99]["props"] == {}
    # geometry: cluster lands at the centroid's quantized position
    assert len(by_id[10]["paths"][0]) == 1


def test_cluster_plan_is_single_narrow_exchange(spark):
    df = spark.createDataFrame(_fixture())
    plan = vt.cluster_points(df, 4, 48.0)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # partial agg + final agg exchange only
    assert "lon" not in plan.split("Exchange", 1)[1].split("\n")[0]
