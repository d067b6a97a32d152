"""T3 — idempotent resume (SURVEY.md §5.2): kill between part commits,
rerun, table equals a fresh full run; no duplicate keys; lineage counters.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.plans import tile_pyramid as tp
from tilers_tools_spark.sources.catalog import Catalog


@pytest.fixture()
def images(spark, images_smoke):
    return spark.read.parquet(images_smoke)


def _tiles_key_hash(df):
    pdf = (
        df.select("image_id", "z", "x", "y", F.md5(F.col("tile")).alias("t"), "h3_cell", "caption")
        .orderBy("image_id", "z", "x", "y")
        .toPandas()
    )
    return pd.util.hash_pandas_object(pdf, index=False).sum()


def test_resume_idempotent(spark, images, tmp_path):
    cat1 = Catalog(spark, str(tmp_path / "cat1"))
    m = tp.run(spark, images, cat1, run_id="full", n_parts=4)
    assert m["parts_run"] == 4 and m["rows_in"] == 100 and m["tiles_out"] > 0
    full = cat1.read(tp.TILES_TABLE)
    n_full = full.count()
    assert full.select("image_id", "z", "x", "y").distinct().count() == n_full

    # simulated kill after 2 parts, then resume with same run_id
    cat2 = Catalog(spark, str(tmp_path / "cat2"))
    m1 = tp.run(spark, images, cat2, run_id="r1", n_parts=4, max_parts=2)
    assert m1["parts_run"] == 2
    m2 = tp.run(spark, images, cat2, run_id="r1", n_parts=4)
    assert m2["parts_run"] == 2  # only the remaining parts
    resumed = cat2.read(tp.TILES_TABLE)
    assert resumed.count() == n_full
    assert _tiles_key_hash(resumed) == _tiles_key_hash(full)

    # a third run is a no-op
    m3 = tp.run(spark, images, cat2, run_id="r1", n_parts=4)
    assert m3["parts_run"] == 0
    assert cat2.read(tp.TILES_TABLE).count() == n_full

    # lineage counters add up
    cp = cat2.read(tp.CHECKPOINT_TABLE)
    agg = cp.filter(F.col("status") == "done").agg(
        F.sum("rows_in").alias("ri"), F.sum("tiles_out").alias("to")
    ).collect()[0]
    assert agg["ri"] == 100 and agg["to"] == n_full
