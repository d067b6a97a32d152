"""Explicit skew handling (BASELINE.json:14): the HOT-box fixture makes a
few H3 cells hot; the skew probe surfaces them and the salted (zoom,
h3_cell) repartition flattens partition sizes vs hashing the raw key.
"""

import pytest
from pyspark.sql import functions as F

from fixtures import gen
from tilers_tools_spark.operators import explode


@pytest.fixture(scope="module")
def skewed_cover(spark):
    """Tile-cover rows for a HOT-heavy image set, with h3 at a coarse res
    so the 2°x2° urban box lands in very few cells (realistic hot keys)."""
    rows = []
    n_hot = 0
    for rec in gen.gen_images(600, fmts=("raw",)):
        ph = rec["phash"] % (1 << 64)
        is_hot = ph % 5 == 0
        n_hot += is_hot
        rows.append((rec["image_id"], rec["w"], rec["h"], rec["phash"]))
    images = spark.createDataFrame(rows, "image_id string, w int, h int, phash long")
    cover = explode.explode_cover(images, zoom=9)
    from tilers_tools_spark.operators.spatial import _h3_cell_udf

    return cover.withColumn("h3_cell", _h3_cell_udf(F.col("lat"), F.col("lon"), F.lit(3))).cache()


def test_skew_probe_finds_hot_cells(skewed_cover):
    top = explode.skew_probe(skewed_cover, "h3_cell", top=5).collect()
    counts = [r["count"] for r in top]
    total = skewed_cover.count()
    # ~20% of images cluster in a 2-degree box -> the top cell holds a
    # grossly outsized share vs a uniform spread over hundreds of cells
    assert counts[0] > total * 0.05
    assert counts[0] > 4 * counts[4]


def test_salting_flattens_partitions(spark, skewed_cover):
    n_parts = 16

    def max_part_frac(df):
        sizes = df.rdd.glom().map(len).collect()
        return max(sizes) / max(1, sum(sizes))

    unsalted = skewed_cover.withColumn("z", F.col("z").cast("int")).repartition(
        n_parts, F.col("z"), F.col("h3_cell")
    )
    salted = explode.salted_repartition(
        skewed_cover.withColumn("z", F.col("z").cast("int")), n_parts, salt_factor=8
    )
    f_un = max_part_frac(unsalted)
    f_sa = max_part_frac(salted)
    # salting must cut the hottest partition's share substantially
    assert f_sa < f_un * 0.7, (f_un, f_sa)
    assert f_sa < 2.5 / n_parts  # near-uniform after salting


def test_auto_salt_factor(spark, skewed_cover):
    """Skewed keys -> salt > 1 sized from the probe; uniform keys -> 1."""
    s = explode.auto_salt_factor(skewed_cover, "h3_cell", num_partitions=16)
    assert s > 1
    uniform = spark.range(10000).select(F.col("id").alias("h3_cell"))
    assert explode.auto_salt_factor(uniform, "h3_cell", num_partitions=16) == 1
    # sizing sanity: with the probe's own numbers, the hottest key spread
    # over s buckets fits in ~an average partition's load
    top = explode.skew_probe(skewed_cover, "h3_cell", top=1).collect()[0]["count"]
    total = skewed_cover.count()
    assert top / s <= total / 16 * 1.001
