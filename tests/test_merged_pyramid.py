"""Merged cross-image pyramid (tiles_merge + overviews) with per-zoom
resume: composite correctness vs pandas brute force, zoom-level resume
idempotency, unique merged keys.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fixtures import gen
from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators.convert import composite_over
from tilers_tools_spark.plans import merged_pyramid as mp
from tilers_tools_spark.plans import tile_pyramid as tp
from tilers_tools_spark.sources.catalog import Catalog


@pytest.fixture(scope="module")
def hot_images(spark):
    """First 8 HOT-box images (phash%5==0) — guaranteed overlap at z<=7."""
    recs = []
    for rec in gen.gen_images(200, fmts=("raw",)):
        if (rec["phash"] % (1 << 64)) % 5 == 0:  # uint64 view, as georef does
            recs.append(rec)
        if len(recs) == 8:
            break
    rows = [(r["image_id"], r["bytes"], r["w"], r["h"], r["fmt"], r["caption"], r["phash"]) for r in recs]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    ).cache()


def test_merged_pyramid_and_zoom_resume(spark, hot_images, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    m = mp.run(spark, hot_images, cat, run_id="m1", n_parts=2, zmin=6)
    assert m["stage1"]["parts_run"] == 2 and m["zooms_run"] > 3
    merged = cat.read(mp.MERGED_TABLE).toPandas()
    # unique (z,x,y)
    assert len(merged) == len(merged[["z", "x", "y"]].drop_duplicates())
    # overlap exists at low zooms (HOT box images share tiles)
    assert (merged.n_sources > 1).any()

    # brute-force composite check against the per-image tiles table
    tiles = cat.read(tp.TILES_TABLE).select("image_id", "z", "x", "y", "tile").toPandas()
    grouped = tiles.groupby(["z", "x", "y"])
    merged_by_key = {(r.z, r.x, r.y): bytes(r.tile) for r in merged.itertuples()}
    checked = multi = 0
    for (z, x, y), grp in grouped:
        grp = grp.sort_values("image_id")
        acc = None
        for blob in grp.tile:
            arr = codecs.to_rgba(codecs.decode_png(bytes(blob)))
            acc = arr if acc is None else composite_over(acc, arr)
        want = codecs.encode_tile_png(acc)
        assert merged_by_key[(z, x, y)] == want, (z, x, y)
        checked += 1
        multi += len(grp) > 1
    assert checked == len(merged) and multi > 0

    # zoom-level resume: second run is a no-op
    m2 = mp.run(spark, hot_images, cat, run_id="m1", n_parts=2, zmin=6)
    assert m2["zooms_run"] == 0 and m2["stage1"]["parts_run"] == 0
    assert cat.read(mp.MERGED_TABLE).count() == len(merged)

    # kill-after-k-zooms then resume matches the full table
    cat2 = Catalog(spark, str(tmp_path / "cat2"))
    p1 = mp.run(spark, hot_images, cat2, run_id="m2", n_parts=2, zmin=6, max_zooms=2)
    assert p1["zooms_run"] == 2
    mp.run(spark, hot_images, cat2, run_id="m2", n_parts=2, zmin=6)
    resumed = cat2.read(mp.MERGED_TABLE).toPandas()
    assert len(resumed) == len(merged)
    a = {(r.z, r.x, r.y): bytes(r.tile) for r in resumed.itertuples()}
    assert a == merged_by_key
