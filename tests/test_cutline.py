"""Cutline masking vs oracle brute force (SURVEY.md §2.3 row 18)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fixtures import gen
from oracle import minitiler as mt
from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import cutline
from tilers_tools_spark.operators.render import render_pyramid


@pytest.fixture(scope="module")
def hot_tiles(spark):
    rows = []
    for rec in gen.gen_images(120, fmts=("raw",)):
        if (rec["phash"] % (1 << 64)) % 5 == 0:
            rows.append((rec["image_id"], rec["bytes"], rec["w"], rec["h"], rec["fmt"], rec["caption"], rec["phash"]))
        if len(rows) == 6:
            break
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    return render_pyramid(images, zmin=7).cache()


@pytest.fixture(scope="module")
def hot_polygon(spark):
    # triangle inside the HOT box (139.7, 35.7) so it clips HOT tiles
    ring = [
        {"lon": 139.0, "lat": 35.0},
        {"lon": 140.6, "lat": 35.2},
        {"lon": 139.8, "lat": 36.4},
    ]
    return spark.createDataFrame([("cut0", ring)], "poly_id string, ring array<struct<lon:double,lat:double>>"), ring


def test_mask_matches_oracle(hot_polygon):
    _, ring = hot_polygon
    rings_m = [cutline.ring_to_merc(ring)]
    # tiles around the HOT box at a few zooms
    for z, tx, ty in [(8, 227, 151), (9, 454, 303), (7, 113, 75)]:
        got = cutline.tile_mask(rings_m, z, tx, ty)
        want = mt.cutline_mask([ring], z, tx, ty)
        assert np.array_equal(got, want), (z, tx, ty, int((got != want).sum()))


def test_apply_cutline_end_to_end(spark, hot_tiles, hot_polygon):
    polys, ring = hot_polygon
    n_before = hot_tiles.count()
    cut = cutline.apply_cutline(hot_tiles, polys).cache()
    n_after = cut.count()
    assert 0 < n_after < n_before  # some tiles survive, some are elided
    # masked pixels: alpha outside the ring must be 0, inside preserved
    for row in cut.limit(4).collect():
        arr = codecs.decode_png(bytes(row["tile"]))
        want_mask = mt.cutline_mask([ring], row["z"], row["x"], row["y"])
        alpha_on = arr[:, :, 3] > 0
        assert not (alpha_on & ~want_mask).any()  # nothing outside survives
        assert alpha_on.any()
    # original tiles untouched check: rgb zeroed outside mask
    row = cut.first()
    arr = codecs.decode_png(bytes(row["tile"]))
    m = mt.cutline_mask([ring], row["z"], row["x"], row["y"])
    assert (arr[~m][:, :3] == 0).all()


def test_bbox_prefilter_prunes(spark, hot_tiles, hot_polygon):
    polys, _ = hot_polygon
    # a polygon far away -> everything pruned by the Column-expr bbox filter
    far = spark.createDataFrame(
        [("far", [{"lon": -60.0, "lat": -30.0}, {"lon": -59.0, "lat": -30.0}, {"lon": -59.5, "lat": -29.0}])],
        "poly_id string, ring array<struct<lon:double,lat:double>>",
    )
    assert cutline.apply_cutline(hot_tiles, far).count() == 0


def test_apply_cutline_raw_tiles_bit_identical(spark, hot_polygon):
    """apply_cutline must accept the engine's scale path (RAW1 tile blobs
    from render_pyramid(encode='raw')) via container sniff, and produce
    pixel-identical masks to the PNG path — re-encoded in the same
    container."""
    polys, _ = hot_polygon
    rows = []
    for rec in gen.gen_images(120, fmts=("raw",)):
        if (rec["phash"] % (1 << 64)) % 5 == 0:
            rows.append((rec["image_id"], rec["bytes"], rec["w"], rec["h"], rec["fmt"], rec["caption"], rec["phash"]))
        if len(rows) == 4:
            break
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    )
    png_tiles = render_pyramid(images, zmin=7, encode="png")
    raw_tiles = render_pyramid(images, zmin=7, encode="raw")
    cut_png = {
        (r["image_id"], r["z"], r["x"], r["y"]): codecs.to_rgba(codecs.decode_png(bytes(r["tile"])))
        for r in cutline.apply_cutline(png_tiles, polys).collect()
    }
    cut_raw = {
        (r["image_id"], r["z"], r["x"], r["y"]): codecs.to_rgba(codecs.decode_raw(bytes(r["tile"])))
        for r in cutline.apply_cutline(raw_tiles, polys).collect()
    }
    assert cut_png.keys() == cut_raw.keys() and len(cut_png) > 0
    for k, arr in cut_png.items():
        assert np.array_equal(arr, cut_raw[k]), k
