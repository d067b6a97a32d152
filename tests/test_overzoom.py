"""Overzoom (operators/convert.py::overzoom_keys/overzoom_tiles):
key-space involution with the child->ancestor shift, and the pixel leg
pinned by byte-level crop/upscale identities on a known gradient."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import convert


def _gradient(seed: int = 0) -> np.ndarray:
    r = np.arange(256, dtype=np.uint8)
    arr = np.empty((256, 256, 4), np.uint8)
    arr[..., 0] = r[None, :]
    arr[..., 1] = r[:, None]
    arr[..., 2] = (seed * 37) % 256
    arr[..., 3] = 255
    return arr


def test_overzoom_keys_involution(spark):
    tiles = spark.createDataFrame(
        pd.DataFrame({"z": [5, 5, 6], "x": [3, 7, 20], "y": [4, 9, 33]})
    )
    k = convert.overzoom_keys(tiles, 7).collect()
    # every ancestor emits exactly 4^(7-z) children, and shifting the
    # child key back down recovers the ancestor
    from collections import Counter

    per = Counter((r["z"], r["x"], r["y"]) for r in k)
    assert per[(5, 3, 4)] == 16 and per[(5, 7, 9)] == 16 and per[(6, 20, 33)] == 4
    for r in k:
        d = 7 - r["z"]
        assert r["cx"] >> d == r["x"] and r["cy"] >> d == r["y"]
        assert r["cz"] == 7


def test_overzoom_tiles_pixels(spark):
    arr = _gradient(1)
    blob = codecs.encode_tile_png(arr)
    tiles = spark.createDataFrame(
        pd.DataFrame({"z": [4], "x": [2], "y": [3], "tile": [blob]})
    )
    out = {(r["x"], r["y"]): bytes(r["tile"]) for r in convert.overzoom_tiles(tiles, 5).collect()}
    assert set(out) == {(4, 6), (5, 6), (4, 7), (5, 7)}
    # child (sx=1, sy_tms=0) = bottom-right quarter = pixel rows 128:256
    got = codecs.decode_png(out[(5, 6)])
    want = np.repeat(np.repeat(arr[128:, 128:], 2, axis=0), 2, axis=1)
    assert np.array_equal(got, want)
    # child (sx=0, sy_tms=1) = TOP-left quarter (TMS y counts from bottom)
    got = codecs.decode_png(out[(4, 7)])
    want = np.repeat(np.repeat(arr[:128, :128], 2, axis=0), 2, axis=1)
    assert np.array_equal(got, want)


def test_overzoom_composes_and_passthrough(spark):
    arr = _gradient(2)
    tiles = spark.createDataFrame(
        pd.DataFrame({"z": [6], "x": [0], "y": [0], "tile": [codecs.encode_raw(arr)]})
    )
    # one jump of 2 == two jumps of 1 (nearest upscale composes exactly)
    once = {
        (r["x"], r["y"]): bytes(r["tile"])
        for r in convert.overzoom_tiles(tiles, 8).collect()
    }
    twice_df = convert.overzoom_tiles(convert.overzoom_tiles(tiles, 7), 8)
    twice = {(r["x"], r["y"]): bytes(r["tile"]) for r in twice_df.collect()}
    assert once == twice and len(once) == 16
    # raw input stays raw
    assert codecs.sniff_fmt(next(iter(once.values()))) == "raw"
    # z >= to_z rows pass through byte-identical
    same = convert.overzoom_tiles(tiles, 6).collect()
    assert len(same) == 1 and bytes(same[0]["tile"]) == codecs.encode_raw(arr)
