"""gdal_merge parity — placement, overwrite order, lattice validation."""

from __future__ import annotations

import numpy as np
import pytest

from tilers_tools_spark.functions import tiffcodec
from tilers_tools_spark.operators import mosaic as mo


def _tif(a, ox, oy, gsd=1.0):
    return tiffcodec.encode_tiff(
        np.asarray(a, np.float32),
        geo={"gsd": gsd, "mx0": ox, "my1": oy, "epsg": 3857},
    )


def test_mosaic_overwrite_and_transparency(spark):
    """2x2 base of 1s at (0,2); 2x2 overlay at (1,2) shifted one col:
    overlay value 5 with a NaN hole -> hole shows the base through."""
    base = [[1.0, 1.0], [1.0, 1.0]]
    over = [[5.0, np.nan], [5.0, 5.0]]
    images = spark.createDataFrame(
        [("base", 0, _tif(base, 0.0, 2.0)), ("over", 1, _tif(over, 1.0, 2.0))],
        "image_id string, seq int, bytes binary",
    )
    out = mo.mosaic(images, n_bands=1).toPandas().iloc[0]
    # union grid 2x3: row0 = [1, 5, sent(hole over empty->... )]
    # col2 row0 is overlay's NaN over nothing -> nodata; values:
    # row0: 1, 5, nodata ; row1: 1, 5, 5
    assert out["out_w"] == 3 and out["out_h"] == 2
    assert out["n_valid"] == 5 and out["n_nodata"] == 1
    assert out["q_sum"] == (1 + 5 + 1 + 5 + 5) * 1000
    assert out["n_rasters"] == 2

    # seq order flipped: base now overwrites overlay where base is valid
    flipped = spark.createDataFrame(
        [("base", 1, _tif(base, 0.0, 2.0)), ("over", 0, _tif(over, 1.0, 2.0))],
        "image_id string, seq int, bytes binary",
    )
    out2 = mo.mosaic(flipped, n_bands=1).toPandas().iloc[0]
    # row0: 1, 1, nodata ; row1: 1, 1, 5
    assert out2["q_sum"] == (1 + 1 + 1 + 1 + 5) * 1000


def test_mosaic_band_routing(spark):
    """Two vertically stacked rasters with n_bands=2: each band sees only
    the raster(s) overlapping it."""
    top = [[2.0, 2.0]]
    bot = [[3.0, 3.0]]
    images = spark.createDataFrame(
        [("t", 0, _tif(top, 0.0, 2.0)), ("b", 1, _tif(bot, 0.0, 1.0))],
        "image_id string, seq int, bytes binary",
    )
    out = mo.mosaic(images, n_bands=2).toPandas().sort_values("band")
    assert len(out) == 2
    assert out.iloc[0]["n_rasters"] == 1 and out.iloc[0]["q_sum"] == 4000
    assert out.iloc[1]["n_rasters"] == 1 and out.iloc[1]["q_sum"] == 6000


def test_mosaic_rejects_mixed_gsd_and_misalignment(spark):
    a = [[1.0]]
    images = spark.createDataFrame(
        [("a", 0, _tif(a, 0.0, 1.0, gsd=1.0)), ("b", 1, _tif(a, 0.0, 3.0, gsd=2.0))],
        "image_id string, seq int, bytes binary",
    )
    with pytest.raises(ValueError, match="gsd"):
        mo.mosaic(images)

    misaligned = spark.createDataFrame(
        [("a", 0, _tif(a, 0.0, 1.0)), ("b", 1, _tif(a, 0.5, 1.0))],
        "image_id string, seq int, bytes binary",
    )
    with pytest.raises(ValueError, match="lattice"):
        mo.mosaic(misaligned)

    no_geo = spark.createDataFrame(
        [("a", 0, tiffcodec.encode_tiff(np.ones((1, 1), np.float32)))],
        "image_id string, seq int, bytes binary",
    )
    with pytest.raises(ValueError, match="georef"):
        mo.mosaic(no_geo)
