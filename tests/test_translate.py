"""gdal_translate parity — crop/resize/rescale hand pins."""

from __future__ import annotations

import numpy as np
import pytest

from tilers_tools_spark.operators.translate import translate_np


def test_srcwin_crop():
    a = np.arange(20.0).reshape(4, 5)
    out = translate_np(a, srcwin=(1, 2, 3, 2))
    assert out.tolist() == [[11.0, 12.0, 13.0], [16.0, 17.0, 18.0]]
    with pytest.raises(ValueError, match="srcwin"):
        translate_np(a, srcwin=(3, 0, 3, 2))
    with pytest.raises(ValueError, match="srcwin"):
        translate_np(a, srcwin=(-1, 0, 2, 2))


def test_outsize_nearest_hand_pins():
    """4->2 downsize: dst 0 -> xs=(0.5)*2=1.0 -> floor 1; dst 1 -> 3."""
    a = np.array([[10.0, 20.0, 30.0, 40.0]])
    out = translate_np(a, outsize=(2, 1), resample="nearest")
    assert out.tolist() == [[20.0, 40.0]]
    # 2->4 upsize: xs = (xd+0.5)/2 -> floor = 0,0,1,1
    b = np.array([[1.0, 2.0]])
    up = translate_np(b, outsize=(4, 1), resample="nearest")
    assert up.tolist() == [[1.0, 1.0, 2.0, 2.0]]


def test_outsize_bilinear_hand_pins():
    """2->3 upsize of [0, 6]: xs = {1/3, 1, 5/3}; sample at xs-0.5 with
    clamp -> values 0 (clamped), 3 (midpoint), 6 (clamped)."""
    a = np.array([[0.0, 6.0]])
    out = translate_np(a, outsize=(3, 1), resample="bilinear")
    assert out[0, 1] == 3.0 and out[0, 0] == 0.0 and out[0, 2] == 6.0
    # NaN neighbor poisons the stencil
    n = translate_np(np.array([[0.0, np.nan]]), outsize=(3, 1), resample="bilinear")
    assert np.isnan(n[0, 1]) and n[0, 0] == 0.0

    with pytest.raises(ValueError, match="resample"):
        translate_np(a, outsize=(2, 1), resample="cubicspline")


def test_scale_and_clamp():
    a = np.array([[0.0, 50.0, 100.0, 200.0, np.nan]])
    out = translate_np(a, scale=(0.0, 100.0, 0.0, 255.0))
    # exact replay of the documented expression (100*2.55 rounds below 255)
    assert out[0, :4].tolist() == [0.0, 50.0 * 2.55, 100.0 * 2.55, 255.0]
    assert np.isnan(out[0, 4])  # NaN passes through the clamp
    # inverted destination range still clamps correctly
    inv = translate_np(np.array([[0.0, 100.0]]), scale=(0.0, 100.0, 255.0, 0.0))
    assert inv[0, 0] == 255.0 and abs(inv[0, 1]) < 1e-12
    with pytest.raises(ValueError, match="src_min"):
        translate_np(a, scale=(5.0, 5.0, 0.0, 1.0))


def test_raster_translate_operator(spark):
    import hashlib

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators.translate import raster_translate

    a = (np.arange(48.0).reshape(6, 8) * 3.5).astype(np.float32)
    img = spark.createDataFrame(
        [("t", tiffcodec.encode_tiff(a))], "image_id string, bytes binary"
    )
    out = raster_translate(
        img, srcwin=(1, 1, 6, 4), outsize=(3, 2), resample="bilinear",
        scale=(0.0, 160.0, 0.0, 255.0),
    ).toPandas().iloc[0]
    ref = translate_np(
        a.astype(np.float64), (1, 1, 6, 4), (3, 2), "bilinear", (0.0, 160.0, 0.0, 255.0)
    )
    q = np.round(ref / 1e-3).astype(np.int64)
    assert out["grid_md5"] == hashlib.md5(q.tobytes()).hexdigest()
    assert (out["out_w"], out["out_h"]) == (3, 2)


def test_geographic_geokey_roundtrip():
    from tilers_tools_spark.functions import tiffcodec

    blob = tiffcodec.encode_tiff(
        np.ones((4, 6), np.float32),
        geo={"gsd": 0.01, "mx0": 10.0, "my1": 50.0, "epsg": 4326},
    )
    tags = tiffcodec.read_tiff_tags(blob)
    assert tags["geo"]["epsg"] == 4326
    assert tags["geo"]["mx0"] == 10.0 and tags["geo"]["my1"] == 50.0


def test_reproject_4326_invariants():
    """Constant raster stays constant under any resampling; output grid
    covers the projected bbox at the default equator-scale gsd."""
    import math

    from tilers_tools_spark.operators.translate import _R, reproject_4326_np

    a = np.full((10, 14), 7.0, np.float32)
    for resample in ("nearest", "bilinear"):
        out, geo = reproject_4326_np(a, 10.0, 48.0, 0.01, resample=resample)
        assert np.allclose(out, 7.0)
        assert geo["epsg"] == 3857
        assert geo["gsd"] == _R * math.radians(0.01)
        # at lat 48 the y span shrinks per mercator stretching: out_h > h
        assert out.shape[0] > 10 and out.shape[1] == 14

    with pytest.raises(ValueError, match="mercator band"):
        reproject_4326_np(a, 0.0, 89.9, 0.01)
    with pytest.raises(ValueError, match="resample"):
        reproject_4326_np(a, 0.0, 10.0, 0.01, resample="cubic")


def test_reproject_4326_operator(spark):
    import hashlib

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators.translate import reproject_4326, reproject_4326_np

    a = (np.arange(120.0).reshape(10, 12) * 2.5).astype(np.float32)
    img = spark.createDataFrame(
        [
            (
                "g",
                tiffcodec.encode_tiff(
                    a, geo={"gsd": 0.02, "mx0": -3.0, "my1": 40.0, "epsg": 4326}
                ),
            )
        ],
        "image_id string, bytes binary",
    )
    out = reproject_4326(img, resample="bilinear").toPandas().iloc[0]
    ref, _geo = reproject_4326_np(a, -3.0, 40.0, 0.02, resample="bilinear")
    q = np.round(ref / 1e-3).astype(np.int64)
    assert out["grid_md5"] == hashlib.md5(q.tobytes()).hexdigest()
    assert (out["out_w"], out["out_h"]) == (ref.shape[1], ref.shape[0])

    import pytest as _pytest

    not4326 = spark.createDataFrame(
        [
            (
                "m",
                tiffcodec.encode_tiff(
                    a, geo={"gsd": 2.0, "mx0": 0.0, "my1": 1.0e5, "epsg": 3857}
                ),
            )
        ],
        "image_id string, bytes binary",
    )
    with _pytest.raises(Exception, match="4326"):
        reproject_4326(not4326).toPandas()


def test_raster_retile_roundtrip_and_mosaic_identity(spark):
    """Chunk blobs are valid GeoTIFFs that reassemble exactly: decode
    every chunk, place it by its re-anchored georef, and the recomposed
    grid equals the source (incl. NaN holes); mosaic() over the chunk
    rows agrees with mosaic() over the single source raster."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import mosaic as mz
    from tilers_tools_spark.operators import translate as tr

    rng = np.random.default_rng(11)
    a = (rng.random((23, 31)) * 50.0).astype(np.float32)
    a[4:7, 9:12] = np.nan
    gsd, mx0, my1 = 2.5, 100.0, 9000.0
    blob = tiffcodec.encode_tiff(
        a, geo={"gsd": gsd, "mx0": mx0, "my1": my1, "epsg": 3857},
        compression="deflate",
    )
    src = spark.createDataFrame([("s", blob)], "image_id string, bytes binary")
    chunks = tr.raster_retile(src, tile_w=8, tile_h=7).collect()
    assert len(chunks) == 4 * 4  # ceil(23/7) x ceil(31/8)
    recomposed = np.full_like(a, np.nan)
    for r in chunks:
        ch, g = tiffcodec.decode_tiff(bytes(r["bytes"]), scale_16bit=False)
        c0 = round((g["mx0"] - mx0) / gsd)
        r0 = round((my1 - g["my1"]) / gsd)
        assert (c0, r0) == (r["tile_col"] * 8, r["tile_row"] * 7)
        recomposed[r0 : r0 + ch.shape[0], c0 : c0 + ch.shape[1]] = ch
    assert np.array_equal(recomposed, a, equal_nan=True)

    # mosaic over the chunk table == mosaic over the source raster
    chunk_imgs = spark.createDataFrame(
        [(f"c{r['tile_row']}_{r['tile_col']}", i, bytes(r["bytes"]))
         for i, r in enumerate(chunks)],
        "image_id string, seq int, bytes binary",
    )
    src_seq = src.selectExpr("image_id", "0 as seq", "bytes")
    m1 = {r["band"]: r for r in mz.mosaic(chunk_imgs, n_bands=1).collect()}
    m0 = {r["band"]: r for r in mz.mosaic(src_seq, n_bands=1).collect()}
    assert m0.keys() == m1.keys()
    for b in m0:
        assert m0[b]["band_md5"] == m1[b]["band_md5"]
        assert m0[b]["q_sum"] == m1[b]["q_sum"]


def test_raster_retile_guards(spark):
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import translate as tr

    with pytest.raises(ValueError, match="bad retile size"):
        tr.raster_retile(None, tile_w=0)
    plain = tiffcodec.encode_tiff(np.ones((4, 4), np.float32))
    df = spark.createDataFrame([("p", plain)], "image_id string, bytes binary")
    with pytest.raises(Exception, match="georef"):
        tr.raster_retile(df).collect()


def test_overview_np_hand_pins():
    """gdaladdo kernels: nearest = top-left subsample; average =
    integer round-half-up block mean incl. partial edge blocks."""
    from tilers_tools_spark.operators.translate import overview_np

    a = np.array([[0, 10, 20], [30, 40, 50]], np.uint8)
    near = overview_np(a, 2, "nearest")
    assert near.tolist() == [[0, 20]]
    avg = overview_np(a, 2, "average")
    # full block mean (0+10+30+40)/4 = 20; edge block (20+50)/2 = 35
    assert avg.tolist() == [[20, 35]]
    # round-half-up: (1+2)/2 = 1.5 -> 2
    b = np.array([[1, 2]], np.uint8)
    assert overview_np(b, 2, "average").tolist() == [[2]]

    with pytest.raises(ValueError, match="level"):
        overview_np(a, 1)
    with pytest.raises(ValueError, match="resample"):
        overview_np(a, 2, "cubic")
    with pytest.raises(ValueError, match="integer"):
        overview_np(a.astype(np.float32), 2, "average")
