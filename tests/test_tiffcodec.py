"""Baseline TIFF + GeoTIFF codec ([SPEC] TIFF 6.0 / GeoTIFF 1.1).

The reader is pinned two independent ways: roundtrip vs the engine's own
writer, AND against HANDCRAFTED tag bytes built inline with struct (both
byte orders, multi-strip, out-of-line values) — a shared writer/reader
bug cannot satisfy the handcrafted case.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs, tiffcodec


def test_roundtrip_gray_rgb_rgba():
    rng = np.random.default_rng(2)
    for shape in [(17, 23), (16, 16, 3), (8, 5, 4)]:
        a = rng.integers(0, 256, shape, dtype=np.uint8)
        arr, geo = tiffcodec.decode_tiff(tiffcodec.encode_tiff(a))
        assert geo is None
        assert np.array_equal(arr.squeeze(), a.squeeze())


def test_geotiff_tags_roundtrip():
    a = np.zeros((10, 20, 3), np.uint8)
    geo = {"gsd": 38.2, "mx0": -1000.5, "my1": 2000.25, "epsg": 3857}
    arr, g = tiffcodec.decode_tiff(tiffcodec.encode_tiff(a, geo=geo))
    assert g["gsd"] == 38.2 and g["mx0"] == -1000.5 and g["my1"] == 2000.25
    assert g["mx1"] == -1000.5 + 20 * 38.2
    assert g["my0"] == 2000.25 - 10 * 38.2
    assert g["epsg"] == 3857


def _handcraft(bo: str, w: int, h: int, strips: list[bytes], rows_per_strip: int) -> bytes:
    """Gray 8-bit multi-strip TIFF built directly from the spec, entirely
    independent of tiffcodec.encode_tiff's layout choices."""
    n_tags = 9
    ifd_off = 8
    entries_end = ifd_off + 2 + 12 * n_tags + 4
    strip_offsets = []
    pos = entries_end + 8 * len(strips)  # leave room for offset/count arrays
    counts_off = entries_end
    offsets_off = entries_end + 4 * len(strips)
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def entry(tag, ftype, count, value_bytes):
        return struct.pack(bo + "HHI", tag, ftype, count) + value_bytes

    def inline(fmt, *v):
        return struct.pack(bo + fmt, *v).ljust(4, b"\0")

    if len(strips) == 1:
        off_entry = entry(273, 4, 1, inline("I", strip_offsets[0]))
        cnt_entry = entry(279, 4, 1, inline("I", len(strips[0])))
    else:
        off_entry = entry(273, 4, len(strips), inline("I", offsets_off))
        cnt_entry = entry(279, 4, len(strips), inline("I", counts_off))
    entries = b"".join(
        [
            entry(256, 4, 1, inline("I", w)),
            entry(257, 4, 1, inline("I", h)),
            entry(258, 3, 1, inline("H", 8)),
            entry(259, 3, 1, inline("H", 1)),
            entry(262, 3, 1, inline("H", 1)),
            off_entry,
            entry(277, 3, 1, inline("H", 1)),
            entry(278, 4, 1, inline("I", rows_per_strip)),
            cnt_entry,
        ]
    )
    head = struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, ifd_off)
    body = head + struct.pack(bo + "H", n_tags) + entries + struct.pack(bo + "I", 0)
    if len(strips) > 1:
        body += struct.pack(bo + "I" * len(strips), *[len(s) for s in strips])
        body += struct.pack(bo + "I" * len(strips), *strip_offsets)
    return body + b"".join(strips)


@pytest.mark.parametrize("bo", ["<", ">"])
def test_handcrafted_multistrip_both_byte_orders(bo):
    w, h, rps = 6, 5, 2
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    strips = [img[r : r + rps].tobytes() for r in range(0, h, rps)]
    data = _handcraft(bo, w, h, strips, rps)
    arr, geo = tiffcodec.decode_tiff(data)
    assert geo is None
    assert np.array_equal(arr, img)


def test_sniff_and_decode_image_integration():
    a = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = tiffcodec.encode_tiff(a)
    assert codecs.sniff_fmt(blob) == "tiff"
    assert np.array_equal(codecs.decode_image(blob, "tiff"), a)
    # big-endian sniff
    assert codecs.sniff_fmt(b"MM\x00*" + b"\0" * 8) == "tiff"


def test_unsupported_features_raise_loudly():
    a = np.zeros((4, 4), np.uint8)
    blob = bytearray(tiffcodec.encode_tiff(a))
    # flip Compression (tag 259) value to 5 (LZW): find its entry
    n = struct.unpack("<H", blob[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack("<H", blob[off : off + 2])[0]
        if tag == 259:
            blob[off + 8 : off + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        tiffcodec.decode_tiff(bytes(blob))
    with pytest.raises(ValueError, match="byte-order"):
        tiffcodec.decode_tiff(b"XX\x00\x2a" + b"\0" * 16)


def test_geotiff_georef_udf(spark):
    """The geotiff kind of parse_georef_udf extracts the north-up affine
    from GeoTIFF tags Arrow-batched, like the .map/.kap/.geo readers."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tilers_tools_spark.functions.georef_parsers import parse_georef_udf

    rows = []
    for i in range(3):
        geo = {"gsd": 10.0 + i, "mx0": 100.0 * i, "my1": 5000.0 + 10 * i, "epsg": 3857}
        a = np.full((8, 12, 3), i, np.uint8)
        rows.append((f"t{i}", tiffcodec.encode_tiff(a, geo=geo), 12, 8))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")
    u = parse_georef_udf("geotiff")
    out = (
        df.withColumn("g", u(F.col("bytes"), F.col("w"), F.col("h")))
        .select("image_id", "g.*")
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert list(out.gsd) == [10.0, 11.0, 12.0]
    assert out.loc[1, "mx0"] == 100.0 and out.loc[1, "my1"] == 5010.0
    assert out.loc[2, "mx1"] == 200.0 + 12 * 12.0
    assert out.loc[0, "my0"] == 5000.0 - 8 * 10.0


def test_geotiff_to_tiles_end_to_end(spark):
    """GeoTIFF input drives the warp render through its OWN embedded
    georef (north-up affine [[gsd,0,mx0],[0,-gsd,my1]]): tiles produced
    via parse_georef_udf-derived affine columns are byte-identical to
    tiles from the same pixels with directly-supplied affine literals."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tilers_tools_spark.functions.georef_parsers import parse_georef_udf
    from tilers_tools_spark.operators.render import render_warped

    rng = np.random.default_rng(9)
    pix = rng.integers(0, 256, (256, 384, 3), dtype=np.uint8)
    geo = {"gsd": 76.4, "mx0": -3.0e6, "my1": 4.0e6, "epsg": 3857}
    blob = tiffcodec.encode_tiff(pix, geo=geo)
    df = spark.createDataFrame(
        [("g0", blob, "tiff", 384, 256)], "image_id string, bytes binary, fmt string, w int, h int"
    )
    u = parse_georef_udf("geotiff")
    with_geo = df.withColumn("g", u(F.col("bytes"), F.col("w"), F.col("h"))).select(
        "image_id", "bytes", "fmt",
        F.col("g.gsd").alias("a00"), F.lit(0.0).alias("a01"), F.col("g.mx0").alias("a02"),
        F.lit(0.0).alias("a10"), (-F.col("g.gsd")).alias("a11"), F.col("g.my1").alias("a12"),
    )
    z = 7
    t1 = render_warped(with_geo, zoom=z).select("z", "x", "y", F.md5("tile").alias("m")).toPandas()
    direct = spark.createDataFrame(
        [("g0", blob, "tiff", 76.4, 0.0, -3.0e6, 0.0, -76.4, 4.0e6)],
        "image_id string, bytes binary, fmt string, a00 double, a01 double, a02 double, a10 double, a11 double, a12 double",
    )
    t2 = render_warped(direct, zoom=z).select("z", "x", "y", F.md5("tile").alias("m")).toPandas()
    assert len(t1) > 0
    a = t1.sort_values(["x", "y"]).reset_index(drop=True)
    b = t2.sort_values(["x", "y"]).reset_index(drop=True)
    assert a.equals(b)
