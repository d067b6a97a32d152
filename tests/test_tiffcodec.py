"""Baseline TIFF + GeoTIFF codec ([SPEC] TIFF 6.0 / GeoTIFF 1.1).

The reader is pinned two independent ways: roundtrip vs the engine's own
writer, AND against HANDCRAFTED tag bytes built inline with struct (both
byte orders, multi-strip, out-of-line values) — a shared writer/reader
bug cannot satisfy the handcrafted case.
"""

from __future__ import annotations

import hashlib
import os
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
    # out-of-line offset/count arrays exist only in the multi-strip case
    pos = entries_end + (8 * len(strips) if len(strips) > 1 else 0)
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
    # flip Compression (tag 259) value to 6 (old-style JPEG, deprecated
    # by TIFF TechNote 2 and genuinely unsupported; new-style 7 IS
    # supported via the engine's jpegcodec)
    n = struct.unpack("<H", blob[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        tag = struct.unpack("<H", blob[off : off + 2])[0]
        if tag == 259:
            blob[off + 8 : off + 10] = struct.pack("<H", 6)
    with pytest.raises(NotImplementedError, match="compression 6"):
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


def test_packbits_spec_example():
    """The TIFF 6.0 spec's own PackBits worked example (§9)."""
    packed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22AAAAAAAAAAAAAAAAAAAA")
    assert tiffcodec._unpackbits(packed) == want


def test_deflate_roundtrip_with_geo():
    rng = np.random.default_rng(6)
    a = rng.integers(0, 256, (33, 21, 3), dtype=np.uint8)
    geo = {"gsd": 5.5, "mx0": 10.0, "my1": 20.0}
    blob = tiffcodec.encode_tiff(a, geo=geo, compression="deflate")
    arr, g = tiffcodec.decode_tiff(blob)
    assert np.array_equal(arr, a) and g["gsd"] == 5.5
    assert len(blob) != len(tiffcodec.encode_tiff(a, geo=geo))  # actually compressed


def _lzw_encode(data: bytes) -> bytes:
    """Test-side TIFF-LZW compressor written independently from the
    decoder (spec §13): MSB-first packing, CLEAR=256/EOI=257, early
    width change when the NEXT code would not fit."""
    out = bytearray()
    bitbuf, bitcnt = 0, 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(256, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(257, width)
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def test_lzw_decode_vs_independent_encoder():
    rng = np.random.default_rng(12)
    for data in [
        b"",
        b"A",
        b"TOBEORNOTTOBEORTOBEORNOT",
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),  # forces width growth
        bytes(rng.integers(0, 256, 20000, dtype=np.uint8)),  # forces table reset
    ]:
        assert tiffcodec._unlzw(_lzw_encode(data)) == data, len(data)


def test_lzw_tiff_end_to_end():
    """An LZW strip inside a handcrafted TIFF decodes through the full
    reader path (with predictor 1)."""
    rng = np.random.default_rng(13)
    img = bytes(rng.integers(0, 8, 64, dtype=np.uint8))
    strip = _lzw_encode(img)
    data = _handcraft("<", 8, 8, [strip], 8)
    # patch Compression (tag 259) from 1 -> 5
    blob = bytearray(data)
    n = struct.unpack("<H", blob[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", blob[off : off + 2])[0] == 259:
            blob[off + 8 : off + 10] = struct.pack("<H", 5)
    arr, _ = tiffcodec.decode_tiff(bytes(blob))
    assert arr.tobytes() == img


def test_predictor2_horizontal_differencing():
    """Predictor 2 (deltas vs the same channel one pixel left) is undone
    by per-channel wraparound cumsum; verified against a manually
    differenced RGB image in a handcrafted deflate TIFF."""
    import zlib

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    diff = img.copy()
    diff[:, 1:, :] = img[:, 1:, :] - img[:, :-1, :]  # uint8 wrap
    strip = zlib.compress(diff.tobytes(), 6)
    # handcraft an RGB TIFF with predictor + deflate
    bo = "<"
    tags = [
        (256, 4, [6]), (257, 4, [4]), (258, 3, [8, 8, 8]), (259, 3, [8]),
        (262, 3, [2]), (273, 4, None), (277, 3, [3]), (278, 4, [4]),
        (279, 4, [len(strip)]), (317, 3, [2]),
    ]
    n = len(tags)
    entries_end = 8 + 2 + 12 * n + 4
    extra = b""
    ents = b""
    strip_patch_pos = None
    for i, (tag, ftype, values) in enumerate(tags):
        fmt = {3: "H", 4: "I"}[ftype]
        size = {3: 2, 4: 4}[ftype]
        if values is None:  # strip offset placeholder
            strip_patch_pos = 8 + 2 + 12 * i + 8
            raw = struct.pack(bo + "I", 0)
            count = 1
        else:
            count = len(values)
            packed = struct.pack(bo + fmt * count, *values)
            if size * count <= 4:
                raw = packed.ljust(4, b"\0")
            else:
                raw = struct.pack(bo + "I", entries_end + len(extra))
                extra += packed
        ents += struct.pack(bo + "HHI", tag, ftype, count) + raw
    blob = bytearray(
        struct.pack(bo + "2sHI", b"II", 42, 8)
        + struct.pack(bo + "H", n) + ents + struct.pack(bo + "I", 0) + extra + strip
    )
    blob[strip_patch_pos : strip_patch_pos + 4] = struct.pack(bo + "I", entries_end + len(extra))
    arr, _ = tiffcodec.decode_tiff(bytes(blob))
    assert np.array_equal(arr, img)


def _handcraft_tags(tags, strip: bytes, bo="<") -> bytes:
    """Generic handcrafted single-strip TIFF from a (tag, type, values)
    list; values None on tag 273 marks the strip-offset placeholder."""
    n = len(tags)
    entries_end = 8 + 2 + 12 * n + 4
    extra = b""
    ents = b""
    patch_pos = None
    for i, (tag, ftype, values) in enumerate(tags):
        fmt = {3: "H", 4: "I", 12: "d"}[ftype]
        size = {3: 2, 4: 4, 12: 8}[ftype]
        if values is None:
            patch_pos = 8 + 2 + 12 * i + 8
            raw = struct.pack(bo + "I", 0)
            count = 1
        else:
            count = len(values)
            packed = struct.pack(bo + fmt * count, *values)
            raw = packed.ljust(4, b"\0") if size * count <= 4 else struct.pack(
                bo + "I", entries_end + len(extra)
            )
            if size * count > 4:
                extra += packed
        ents += struct.pack(bo + "HHI", tag, ftype, count) + raw
    blob = bytearray(
        struct.pack(bo + "2sHI", b"II", 42, 8)
        + struct.pack(bo + "H", n) + ents + struct.pack(bo + "I", 0) + extra + strip
    )
    blob[patch_pos : patch_pos + 4] = struct.pack(bo + "I", entries_end + len(extra))
    return bytes(blob)


def test_palette_tiff_expands_colormap():
    """Photometric 3: indices expand through the 16-bit ColorMap (>>8),
    like scanned-chart DRG GeoTIFFs."""
    idx = np.array([[0, 1], [2, 1]], np.uint8)
    # palette: 3 colors, 16-bit entries (value<<8 => exact 8-bit scale)
    reds, greens, blues = [10, 20, 30], [40, 50, 60], [70, 80, 90]
    # full map = 3 * 2^bits entries (all reds, all greens, all blues)
    full = [v << 8 for v in reds] + [0] * 253 + [v << 8 for v in greens] + [0] * 253 + [v << 8 for v in blues] + [0] * 253
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [4]), (320, 3, full),
    ]
    arr, geo = tiffcodec.decode_tiff(_handcraft_tags(tags, idx.tobytes()))
    assert geo is None and arr.shape == (2, 2, 3)
    assert list(arr[0, 0]) == [10, 40, 70]
    assert list(arr[0, 1]) == [20, 50, 80]
    assert list(arr[1, 0]) == [30, 60, 90]


def test_white_is_zero_inverts():
    img = np.array([[0, 255], [100, 200]], np.uint8)
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [0]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [4]),
    ]
    arr, _ = tiffcodec.decode_tiff(_handcraft_tags(tags, img.tobytes()))
    assert np.array_equal(arr, 255 - img)


def test_cmyk_raises():
    img = bytes(16)
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8, 8, 8, 8]), (259, 3, [1]),
        (262, 3, [5]), (273, 4, None), (277, 3, [4]), (278, 4, [2]),
        (279, 4, [16]),
    ]
    with pytest.raises(NotImplementedError, match="photometric 5"):
        tiffcodec.decode_tiff(_handcraft_tags(tags, img))


def test_read_tiff_tags_skips_strips():
    """Tags-only parse returns dims+georef even when the strip bytes are
    garbage for the declared compression — proof it never touches them."""
    a = np.zeros((6, 9, 3), np.uint8)
    blob = bytearray(tiffcodec.encode_tiff(a, geo={"gsd": 2.0, "mx0": 1.0, "my1": 9.0}))
    blob[-10:] = b"\xff" * 10  # corrupt pixel data
    t = tiffcodec.read_tiff_tags(bytes(blob))
    assert (t["w"], t["h"]) == (9, 6) and t["geo"]["gsd"] == 2.0


def test_tiff_dims_udf(spark):
    from pyspark.sql import functions as F

    from tilers_tools_spark.functions.georef_parsers import tiff_dims_udf

    rows = [
        ("a", tiffcodec.encode_tiff(np.zeros((5, 7), np.uint8))),
        ("b", b"not a tiff"),
    ]
    df = spark.createDataFrame(rows, "k string, content binary")
    out = (
        df.withColumn("d", tiff_dims_udf()(F.col("content")))
        .select("k", "d.w", "d.h")
        .toPandas()
        .set_index("k")
    )
    assert (out.loc["a", "w"], out.loc["a", "h"]) == (7, 5)
    assert (out.loc["b", "w"], out.loc["b", "h"]) == (-1, -1)


# --------------------------------------------------------------------------
# tiled organization (TIFF 6.0 §15, tags 322-325) + 16-bit samples
# --------------------------------------------------------------------------


def _handcraft_chunked(tags, chunks, offsets_tag, bo="<"):
    """Generic handcrafted TIFF with MULTIPLE data chunks (strips or
    tiles), built directly from the spec and entirely independent of
    tiffcodec.encode_tiff's layout: values None on `offsets_tag` marks
    the chunk-offsets array placeholder (count = len(chunks)). Two-pass:
    the extra-area size is determined by counts alone, so chunk offsets
    are known before packing."""
    n = len(tags)
    entries_end = 8 + 2 + 12 * n + 4
    sizes = {3: 2, 4: 4, 7: 1, 12: 8}
    fmts = {3: "H", 4: "I", 7: "B", 12: "d"}
    extra_size = 0
    for tag, ftype, values in tags:
        count = len(chunks) if values is None else len(values)
        if sizes[ftype] * count > 4:
            extra_size += sizes[ftype] * count
    pos = entries_end + extra_size
    chunk_offsets = []
    for ch in chunks:
        chunk_offsets.append(pos)
        pos += len(ch)
    ents, extra = b"", b""
    for tag, ftype, values in tags:
        if values is None:
            values = chunk_offsets
        count = len(values)
        packed = struct.pack(bo + fmts[ftype] * count, *values)
        if sizes[ftype] * count <= 4:
            raw = packed.ljust(4, b"\0")
        else:
            raw = struct.pack(bo + "I", entries_end + len(extra))
            extra += packed
        ents += struct.pack(bo + "HHI", tag, ftype, count) + raw
    return (
        struct.pack(bo + "2sHI", b"II" if bo == "<" else b"MM", 42, 8)
        + struct.pack(bo + "H", n)
        + ents
        + struct.pack(bo + "I", 0)
        + extra
        + b"".join(chunks)
    )


def test_handcrafted_tiled_lzw_predictor():
    """Tiled gray TIFF (2x2 grid of 8x4 tiles over a 10x7 raster) with
    predictor-2 differencing applied PER TILE ROW and LZW tile payloads
    from the independent test encoder; edge-tile padding is nonzero
    garbage to prove the reader crops rather than trusts it. This is the
    GDAL TILED=YES shape (real archives hit it before strips)."""
    rng = np.random.default_rng(21)
    w, h, tw, tl = 10, 7, 8, 4
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    chunks = []
    for r in range(2):
        for c in range(2):
            tile = np.full((tl, tw), 0xEE, np.uint8)  # garbage padding
            block = img[r * tl : (r + 1) * tl, c * tw : (c + 1) * tw]
            tile[: block.shape[0], : block.shape[1]] = block
            diff = tile.copy()
            diff[:, 1:] = tile[:, 1:] - tile[:, :-1]  # uint8 wrap, per tile row
            chunks.append(_lzw_encode(diff.tobytes()))
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [5]),
        (262, 3, [1]), (277, 3, [1]), (317, 3, [2]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [len(ch) for ch in chunks]),
    ]
    arr, geo = tiffcodec.decode_tiff(_handcraft_chunked(tags, chunks, 324))
    assert geo is None
    assert np.array_equal(arr, img)


def test_handcrafted_tiled_rgb_deflate_geotiff():
    """Tiled RGB deflate GeoTIFF with georef tags — the full
    GDAL-archive combination, handcrafted."""
    import zlib

    rng = np.random.default_rng(22)
    w, h, tw, tl = 6, 6, 4, 4
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    chunks = []
    for r in range(2):
        for c in range(2):
            tile = np.zeros((tl, tw, 3), np.uint8)
            block = img[r * tl : (r + 1) * tl, c * tw : (c + 1) * tw]
            tile[: block.shape[0], : block.shape[1]] = block
            chunks.append(zlib.compress(tile.tobytes(), 9))
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [8]),
        (262, 3, [2]), (277, 3, [3]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [len(ch) for ch in chunks]),
        (33550, 12, [2.5, 2.5, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, 1000.0, 5000.0, 0.0]),
        (34735, 3, [1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, 3857]),
    ]
    arr, g = tiffcodec.decode_tiff(_handcraft_chunked(tags, chunks, 324))
    assert np.array_equal(arr, img)
    assert g["gsd"] == 2.5 and g["mx0"] == 1000.0 and g["my1"] == 5000.0
    assert g["my0"] == 5000.0 - 6 * 2.5 and g["epsg"] == 3857


def test_scale_16bit_to_8bit_kat():
    """Pinned spec values for the documented 16->8 rule round(v/257)
    (linear 0..65535 -> 0..255, round half up): hand-computed, including
    both sides of the first rounding boundary and the top step — the
    truncating >>8 disagrees at 129 and 65280..65406."""
    v = np.array([0, 128, 129, 257, 32767, 32768, 65279, 65406, 65407, 65535], np.uint16)
    expected = [0, 0, 1, 1, 127, 128, 254, 254, 255, 255]
    assert list(tiffcodec.scale_16bit_to_8bit(v)) == expected


@pytest.mark.parametrize("bo", ["<", ">"])
def test_handcrafted_16bit_gray_both_byte_orders(bo):
    """16-bit gray single-strip in BOTH byte orders: raw uint16 samples
    surface with scale_16bit=False; the default path applies the
    documented round(v/257) scaling."""
    img = np.array([[0, 129, 257], [32768, 65407, 65535]], dtype=np.uint16)
    strip = img.astype(bo + "u2").tobytes()
    tags = [
        (256, 4, [3]), (257, 4, [2]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [len(strip)]),
    ]
    blob = _handcraft_chunked(tags, [strip], 273, bo=bo)
    raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
    assert raw.dtype.itemsize == 2 and np.array_equal(raw.astype(np.uint16), img)
    arr, _ = tiffcodec.decode_tiff(blob)
    assert arr.dtype == np.uint8
    assert np.array_equal(arr, np.array([[0, 1, 1], [128, 255, 255]], np.uint8))


def test_16bit_predictor2_deflate_tiled():
    """16-bit RGB tiled with predictor 2 (differencing on 16-bit SAMPLE
    values, uint16 wraparound, restarting at each tile's left edge) +
    deflate — the 16-bit DEM-style GDAL combination."""
    import zlib

    rng = np.random.default_rng(23)
    w, h, tw, tl = 5, 4, 4, 4
    img = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    chunks = []
    for c in range(2):
        tile = np.zeros((tl, tw, 3), np.uint16)
        block = img[:, c * tw : (c + 1) * tw]
        tile[: block.shape[0], : block.shape[1]] = block
        diff = tile.copy()
        diff[:, 1:, :] = tile[:, 1:, :] - tile[:, :-1, :]  # uint16 wrap
        chunks.append(zlib.compress(diff.astype("<u2").tobytes(), 6))
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [16, 16, 16]), (259, 3, [8]),
        (262, 3, [2]), (277, 3, [3]), (317, 3, [2]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [len(ch) for ch in chunks]),
    ]
    raw, _ = tiffcodec.decode_tiff(_handcraft_chunked(tags, chunks, 324), scale_16bit=False)
    assert np.array_equal(raw.astype(np.uint16), img)


def test_16bit_white_is_zero_inverts_before_scaling():
    """Photometric 0 with 16-bit samples inverts at 16-bit precision
    (65535 - v) BEFORE the 8-bit scaling."""
    img = np.array([[0, 65535], [129, 65406]], dtype=np.uint16)
    strip = img.astype("<u2").tobytes()
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [0]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [len(strip)]),
    ]
    arr, _ = tiffcodec.decode_tiff(_handcraft_chunked(tags, [strip], 273))
    inv = (65535 - img.astype(np.uint32)).astype(np.uint16)
    assert np.array_equal(arr, tiffcodec.scale_16bit_to_8bit(inv))


def test_tiled_roundtrip_writer_reader():
    """Writer tile option roundtrips (8- and 16-bit, deflate), including
    non-multiple edge tiles; tags-only parse still skips pixel data."""
    rng = np.random.default_rng(24)
    for dt in (np.uint8, np.uint16):
        a = rng.integers(0, np.iinfo(dt).max + 1, (21, 13, 3), dtype=dt)
        blob = tiffcodec.encode_tiff(a, tile=8, compression="deflate",
                                     geo={"gsd": 1.5, "mx0": 10.0, "my1": 99.0})
        raw, g = tiffcodec.decode_tiff(blob, scale_16bit=False)
        assert np.array_equal(raw.astype(dt), a) and g["gsd"] == 1.5
        t = tiffcodec.read_tiff_tags(blob)
        assert (t["w"], t["h"]) == (13, 21) and t["geo"]["epsg"] == 3857


def test_mixed_bit_depth_raises():
    img = bytes(12)
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8, 16, 8]), (259, 3, [1]),
        (262, 3, [2]), (273, 4, None), (277, 3, [3]), (278, 4, [2]),
        (279, 4, [12]),
    ]
    with pytest.raises(NotImplementedError, match="mixed sample layouts"):
        tiffcodec.decode_tiff(_handcraft_chunked(tags, [img], 273))


def test_tile_count_mismatch_raises():
    tags = [
        (256, 4, [10]), (257, 4, [10]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [1]), (277, 3, [1]),
        (322, 4, [8]), (323, 4, [8]), (324, 4, None), (325, 4, [64]),
    ]
    # 10x10 with 8x8 tiles needs a 2x2 grid = 4 tiles; only 1 present
    with pytest.raises(ValueError, match="tile count mismatch"):
        tiffcodec.decode_tiff(_handcraft_chunked(tags, [bytes(64)], 324))


def test_tiled_geotiff_to_tiles_end_to_end(spark):
    """A TILED GeoTIFF (deflate, 16px tiles, non-multiple raster size)
    renders through render_warped byte-identically to the SAME pixels in
    a single-strip GeoTIFF — the decode organization is invisible to the
    tile pipeline (the GDAL TILED=YES archive path, VERDICT r4 ask #3)."""
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators.render import render_warped

    rng = np.random.default_rng(31)
    pix = rng.integers(0, 256, (250, 370, 3), dtype=np.uint8)
    geo = {"gsd": 76.4, "mx0": -3.0e6, "my1": 4.0e6, "epsg": 3857}
    aff = (76.4, 0.0, -3.0e6, 0.0, -76.4, 4.0e6)
    ddl = ("image_id string, bytes binary, fmt string, a00 double, a01 double, "
           "a02 double, a10 double, a11 double, a12 double")
    frames = []
    for blob in (
        tiffcodec.encode_tiff(pix, geo=geo),
        tiffcodec.encode_tiff(pix, geo=geo, tile=16, compression="deflate"),
    ):
        df = spark.createDataFrame([("g0", blob, "tiff", *aff)], ddl)
        t = (
            render_warped(df, zoom=7)
            .select("z", "x", "y", F.md5("tile").alias("m"))
            .toPandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        frames.append(t)
    assert len(frames[0]) > 0
    assert frames[0].equals(frames[1])


def test_geotiff_wrong_crs_yields_nan_row(spark):
    """ADVICE r4 (medium): a GeoTIFF whose GeoKey CRS is not EPSG:3857
    (e.g. EPSG:4326 degrees or UTM meters) must NOT have its model
    coordinates silently treated as mercator meters — the georef UDF
    emits the auditable NaN row instead; same for a GeoTIFF with
    pixel-scale/tiepoint tags but NO CRS geokey at all."""
    import math

    from pyspark.sql import functions as F

    from tilers_tools_spark.functions.georef_parsers import parse_georef_udf

    a = np.zeros((8, 12, 3), np.uint8)
    ok = tiffcodec.encode_tiff(a, geo={"gsd": 10.0, "mx0": 0.0, "my1": 50.0, "epsg": 3857})
    wgs84 = tiffcodec.encode_tiff(a, geo={"gsd": 0.001, "mx0": 12.0, "my1": 51.0, "epsg": 4326})
    utm = tiffcodec.encode_tiff(a, geo={"gsd": 10.0, "mx0": 5.0e5, "my1": 6.0e6, "epsg": 32633})
    # pixel-scale/tiepoint present but no GeoKeyDirectory: CRS unknown
    no_key = _handcraft_chunked(
        [
            (256, 4, [12]), (257, 4, [8]), (258, 3, [8, 8, 8]), (259, 3, [1]),
            (262, 3, [2]), (273, 4, None), (277, 3, [3]), (278, 4, [8]),
            (279, 4, [12 * 8 * 3]),
            (33550, 12, [10.0, 10.0, 0.0]),
            (33922, 12, [0.0, 0.0, 0.0, 0.0, 50.0, 0.0]),
        ],
        [a.tobytes()],
        273,
    )
    df = spark.createDataFrame(
        [("ok", ok, 12, 8), ("wgs84", wgs84, 12, 8), ("utm", utm, 12, 8), ("nokey", no_key, 12, 8)],
        "image_id string, bytes binary, w int, h int",
    )
    u = parse_georef_udf("geotiff")
    out = (
        df.withColumn("g", u(F.col("bytes"), F.col("w"), F.col("h")))
        .select("image_id", "g.gsd", "g.mx0")
        .toPandas()
        .set_index("image_id")
    )
    assert out.loc["ok", "gsd"] == 10.0 and out.loc["ok", "mx0"] == 0.0
    for bad in ("wgs84", "utm", "nokey"):
        assert math.isnan(out.loc[bad, "gsd"]), bad
        assert math.isnan(out.loc[bad, "mx0"]), bad


# --------------------------------------------------------------------------
# BigTIFF (magic 43, GDAL BIGTIFF=YES)
# --------------------------------------------------------------------------


def _handcraft_bigtiff(tags, chunks, offsets_tag, bo="<"):
    """Handcrafted BigTIFF: 16-byte header (magic 43, offset size 8),
    u8 entry count, 20-byte IFD entries (tag u2, type u2, count u8,
    value/offset u8), 8-byte inline threshold. Offsets/counts arrays use
    LONG8 (type 16) like libtiff writes them."""
    n = len(tags)
    entries_end = 16 + 8 + 20 * n + 8
    sizes = {3: 2, 4: 4, 12: 8, 16: 8}
    fmts = {3: "H", 4: "I", 12: "d", 16: "Q"}
    extra_size = 0
    for tag, ftype, values in tags:
        count = len(chunks) if values is None else len(values)
        if sizes[ftype] * count > 8:
            extra_size += sizes[ftype] * count
    pos = entries_end + extra_size
    chunk_offsets = []
    for ch in chunks:
        chunk_offsets.append(pos)
        pos += len(ch)
    ents, extra = b"", b""
    for tag, ftype, values in tags:
        if values is None:
            values = chunk_offsets
        count = len(values)
        packed = struct.pack(bo + fmts[ftype] * count, *values)
        if sizes[ftype] * count <= 8:
            raw = packed.ljust(8, b"\0")
        else:
            raw = struct.pack(bo + "Q", entries_end + len(extra))
            extra += packed
        ents += struct.pack(bo + "HH", tag, ftype) + struct.pack(bo + "Q", count) + raw
    return (
        struct.pack(bo + "2sHHHQ", b"II" if bo == "<" else b"MM", 43, 8, 0, 16)
        + struct.pack(bo + "Q", n)
        + ents
        + struct.pack(bo + "Q", 0)
        + extra
        + b"".join(chunks)
    )


@pytest.mark.parametrize("bo", ["<", ">"])
def test_handcrafted_bigtiff_gray_both_byte_orders(bo):
    """BigTIFF single-strip gray decodes through the same tag machinery
    (20-byte entries, LONG8 offsets, 8-byte inline values)."""
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (5, 6), dtype=np.uint8)
    strip = img.tobytes()
    tags = [
        (256, 4, [6]), (257, 4, [5]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [1]), (273, 16, None), (277, 3, [1]), (278, 4, [5]),
        (279, 16, [len(strip)]),
    ]
    blob = _handcraft_bigtiff(tags, [strip], 273, bo=bo)
    assert codecs.sniff_fmt(blob) == "tiff"
    arr, geo = tiffcodec.decode_tiff(blob)
    assert geo is None
    assert np.array_equal(arr, img)


def test_handcrafted_bigtiff_tiled_geotiff():
    """BigTIFF + tiled organization + deflate + georef — the large-GDAL-
    archive combination (BIGTIFF=YES TILED=YES)."""
    import zlib

    rng = np.random.default_rng(42)
    w, h, tw, tl = 6, 5, 4, 4
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    chunks = []
    for r in range(2):
        for c in range(2):
            tile = np.zeros((tl, tw, 3), np.uint8)
            block = img[r * tl : (r + 1) * tl, c * tw : (c + 1) * tw]
            tile[: block.shape[0], : block.shape[1]] = block
            chunks.append(zlib.compress(tile.tobytes(), 6))
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [8]),
        (262, 3, [2]), (277, 3, [3]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 16, None),
        (325, 16, [len(ch) for ch in chunks]),
        (33550, 12, [3.0, 3.0, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, -500.0, 800.0, 0.0]),
        (34735, 3, [1, 1, 0, 2, 1024, 0, 1, 1, 3072, 0, 1, 3857]),
    ]
    blob = _handcraft_bigtiff(tags, chunks, 324)
    arr, g = tiffcodec.decode_tiff(blob)
    assert np.array_equal(arr, img)
    assert g["gsd"] == 3.0 and g["mx0"] == -500.0 and g["my1"] == 800.0 and g["epsg"] == 3857
    t = tiffcodec.read_tiff_tags(blob)
    assert (t["w"], t["h"]) == (w, h)


def test_bigtiff_bad_offset_size_raises():
    blob = struct.pack("<2sHHHQ", b"II", 43, 4, 0, 16) + bytes(16)
    with pytest.raises(ValueError, match="BigTIFF"):
        tiffcodec.decode_tiff(blob)


# --------------------------------------------------------------------------
# multi-IFD chain (GDAL internal overviews)
# --------------------------------------------------------------------------


def test_multi_ifd_overview_chain():
    """decode_tiff(ifd=k) reads the k-th internal overview directly (the
    gdaladdo layout: reduced levels as chained IFDs, georef on IFD 0
    only); read_tiff_tags reports the whole chain without touching pixel
    data."""
    rng = np.random.default_rng(51)
    full = rng.integers(0, 256, (32, 48, 3), np.uint8)
    ov1, ov2 = full[::2, ::2], full[::4, ::4]
    blob = tiffcodec.encode_tiff(
        full, geo={"gsd": 4.0, "mx0": 0.0, "my1": 128.0}, tile=16,
        compression="deflate", overviews=[ov1, ov2],
    )
    t = tiffcodec.read_tiff_tags(blob)
    assert t["n_ifds"] == 3
    assert [(d["w"], d["h"]) for d in t["ifds"]] == [(48, 32), (24, 16), (12, 8)]
    a0, g0 = tiffcodec.decode_tiff(blob)
    a1, g1 = tiffcodec.decode_tiff(blob, ifd=1)
    a2, g2 = tiffcodec.decode_tiff(blob, ifd=2)
    assert np.array_equal(a0, full) and np.array_equal(a1, ov1) and np.array_equal(a2, ov2)
    assert g0["gsd"] == 4.0 and g1 is None and g2 is None
    with pytest.raises(ValueError, match="3 IFD"):
        tiffcodec.decode_tiff(blob, ifd=3)


def test_handcrafted_two_ifd_chain():
    """Handcrafted two-IFD chain, independent of the writer: the second
    IFD is appended after the first segment's data and linked via the
    next-IFD pointer."""
    bo = "<"
    img0 = np.arange(24, dtype=np.uint8).reshape(4, 6)
    img1 = np.arange(6, dtype=np.uint8).reshape(2, 3) * 10

    def seg(img, base, nxt):
        h, w = img.shape
        strip = img.tobytes()
        tags = [
            (256, 4, [w]), (257, 4, [h]), (258, 3, [8]), (259, 3, [1]),
            (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [h]),
            (279, 4, [len(strip)]),
        ]
        n = len(tags)
        strip_off = base + 2 + 12 * n + 4
        ents = b""
        for tag, ftype, values in tags:
            if values is None:
                values = [strip_off]
            fmt = {3: "H", 4: "I"}[ftype]
            packed = struct.pack(bo + fmt * len(values), *values).ljust(4, b"\0")
            ents += struct.pack(bo + "HHI", tag, ftype, len(values)) + packed
        return struct.pack(bo + "H", n) + ents + struct.pack(bo + "I", nxt) + strip, strip_off + len(strip)

    base0 = 8
    s0, end0 = seg(img0, base0, 0)  # next patched below
    base1 = end0
    s0, _ = seg(img0, base0, base1)
    s1, _ = seg(img1, base1, 0)
    blob = struct.pack(bo + "2sHI", b"II", 42, base0) + s0 + s1
    t = tiffcodec.read_tiff_tags(blob)
    assert t["n_ifds"] == 2 and (t["ifds"][1]["w"], t["ifds"][1]["h"]) == (3, 2)
    assert np.array_equal(tiffcodec.decode_tiff(blob, ifd=1)[0], img1)


def test_ifd_cycle_guard():
    """An IFD whose next pointer loops back to itself terminates the
    chain walk instead of hanging."""
    img = np.zeros((2, 2), np.uint8)
    blob = bytearray(tiffcodec.encode_tiff(img))
    # single IFD: next pointer sits right after the 2 + 12n entry bytes
    n = struct.unpack("<H", blob[8:10])[0]
    nxt_pos = 8 + 2 + 12 * n
    blob[nxt_pos : nxt_pos + 4] = struct.pack("<I", 8)  # point back at IFD 0
    t = tiffcodec.read_tiff_tags(bytes(blob))
    assert t["n_ifds"] == 1  # cycle detected, chain truncated


# --------------------------------------------------------------------------
# JPEG-in-TIFF (compression 7, TIFF/EP — GDAL COMPRESS=JPEG)
# --------------------------------------------------------------------------


def _smooth_rgb(h, w):
    r = np.arange(h)[:, None] + np.zeros((1, w), np.int64)
    c = np.arange(w)[None, :] + np.zeros((h, 1), np.int64)
    return np.stack([(r * 2 + c) % 256, (r + c * 2) % 256, (r * 3) % 256], axis=-1).astype(
        np.uint8
    )


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_jpeg_in_tiff_roundtrip_strip_and_tiled():
    """Compression 7 decodes through the engine's own baseline JPEG
    codec for both organizations, gray and RGB, with georef intact."""
    img = _smooth_rgb(48, 64)
    for kwargs in ({}, {"tile": 16}):
        blob = tiffcodec.encode_tiff(
            img, compression="jpeg", geo={"gsd": 2.0, "mx0": 0.0, "my1": 96.0}, **kwargs
        )
        arr, g = tiffcodec.decode_tiff(blob)
        assert arr.shape == img.shape and g["gsd"] == 2.0
        assert _psnr(arr, img) >= 35, kwargs
    gray = ((np.arange(48)[:, None] * 5 + np.arange(64)[None, :] * 3) % 256).astype(np.uint8)
    arr, _ = tiffcodec.decode_tiff(tiffcodec.encode_tiff(gray, compression="jpeg", tile=32))
    assert arr.shape == (48, 64) and _psnr(arr, gray) >= 35


def _split_jpeg_tables(stream: bytes):
    """Factor a standalone baseline JPEG into (abbreviated tables stream,
    abbreviated image stream) per the TIFF/EP JPEGTables convention:
    DQT/DHT segments move to the tables stream (SOI [tables] EOI); the
    image stream keeps everything else."""
    pos = 2
    tables = b""
    body = b"\xff\xd8"
    while pos < len(stream):
        assert stream[pos] == 0xFF, hex(stream[pos])
        marker = stream[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / SOS: entropy data follows SOS
            body += stream[pos:]
            break
        ln = int.from_bytes(stream[pos + 2 : pos + 4], "big")
        seg = stream[pos : pos + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            body += seg
        pos += 2 + ln
    return b"\xff\xd8" + tables + b"\xff\xd9", body


def test_jpeg_in_tiff_with_jpegtables_tag():
    """The JPEGTables (347) form: shared DQT/DHT in the tag, per-tile
    abbreviated streams without them — the layout libtiff/GDAL write by
    default. Decoded pixels must be IDENTICAL to the self-contained
    form (same entropy data, same tables, only the packaging differs)."""
    from tilers_tools_spark.functions.jpegcodec import encode_jpeg

    img = _smooth_rgb(32, 48)
    tw = tl = 16
    full_streams = []
    for r0 in range(0, 32, tl):
        for c0 in range(0, 48, tw):
            full_streams.append(encode_jpeg(img[r0 : r0 + tl, c0 : c0 + tw]))
    tables, _ = _split_jpeg_tables(full_streams[0])
    bodies = [_split_jpeg_tables(s)[1] for s in full_streams]
    tags = [
        (256, 4, [48]), (257, 4, [32]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (277, 3, [3]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [len(b) for b in bodies]),
        (347, 7, list(tables)),
    ]
    arr, _ = tiffcodec.decode_tiff(_handcraft_chunked(tags, bodies, 324))
    # reference: the same streams decoded self-contained
    ref = np.zeros_like(img)
    from tilers_tools_spark.functions.jpegcodec import decode_jpeg

    i = 0
    for r0 in range(0, 32, tl):
        for c0 in range(0, 48, tw):
            ref[r0 : r0 + tl, c0 : c0 + tw] = decode_jpeg(full_streams[i])
            i += 1
    assert np.array_equal(arr, ref)
    assert _psnr(arr, img) >= 35


def test_jpeg_in_tiff_strip_form_with_tables():
    """Strip-organized compression 7 with RowsPerStrip < h and
    JPEGTables — each strip is a full-width abbreviated image."""
    from tilers_tools_spark.functions.jpegcodec import encode_jpeg

    img = _smooth_rgb(32, 40)
    rps = 16
    full = [encode_jpeg(img[r0 : r0 + rps]) for r0 in range(0, 32, rps)]
    tables, _ = _split_jpeg_tables(full[0])
    bodies = [_split_jpeg_tables(s)[1] for s in full]
    tags = [
        (256, 4, [40]), (257, 4, [32]), (258, 3, [8, 8, 8]), (259, 3, [7]),
        (262, 3, [6]), (273, 4, None), (277, 3, [3]), (278, 4, [rps]),
        (279, 4, [len(b) for b in bodies]),
        (347, 7, list(tables)),
    ]
    arr, _ = tiffcodec.decode_tiff(_handcraft_chunked(tags, bodies, 273))
    assert _psnr(arr, img) >= 35


def test_jpeg_in_tiff_16bit_raises():
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [16]), (259, 3, [7]),
        (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [4]),
    ]
    with pytest.raises(NotImplementedError, match="8-bit"):
        tiffcodec.decode_tiff(_handcraft_chunked(tags, [bytes(4)], 273))


# --------------------------------------------------------------------------
# property-based roundtrip (hypothesis)
# --------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


if _HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        bands=st.sampled_from([1, 3, 4]),
        bits=st.sampled_from([8, 16]),
        comp=st.sampled_from(["none", "deflate"]),
        tile=st.sampled_from([None, 8, (16, 4)]),
        n_ovr=st.integers(0, 2),
        data=st.integers(0, 2**32 - 1),
    )
    def test_roundtrip_property(h, w, bands, bits, comp, tile, n_ovr, data):
        """Any (shape, dtype, organization, compression, overview-chain)
        combination the writer accepts must decode back to the exact
        samples, with the tags-only parse agreeing on dimensions."""
        rng = np.random.default_rng(data)
        dt = np.uint8 if bits == 8 else np.uint16
        shape = (h, w) if bands == 1 else (h, w, bands)
        arr = rng.integers(0, np.iinfo(dt).max + 1, shape, dtype=dt)
        ovrs = []
        cur = arr
        for _ in range(n_ovr):
            cur = cur[::2, ::2]  # keeps ndim; size-1 dims stay size 1
            ovrs.append(cur)
        blob = tiffcodec.encode_tiff(arr, compression=comp, tile=tile, overviews=ovrs or None)
        dec, geo = tiffcodec.decode_tiff(blob, scale_16bit=False)
        assert geo is None
        assert np.array_equal(np.asarray(dec, dtype=dt), arr)
        t = tiffcodec.read_tiff_tags(blob)
        assert (t["w"], t["h"]) == (w, h)
        assert t["n_ifds"] == 1 + len(ovrs)
        for i, ov in enumerate(ovrs, start=1):
            d2, _ = tiffcodec.decode_tiff(blob, ifd=i, scale_16bit=False)
            assert np.array_equal(np.asarray(d2, dtype=dt), ov)


# --------------------------------------------------------------------------
# PlanarConfiguration=2 (separated planes, GDAL INTERLEAVE=BAND)
# --------------------------------------------------------------------------


def test_planar_strip_rgb_deflate_predictor():
    """Separated RGB strips: plane-major chunk order (all R strips, all G,
    all B), per-plane predictor differencing, deflate — handcrafted."""
    import zlib

    rng = np.random.default_rng(71)
    w, h, rps = 6, 4, 2
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    chunks = []
    for band in range(3):
        plane = img[:, :, band]
        for r0 in range(0, h, rps):
            seg = plane[r0 : r0 + rps].copy()
            diff = seg.copy()
            diff[:, 1:] = seg[:, 1:] - seg[:, :-1]
            chunks.append(zlib.compress(diff.tobytes(), 6))
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [8, 8, 8]), (259, 3, [8]),
        (262, 3, [2]), (273, 4, None), (277, 3, [3]), (278, 4, [rps]),
        (279, 4, [len(c) for c in chunks]), (284, 3, [2]), (317, 3, [2]),
    ]
    arr, _ = tiffcodec.decode_tiff(_handcraft_chunked(tags, chunks, 273))
    assert np.array_equal(arr, img)


def test_planar_tiled_16bit():
    """Separated TILED 16-bit: per-plane tile grids in plane-major order,
    raw samples surfaced with scale_16bit=False."""
    rng = np.random.default_rng(72)
    w, h, tw, tl = 5, 3, 4, 4
    img = rng.integers(0, 65536, (h, w, 3), dtype=np.uint16)
    chunks = []
    for band in range(3):
        for c0 in range(0, w, tw):
            tile = np.zeros((tl, tw), np.uint16)
            block = img[:, c0 : c0 + tw, band]
            tile[: block.shape[0], : block.shape[1]] = block
            chunks.append(tile.astype("<u2").tobytes())
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [16, 16, 16]), (259, 3, [1]),
        (262, 3, [2]), (277, 3, [3]), (284, 3, [2]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [len(c) for c in chunks]),
    ]
    raw, _ = tiffcodec.decode_tiff(_handcraft_chunked(tags, chunks, 324), scale_16bit=False)
    assert np.array_equal(raw.astype(np.uint16), img)


def test_planar_bad_chunk_count_raises():
    tags = [
        (256, 4, [4]), (257, 4, [2]), (258, 3, [8, 8, 8]), (259, 3, [1]),
        (262, 3, [2]), (273, 4, None), (277, 3, [3]), (278, 4, [2]),
        (279, 4, [8]), (284, 3, [2]),
    ]
    # 1 chunk for 3 planes: not divisible
    with pytest.raises(ValueError, match="not divisible"):
        tiffcodec.decode_tiff(_handcraft_chunked(tags, [bytes(8)], 273))


# --------------------------------------------------------------------------
# SampleFormat (tag 339): Int16 / Float32 DEM-style rasters
# --------------------------------------------------------------------------


def test_float32_dem_raw_and_scaled():
    """Float32 gray (the gdaldem/SRTM form): raw samples with
    scale_16bit=False; explicit float_range scales clip+linear+half-up;
    no range -> loud ValueError (no silent default)."""
    dem = np.array([[-10.0, 0.0], [250.0, 1000.0]], dtype=np.float32)
    strip = dem.astype("<f4").tobytes()
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [32]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [len(strip)]), (339, 3, [3]),
    ]
    blob = _handcraft_chunked(tags, [strip], 273)
    raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
    assert raw.dtype.kind == "f" and np.array_equal(raw.astype(np.float32), dem)
    with pytest.raises(ValueError, match="float_range"):
        tiffcodec.decode_tiff(blob)
    scaled, _ = tiffcodec.decode_tiff(blob, float_range=(0.0, 1000.0))
    # -10 clips to 0; 250/1000 -> 63.75+0.5 -> 64; 1000 -> 255
    assert scaled.tolist() == [[0, 0], [64, 255]]


def test_int16_dem_tiled_bigendian():
    """Int16 DEM, big-endian, tiled: raw signed samples survive."""
    dem = np.array([[-32768, -1, 0], [1, 2, 32767]], dtype=np.int16)
    tw = tl = 4
    tile = np.zeros((tl, tw), np.int16)
    tile[:2, :3] = dem
    tags = [
        (256, 4, [3]), (257, 4, [2]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (277, 3, [1]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [tl * tw * 2]), (339, 3, [2]),
    ]
    blob = _handcraft_chunked(tags, [tile.astype(">i2").tobytes()], 324, bo=">")
    raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
    assert raw.dtype.kind == "i" and np.array_equal(raw.astype(np.int16), dem)
    scaled, _ = tiffcodec.decode_tiff(blob, float_range=(-32768, 32767))
    assert scaled[0][0] == 0 and scaled[1][2] == 255


def test_float_predictor2_raises():
    tags = [
        (256, 4, [2]), (257, 4, [1]), (258, 3, [32]), (259, 3, [8]),
        (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [8]), (317, 3, [2]), (339, 3, [3]),
    ]
    import zlib

    strip = zlib.compress(bytes(8))
    tags[8] = (279, 4, [len(strip)])
    with pytest.raises(NotImplementedError, match="float"):
        tiffcodec.decode_tiff(_handcraft_chunked(tags, [strip], 273))


def test_external_writer_tiff_decodes_against_byte_slice_oracle():
    """A TIFF produced by an EXTERNAL writer (CPython's stdlib test data:
    Lib/test/test_email/data/python.tiff, PSF-licensed, checked in as
    tests/golden/external_writer_rgba.tiff) — every other fixture in this
    file is handcrafted by the repo, so tag-layout assumptions shared by
    our writer and reader (tag ordering, inline-vs-offset value packing,
    type-3/type-4 counts, ExtraSamples presence) could hide a structural
    misparse. This file exercises none of our byte-layout code on the
    expected side: it is uncompressed with pixel data at a known offset,
    so the expected pixels are a plain byte slice — an oracle fully
    independent of the decoder. (The LZW analogue still needs an external
    encoder; see ADVICE r5 — no LZW-capable producer exists offline.)"""
    p = os.path.join(os.path.dirname(__file__), "golden", "external_writer_rgba.tiff")
    b = open(p, "rb").read()
    assert hashlib.sha256(b).hexdigest() == (
        "f19a80d1c7d5d758dcea82276e73150454212a5136b19c5fc2727786132ddafd"
    )
    t = tiffcodec.read_tiff_tags(b)
    assert (t["w"], t["h"], t["bands"], t["bits"]) == (16, 16, 4, 8)
    assert t["compression"] == "none" and t["organization"] == "strip"
    px, geo = tiffcodec.decode_tiff(b)
    assert geo is None and px.shape == (16, 16, 4) and px.dtype == np.uint8
    # IFD sits at the end: strip data starts right after the 8-byte header
    raw = np.frombuffer(b[8 : 8 + 16 * 16 * 4], dtype=np.uint8).reshape(16, 16, 4)
    assert np.array_equal(px, raw)


def _tiff_lzw_compress(data: bytes) -> bytes:
    """Test-local REAL TIFF-LZW compressor (TIFF spec §13 / libtiff
    rules: MSB-first packing, ClearCode=256, EOI=257, EARLY-CHANGE width
    bump when the next free code reaches 2^width - 1, table reset at
    4094) — an independent producer exercising multi-byte table codes
    and the 9->10->11-bit transitions the repo's decoder-vs-own-encoder
    tests cannot disconfirm (ADVICE r4 fixture debt)."""
    CLEAR, EOI = 256, 257
    outbits = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            outbits.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    width = 9
    emit(CLEAR, width)
    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = nxt
        nxt += 1
        if nxt >= (1 << width) - 1 and width < 12:
            width += 1  # early change
        if nxt == 4094:
            emit(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if bitcnt:
        outbits.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(outbits)


@pytest.mark.parametrize("seed,n", [(0, 4000), (1, 20000), (2, 120000)])
def test_unlzw_vs_independent_real_compressor(seed, n):
    """Decoder vs the independent compressor across the 9->10 (510),
    10->11 (1022) and 11->12 width transitions and a 4094 table reset
    (the 120k-byte case crosses it)."""
    rng = np.random.default_rng(seed)
    # structured runs so the table fills with real multi-byte strings
    base = rng.integers(0, 256, n // 4)
    data = bytes(np.resize(np.repeat(base, rng.integers(1, 8, n // 4).astype(np.int64)), n).astype(np.uint8))
    assert tiffcodec._unlzw(_tiff_lzw_compress(data)) == data


# ---------------------------------------------------------------------------
# Floating-point Predictor=3 (TIFF TechNote 3 — the GDAL PREDICTOR=3 layout
# for compressed float DEMs). Pinned three independent ways: a hand-worked
# byte KAT, an INDEPENDENT scalar encoder transcribed from the published
# rule (no code shared with tiffcodec._fp_diff_rows), and writer roundtrips.
# ---------------------------------------------------------------------------


def _fp3_encode_scalar(block: np.ndarray) -> bytes:
    """Independent TechNote-3 encoder: per row, emit each sample's
    big-endian bytes into byte PLANES (most significant plane first),
    then byte-wise horizontal differencing with lag = samples-per-pixel.
    Plain scalar loops + struct.pack — shares nothing with the codec."""
    rows, w, c = block.shape
    bps = block.dtype.itemsize
    fmt = ">" + {4: "f", 8: "d"}[bps]
    out = bytearray()
    for r in range(rows):
        flat = []
        for p in range(bps):
            for i in range(w * c):
                flat.append(struct.pack(fmt, float(block[r, i // c, i % c]))[p])
        diffed = list(flat)
        for i in range(len(flat) - 1, c - 1, -1):
            diffed[i] = (flat[i] - flat[i - c]) & 0xFF
        out += bytes(diffed)
    return bytes(out)


def test_fp_predictor3_hand_kat():
    """One row [1.0, 2.0] float32: BE bytes 3F 80 00 00 / 40 00 00 00 ->
    MSB-first planes [3F,40],[80,00],[00,00],[00,00] -> lag-1 diff
    [3F,01,40,80,00,00,00,00] (worked by hand from TechNote 3)."""
    expected = bytes([0x3F, 0x01, 0x40, 0x80, 0, 0, 0, 0])
    arr = np.array([[1.0, 2.0]], dtype=np.float32)[:, :, None]
    assert tiffcodec._fp_diff_rows(arr) == expected
    assert _fp3_encode_scalar(arr) == expected
    tags = [
        (256, 4, [2]), (257, 4, [1]), (258, 3, [32]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [8]), (317, 3, [3]), (339, 3, [3]),
    ]
    blob = _handcraft_chunked(tags, [expected], 273)
    raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
    assert raw.dtype == np.float32
    assert np.array_equal(raw.squeeze(), np.array([1.0, 2.0], np.float32))


@pytest.mark.parametrize(
    "shape,dtype,bo",
    [((13, 7, 1), np.float32, "<"), ((6, 5, 3), np.float32, ">"), ((5, 4, 1), np.float64, "<")],
)
def test_fp_predictor3_independent_encoder_multistrip(shape, dtype, bo):
    """Handcrafted multi-strip deflate TIFF whose predictor-3 payload
    comes from the independent scalar encoder; strips split ROWS (the
    transform restarts each row, so per-strip == whole-image)."""
    import zlib

    rng = np.random.default_rng(7)
    h, w, c = shape
    a = (rng.standard_normal(shape) * 1e3).astype(dtype)
    a[0, 0, 0] = np.nan  # NaN byte patterns must survive bit-exact
    a[-1, -1, -1] = -np.inf
    rps = (h + 1) // 2
    chunks = [
        zlib.compress(_fp3_encode_scalar(a[r0 : min(r0 + rps, h)]))
        for r0 in range(0, h, rps)
    ]
    bits = 8 * np.dtype(dtype).itemsize
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * c), (259, 3, [8]),
        (262, 3, [1 if c == 1 else 2]), (273, 4, None), (277, 3, [c]),
        (278, 4, [rps]), (279, 4, [len(ch) for ch in chunks]),
        (317, 3, [3]), (339, 3, [3] * c),
    ]
    blob = _handcraft_chunked(tags, chunks, 273, bo=bo)
    raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
    assert raw.dtype == np.dtype(dtype)
    assert np.array_equal(raw.squeeze(), a.squeeze(), equal_nan=True)


def test_fp_predictor3_independent_encoder_tiled():
    """Tiled organization: predictor-3 payload per TILE (differencing
    restarts at each tile's left edge), edge tiles zero-padded."""
    import zlib

    rng = np.random.default_rng(11)
    h, w, c = 7, 10, 1
    tw = tl = 4
    a = (rng.standard_normal((h, w, c)) * 50).astype(np.float32)
    across, down = (w + tw - 1) // tw, (h + tl - 1) // tl
    padded = np.zeros((down * tl, across * tw, c), np.float32)
    padded[:h, :w] = a
    chunks = [
        zlib.compress(_fp3_encode_scalar(padded[r * tl : (r + 1) * tl, col * tw : (col + 1) * tw]))
        for r in range(down)
        for col in range(across)
    ]
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [32]), (259, 3, [8]),
        (262, 3, [1]), (277, 3, [1]), (317, 3, [3]),
        (322, 4, [tw]), (323, 4, [tl]), (324, 4, None),
        (325, 4, [len(ch) for ch in chunks]), (339, 3, [3]),
    ]
    blob = _handcraft_chunked(tags, chunks, 324)
    raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
    assert np.array_equal(raw.squeeze(), a.squeeze())


def test_fp_predictor3_writer_roundtrip():
    rng = np.random.default_rng(3)
    for shape, dtype in [((9, 6), np.float32), ((5, 7, 3), np.float32), ((4, 3), np.float64)]:
        a = (rng.standard_normal(shape) * 777).astype(dtype)
        for tile in (None, 4):
            blob = tiffcodec.encode_tiff(a, compression="deflate", tile=tile, predictor=3)
            raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
            assert np.array_equal(raw.squeeze(), a.squeeze()), (shape, dtype, tile)


def test_predictor2_int_writer_roundtrip():
    rng = np.random.default_rng(4)
    dem = rng.integers(-500, 4000, (11, 9), dtype=np.int16)
    for tile in (None, 4):
        blob = tiffcodec.encode_tiff(dem, compression="deflate", tile=tile, predictor=2)
        raw, _ = tiffcodec.decode_tiff(blob, scale_16bit=False)
        assert np.array_equal(raw.squeeze(), dem)
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    blob = tiffcodec.encode_tiff(rgb, compression="deflate", predictor=2)
    arr, _ = tiffcodec.decode_tiff(blob)
    assert np.array_equal(arr, rgb)


def test_predictor3_on_int_raises():
    tags = [
        (256, 4, [2]), (257, 4, [1]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [1]), (273, 4, None), (277, 3, [1]), (278, 4, [1]),
        (279, 4, [4]), (317, 3, [3]),
    ]
    with pytest.raises(NotImplementedError, match="non-float"):
        tiffcodec.decode_tiff(_handcraft_chunked(tags, [bytes(4)], 273))
    with pytest.raises(ValueError, match="float-only"):
        tiffcodec.encode_tiff(np.zeros((2, 2), np.int16), compression="deflate", predictor=3)
    with pytest.raises(ValueError, match="integer-only"):
        tiffcodec.encode_tiff(np.zeros((2, 2), np.float32), compression="deflate", predictor=2)
