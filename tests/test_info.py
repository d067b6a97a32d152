"""gdalinfo / gdaltindex / gdalcompare / gdal_edit parity units
(operators/info.py + tiffcodec.rewrite_georef). The gate queries pin the
happy paths cross-engine; these tests pin the edge paths: BigTIFF and
big-endian splices, byte-identity outside the spliced windows, fail-loud
guards, the non-georeferenced audit/skip behavior, and the compare
shape-mismatch path."""

from __future__ import annotations

import os
import struct
import sys

import numpy as np
import pytest

from tilers_tools_spark.functions import tiffcodec
from tilers_tools_spark.operators import info

sys.path.insert(0, os.path.dirname(__file__))


def _geo_img(a=None, gsd=2.0, mx0=100.0, my1=5000.0, **enc):
    if a is None:
        a = np.arange(20, dtype=np.float32).reshape(4, 5)
    return a, tiffcodec.encode_tiff(
        a, geo={"gsd": gsd, "mx0": mx0, "my1": my1, "epsg": 3857}, **enc
    )


def test_rewrite_georef_shift_and_byte_identity():
    """dx/dy translation: pixels bit-identical, and the edited blob
    differs from the original ONLY inside the two spliced double blocks
    (24B scale + 48B tiepoint) — the gdal_edit 'metadata only' contract
    at the byte level."""
    a, blob = _geo_img(compression="deflate", tile=None)
    out = tiffcodec.rewrite_georef(blob, dx=10.5, dy=-3.25)
    assert len(out) == len(blob)
    n_diff = sum(x != y for x, y in zip(blob, out))
    assert 0 < n_diff <= 24 + 48
    b, g = tiffcodec.decode_tiff(out, scale_16bit=False)
    assert np.array_equal(b, a)
    assert g["mx0"] == 100.0 + 10.5 and g["my1"] == 5000.0 - 3.25
    assert g["gsd"] == 2.0 and g["epsg"] == 3857


def test_rewrite_georef_absolute_ullr_and_gsd():
    a, blob = _geo_img()
    out = tiffcodec.rewrite_georef(blob, gsd=8.0, mx0=-200.0, my1=999.0)
    _, g = tiffcodec.decode_tiff(out, scale_16bit=False)
    assert (g["gsd"], g["mx0"], g["my1"]) == (8.0, -200.0, 999.0)
    # mx1/my0 follow the new gsd
    assert g["mx1"] == -200.0 + 5 * 8.0 and g["my0"] == 999.0 - 4 * 8.0


def test_rewrite_georef_tiled_with_overviews():
    """Splice must not disturb tiled chunk offsets or the overview IFD
    chain."""
    a = np.arange(24 * 40, dtype=np.float32).reshape(24, 40)
    blob = tiffcodec.encode_tiff(
        a, geo={"gsd": 1.0, "mx0": 0.0, "my1": 24.0, "epsg": 3857},
        compression="deflate", tile=16, overviews=[a[::2, ::2]],
    )
    out = tiffcodec.rewrite_georef(blob, dx=7.0)
    t = tiffcodec.read_tiff_tags(out)
    assert t["n_ifds"] == 2 and t["geo"]["mx0"] == 7.0
    b, _ = tiffcodec.decode_tiff(out, scale_16bit=False)
    assert np.array_equal(b, a)
    ov, _ = tiffcodec.decode_tiff(out, scale_16bit=False, ifd=1)
    assert np.array_equal(ov, a[::2, ::2])


@pytest.mark.parametrize("bo", ["<", ">"])
def test_rewrite_georef_bigtiff_both_byte_orders(bo):
    """BigTIFF (20-byte entries, LONG8 offsets): splice through the
    8-byte-inline-threshold layout, both byte orders."""
    from test_tiffcodec import _handcraft_bigtiff

    img = np.arange(30, dtype=np.uint8).reshape(5, 6)
    strip = img.tobytes()
    tags = [
        (256, 4, [6]), (257, 4, [5]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [1]), (273, 16, None), (277, 3, [1]), (278, 4, [5]),
        (279, 16, [len(strip)]),
        (33550, 12, [3.0, 3.0, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, 60.0, 90.0, 0.0]),
    ]
    blob = _handcraft_bigtiff(tags, [strip], 273, bo=bo)
    out = tiffcodec.rewrite_georef(blob, dx=-60.0, dy=10.0, gsd=1.5)
    arr, g = tiffcodec.decode_tiff(out)
    assert np.array_equal(arr, img)
    assert (g["gsd"], g["mx0"], g["my1"]) == (1.5, 0.0, 100.0)


def test_rewrite_georef_guards():
    a = np.ones((2, 2), np.float32)
    plain = tiffcodec.encode_tiff(a)  # no georef
    with pytest.raises(ValueError, match="no ModelPixelScale"):
        tiffcodec.rewrite_georef(plain, dx=1.0)
    # non-(0,0)-anchored tiepoint: absolute edit refuses, translation ok
    _, blob = _geo_img()
    anchored = bytearray(blob)
    t = tiffcodec._parse_ifd(blob)[0]  # sanity: parses
    assert t is not None
    # find the tiepoint block and set i0=1.0
    idx = blob.find(struct.pack("<6d", 0.0, 0.0, 0.0, 100.0, 5000.0, 0.0))
    assert idx > 0
    anchored[idx : idx + 8] = struct.pack("<d", 1.0)
    with pytest.raises(ValueError, match="anchored"):
        tiffcodec.rewrite_georef(bytes(anchored), mx0=0.0)
    out = tiffcodec.rewrite_georef(bytes(anchored), dx=5.0)
    _, g = tiffcodec.decode_tiff(out, scale_16bit=False)
    # translation applies to the raw tiepoint x: mx0 = (x+dx) - i0*gsd
    assert g["mx0"] == (100.0 + 5.0) - 1.0 * 2.0


def test_raster_info_and_tindex_non_geo(spark):
    """gdalinfo reports a non-georeferenced raster with NaN geo columns
    and epsg -1 (auditable); gdaltindex skips it (warn-and-skip)."""
    a, geo_blob = _geo_img()
    plain = tiffcodec.encode_tiff(np.ones((3, 4), np.uint8))
    df = spark.createDataFrame(
        [("g", geo_blob), ("p", plain)], "image_id string, bytes binary"
    )
    inf = {r["image_id"]: r for r in info.raster_info(df).collect()}
    gsd_p = inf["p"]["gsd"]
    assert inf["p"]["epsg"] == -1 and (gsd_p is None or np.isnan(gsd_p))
    assert inf["p"]["width"] == 4 and inf["p"]["bands"] == 1
    assert inf["g"]["epsg"] == 3857 and inf["g"]["mx1"] == 100.0 + 5 * 2.0
    tix = info.raster_tindex(df).collect()
    assert [r["image_id"] for r in tix] == ["g"]
    assert tix[0]["wkt"].startswith("POLYGON ((100.000 4992.000, 110.000 4992.000")


def test_raster_compare_shape_mismatch(spark):
    a1, b1 = _geo_img(np.ones((4, 5), np.float32))
    a2, b2 = _geo_img(np.ones((5, 4), np.float32))
    out = info.raster_compare(
        spark.createDataFrame([("x", b1)], "image_id string, bytes binary"),
        spark.createDataFrame([("x", b2)], "image_id string, bytes binary"),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert not r["identical"] and r["n_diff"] == 20 and r["max_qdiff"] == -1


def test_georef_edit_operator_roundtrip(spark):
    a, blob = _geo_img(compression="deflate")
    df = spark.createDataFrame([("x", blob)], "image_id string, bytes binary")
    row = info.georef_edit(df, dx=100.0, dy=200.0).collect()[0]
    assert row["pixels_unchanged"] and row["mx0"] == 200.0 and row["my1"] == 5200.0
    # the edited blob in the output column is itself a valid GeoTIFF
    b, g = tiffcodec.decode_tiff(bytes(row["bytes"]), scale_16bit=False)
    assert np.array_equal(b, a) and g["mx0"] == 200.0


def test_pct2rgb_palette_tiff_and_guards(spark):
    """pct2rgb accepts palette TIFF (photometric 3, ColorMap LUT) as well
    as paletted PNG, and raises loudly on grayscale input."""
    from test_tiffcodec import _handcraft_tags

    from tilers_tools_spark.operators import multimodal

    idx = np.array([[0, 1], [2, 1]], np.uint8)
    reds, greens, blues = [10, 20, 30], [40, 50, 60], [70, 80, 90]
    full = (
        [v << 8 for v in reds] + [0] * 253
        + [v << 8 for v in greens] + [0] * 253
        + [v << 8 for v in blues] + [0] * 253
    )
    tags = [
        (256, 4, [2]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [3]), (273, 4, None), (277, 3, [1]), (278, 4, [2]),
        (279, 4, [4]), (320, 3, full),
    ]
    blob = _handcraft_tags(tags, idx.tobytes())
    df = spark.createDataFrame([("t", blob)], "image_id string, bytes binary")
    row = multimodal.pct2rgb(df).collect()[0]
    assert (row["w"], row["h"], row["n_colors"]) == (2, 2, 3)
    assert row["r_sum"] == 10 + 20 + 30 + 20 and row["b_sum"] == 70 + 80 + 90 + 80
    # expanded blob decodes back to the same RGB
    from tilers_tools_spark.functions import codecs

    rgb = codecs.decode_image(bytes(row["bytes"]), "png")
    assert list(rgb[0, 0]) == [10, 40, 70]

    gray = codecs.encode_png(np.ones((3, 3), np.uint8) * 7)
    gdf = spark.createDataFrame([("g", gray)], "image_id string, bytes binary")
    with pytest.raises(Exception, match="grayscale"):
        multimodal.pct2rgb(gdf).collect()


def test_vrt_build_hand_pins(spark):
    """gdalbuildvrt analogue: hand-computed placement on a 2-source
    mosaic (gsd 2 and 4, average res 3): union extent 0..24 x 0..20,
    vrt 8x7 (24/3=8, 20/3=6.67->7); src0 20x16 @ (0,0) -> dst
    7x5 @ (0,0) ... all from scalar arithmetic. highest/lowest swap
    the res rule; georef-less rasters are skipped; mixed SRS yields
    -1 offsets."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info

    px = np.zeros((8, 10), np.uint8)
    rows = [
        ("m", "s0", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 20.0, "epsg": 3857})),
        ("m", "s1", tiffcodec.encode_tiff(px, geo={"gsd": 4.0, "mx0": 4.0, "my1": 16.0, "epsg": 3857})),
        ("m", "nogeo", tiffcodec.encode_tiff(px)),
    ]
    df = spark.createDataFrame(rows, "vrt_group string, image_id string, bytes binary")
    out = {r["image_id"]: r for r in info.vrt_build(df).collect()}
    assert "nogeo" not in out and len(out) == 2
    # s0: 10x8 @ gsd2 -> extent 0..20 x 4..20; s1: 10x8 @ gsd4 -> 4..44 x -16..16
    # union: 0..44 x -16..20; res avg = 3 -> vrt_w = floor(44/3+.5)=15,
    # vrt_h = floor(36/3+.5)=12
    r0 = out["s0"]
    assert (r0["vrt_w"], r0["vrt_h"], r0["n_sources"], r0["n_srs"]) == (15, 12, 2, 1)
    assert r0["res"] == 3.0 and r0["vmx0"] == 0.0 and r0["vmy1"] == 20.0
    assert (r0["dst_xoff"], r0["dst_yoff"]) == (0, 0)
    # dst sizes: 10*2/3 = 6.67 -> 7; 8*2/3 = 5.33 -> 5
    assert (r0["dst_xsize"], r0["dst_ysize"]) == (7, 5)
    r1 = out["s1"]
    # xoff 4/3=1.33->1; yoff (20-16)/3=1.33->1; sizes 40/3->13, 32/3->11
    assert (r1["dst_xoff"], r1["dst_yoff"], r1["dst_xsize"], r1["dst_ysize"]) == (1, 1, 13, 11)

    hi = {r["image_id"]: r for r in info.vrt_build(df, resolution="highest").collect()}
    assert hi["s0"]["res"] == 2.0 and hi["s0"]["vrt_w"] == 22
    lo = {r["image_id"]: r for r in info.vrt_build(df, resolution="lowest").collect()}
    assert lo["s0"]["res"] == 4.0 and lo["s0"]["vrt_w"] == 11

    mixed = spark.createDataFrame(
        [
            ("x", "u0", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 16.0, "epsg": 3857})),
            ("x", "u1", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 16.0, "epsg": 32601})),
        ],
        "vrt_group string, image_id string, bytes binary",
    )
    m = info.vrt_build(mixed).collect()
    assert all(r["n_srs"] == 2 and r["dst_xoff"] == -1 and r["dst_ysize"] == -1 for r in m)

    with pytest.raises(ValueError, match="resolution"):
        info.vrt_build(df, resolution="user")


def test_cog_check_and_addo_cog_pipeline(spark):
    """build_overviews(tile=16, cog_layout=True) output passes every
    cog_check box; the same content main-data-first fails exactly the
    data-order box; decode of every IFD is identical across layouts."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info, translate as tr

    a = ((np.arange(40)[:, None] * 3 + np.arange(36)[None, :]) % 199).astype(np.uint8)
    geo = {"gsd": 1.0, "mx0": 0.0, "my1": 40.0, "epsg": 3857}
    src = spark.createDataFrame(
        [("r", tiffcodec.encode_tiff(a, geo=geo))], "image_id string, bytes binary"
    )
    cog = tr.build_overviews(src, levels=(2, 4), tile=16, cog_layout=True)
    chk = info.cog_check(cog).collect()[0]
    assert chk["cog_ok"] and chk["n_overviews"] == 2

    plain = tr.build_overviews(src, levels=(2, 4), tile=16)
    chk2 = info.cog_check(plain).collect()[0]
    assert not chk2["cog_ok"] and chk2["tiled_ok"] and chk2["overviews_ok"]
    assert chk2["decreasing_ok"] and not chk2["data_order_cog"]

    # both layouts decode identically at every IFD, georef survives
    b_cog = bytes(cog.collect()[0]["bytes"])
    b_pln = bytes(plain.collect()[0]["bytes"])
    for k in range(3):
        d1, g1 = tiffcodec.decode_tiff(b_cog, ifd=k)
        d2, _ = tiffcodec.decode_tiff(b_pln, ifd=k)
        assert (d1 == d2).all()
    assert g1 is not None or k > 0
    g0 = tiffcodec.decode_tiff(b_cog)[1]
    assert g0["epsg"] == 3857 and g0["gsd"] == 1.0


def test_vrt_xml_roundtrip_and_structure(spark):
    """vrt_xml emits the published VRTDataset shape (hand-pinned header,
    deterministic source order) and vrt_parse inverts it bit-for-bit;
    mixed-SRS groups have no legal VRT and drop out; rotated / non-VRT
    documents are refused by the parser."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info

    px = np.zeros((8, 10), np.uint8)
    rows = [
        ("m", "s0", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 20.0, "epsg": 3857})),
        ("m", "s1", tiffcodec.encode_tiff(px, geo={"gsd": 4.0, "mx0": 4.0, "my1": 16.0, "epsg": 3857})),
        ("x", "u0", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 16.0, "epsg": 3857})),
        ("x", "u1", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 16.0, "epsg": 32601})),
    ]
    df = spark.createDataFrame(rows, "vrt_group string, image_id string, bytes binary")
    placement = info.vrt_build(df).cache()
    xml = {r["vrt_group"]: r["vrt_xml"] for r in info.vrt_xml(placement).collect()}
    # mixed-SRS group x: gdalbuildvrt refuses -> no VRT document
    assert set(xml) == {"m"}
    doc = xml["m"]
    # hand-pinned structure: header, SRS, geotransform start, source order
    assert doc.startswith('<VRTDataset rasterXSize="15" rasterYSize="12">')
    assert "<SRS>EPSG:3857</SRS>" in doc
    gt_text = doc.split("<GeoTransform>")[1].split("</GeoTransform>")[0]
    assert [float(v) for v in gt_text.split(",")] == [0.0, 3.0, 0.0, 20.0, 0.0, -3.0]
    assert doc.index(">s0<") < doc.index(">s1<")  # sorted by image_id
    assert doc.count("<SimpleSource>") == 2
    assert '<DstRect xOff="1" yOff="1" xSize="13" ySize="11"/>' in doc

    back = info.vrt_parse(spark.createDataFrame([("m", doc)], "vrt_group string, vrt_xml string"))
    want = {
        r["image_id"]: r for r in placement.filter("vrt_group = 'm'").collect()
    }
    got = {r["image_id"]: r for r in back.collect()}
    assert set(got) == set(want)
    for iid, w in want.items():
        g = got[iid]
        for c in ("n_sources", "n_srs", "res", "vrt_w", "vrt_h", "vmx0", "vmy1",
                  "dst_xoff", "dst_yoff", "dst_xsize", "dst_ysize",
                  "src_w", "src_h", "epsg"):
            assert g[c] == w[c], (iid, c, g[c], w[c])
    placement.unpersist()

    # refusals: rotated geotransform, junk, wrong root tag -> zero rows
    rot = doc.replace(gt_text, "0, 3, 1, 20, 0, -3")
    bad = spark.createDataFrame(
        [("r", rot), ("j", "not xml <"), ("t", "<NotVRT></NotVRT>")],
        "vrt_group string, vrt_xml string",
    )
    assert info.vrt_parse(bad).count() == 0


def test_vrt_xml_float_roundtrip_17g(spark):
    """%.17g double rendering round-trips an awkward geotransform origin
    bit-for-bit through XML text."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info

    gsd = 19.109257071294063
    mx0 = 11990.445371464353
    my1 = -33990.44537146435
    px = np.zeros((4, 4), np.uint8)
    df = spark.createDataFrame(
        [("g", "a", tiffcodec.encode_tiff(px, geo={"gsd": gsd, "mx0": mx0, "my1": my1, "epsg": 3857}))],
        "vrt_group string, image_id string, bytes binary",
    )
    placement = info.vrt_build(df)
    back = info.vrt_parse(info.vrt_xml(placement)).collect()[0]
    assert back["res"] == gsd and back["vmx0"] == mx0 and back["vmy1"] == my1


def test_vrt_parse_refuses_nonconforming_and_escapes_ids(spark):
    """Review hardening: (1) well-formed but non-conforming documents
    (no GeoTransform, empty SRS code, partial Rect, zero x-res) yield
    zero rows instead of killing the task; (2) ids with XML metachars
    are escaped on write and round-trip unharmed."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info

    px = np.zeros((4, 5), np.uint8)
    df = spark.createDataFrame(
        [("g", "a&b<c>", tiffcodec.encode_tiff(px, geo={"gsd": 2.0, "mx0": 0.0, "my1": 8.0, "epsg": 3857}))],
        "vrt_group string, image_id string, bytes binary",
    )
    placement = info.vrt_build(df)
    doc = info.vrt_xml(placement).collect()[0]["vrt_xml"]
    assert "a&amp;b&lt;c&gt;" in doc and "a&b<c>" not in doc
    back = info.vrt_parse(
        spark.createDataFrame([("g", doc)], "vrt_group string, vrt_xml string")
    ).collect()
    assert len(back) == 1 and back[0]["image_id"] == "a&b<c>"

    bad_docs = [
        ("nogt", '<VRTDataset rasterXSize="1" rasterYSize="1"></VRTDataset>'),
        ("emptysrs", doc.replace("EPSG:3857", "EPSG:")),
        ("zerores", doc.replace(
            doc.split("<GeoTransform>")[1].split("</GeoTransform>")[0],
            "0, 0, 0, 8, 0, -2")),
        ("norect", '<VRTDataset rasterXSize="1" rasterYSize="1">'
                   "<GeoTransform>0, 1, 0, 1, 0, -1</GeoTransform>"
                   "<VRTRasterBand><SimpleSource>"
                   "<SourceFilename>x</SourceFilename>"
                   "</SimpleSource></VRTRasterBand></VRTDataset>"),
    ]
    bad = spark.createDataFrame(bad_docs, "vrt_group string, vrt_xml string")
    assert info.vrt_parse(bad).count() == 0


def test_vrt_xml_skips_no_crs_groups(spark):
    """A georeferenced group WITHOUT a CRS code (epsg -1 placement rows —
    e.g. a foreign GeoTIFF missing its GeoKey directory) has no legal VRT
    (GDAL could not assign an SRS) — vrt_xml skips it like mixed-SRS
    groups. Placement row built directly: the engine's own encoder always
    writes a GeoKey, so this state only arrives from foreign files."""
    from tilers_tools_spark.operators import info

    placement = spark.createDataFrame(
        [("g", "a", 1, 1, 2.0, 5, 4, 0.0, 8.0, 0, 0, 5, 4, 5, 4, -1)],
        "vrt_group string, image_id string, n_sources long, n_srs long, "
        "res double, vrt_w int, vrt_h int, vmx0 double, vmy1 double, "
        "dst_xoff int, dst_yoff int, dst_xsize int, dst_ysize int, "
        "src_w int, src_h int, epsg int",
    )
    assert info.vrt_xml(placement).count() == 0
