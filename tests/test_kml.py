"""KML SuperOverlay (operators/convert.py::kml_superoverlay +
sources/tileset.py::write_superoverlay_kml) — the reference toolchain's
Google-Earth output mode. XML structure is parsed with ElementTree;
GroundOverlay/Region bounds are checked against the independent NumPy
tile math (tile_bounds_np + inv_merc_np); link topology (which children
are linked) is checked against a brute-force parent map.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from tilers_tools_spark.functions import tilemath as tmn
from tilers_tools_spark.operators.convert import kml_superoverlay

NS = {"k": "http://www.opengis.net/kml/2.2"}


def _tiles_df(spark):
    # a 2-level pyramid with a deliberate hole: parent (3,2,5) keeps only
    # 3 of its 4 children; parent (3,3,5) has none
    rows = [(3, 2, 5), (3, 3, 5), (4, 4, 10), (4, 5, 10), (4, 4, 11)]
    return spark.createDataFrame(rows, "z long, x long, y long")


def test_kml_superoverlay_columns(spark):
    out = {(r["z"], r["x"], r["y"]): r for r in kml_superoverlay(_tiles_df(spark)).collect()}
    assert len(out) == 5
    p = out[(3, 2, 5)]
    assert p["n_children"] == 3
    assert p["children_csv"] == "4:10,4:11,5:10"
    # xyz flip: y_xyz = 2^3 - 1 - 5 = 2
    assert p["doc_path"] == "3/2/2.kml" and p["img_href"] == "2.png"
    assert out[(3, 3, 5)]["n_children"] == 0
    assert out[(3, 3, 5)]["children_csv"] == ""
    for c in ((4, 4, 10), (4, 5, 10), (4, 4, 11)):
        assert out[c]["n_children"] == 0


def test_kml_document_structure_and_bounds(spark):
    out = {(r["z"], r["x"], r["y"]): r for r in kml_superoverlay(_tiles_df(spark)).collect()}
    p = out[(3, 2, 5)]
    root = ET.fromstring(p["kml"])
    doc = root.find("k:Document", NS)
    # GroundOverlay bounds == independent NumPy tile math
    go = doc.find("k:GroundOverlay", NS)
    assert go.find("k:Icon/k:href", NS).text == "2.png"
    assert go.find("k:drawOrder", NS).text == "3"
    box = go.find("k:LatLonBox", NS)
    mx0, my0, mx1, my1 = tmn.tile_bounds_np(3, 2, 5)
    w_deg, s_deg = tmn.inv_merc_np(mx0, my0)
    e_deg, n_deg = tmn.inv_merc_np(mx1, my1)
    assert abs(float(box.find("k:north", NS).text) - n_deg) < 1e-8
    assert abs(float(box.find("k:south", NS).text) - s_deg) < 1e-8
    assert abs(float(box.find("k:east", NS).text) - e_deg) < 1e-8
    assert abs(float(box.find("k:west", NS).text) - w_deg) < 1e-8
    # Region gate present with the LOD threshold
    lod = doc.find("k:Region/k:Lod", NS)
    assert lod.find("k:minLodPixels", NS).text == "128"
    assert lod.find("k:maxLodPixels", NS).text == "-1"
    # one NetworkLink per existing child, href into the xyz-flipped path
    links = doc.findall("k:NetworkLink", NS)
    hrefs = sorted(ln.find("k:Link/k:href", NS).text for ln in links)
    # children (4,10),(4,11),(5,10) at z=4 -> y_xyz = 15 - y
    assert hrefs == ["../../4/4/5.kml", "../../4/4/4.kml", "../../4/5/5.kml"] or sorted(
        hrefs
    ) == sorted(["../../4/4/5.kml", "../../4/4/4.kml", "../../4/5/5.kml"])
    for ln in links:
        assert ln.find("k:Link/k:viewRefreshMode", NS).text == "onRegion"
        # child Region bounds match the child's own tile bounds
        nm = ln.find("k:name", NS).text  # "z/x/y" in TMS
        cz, cx, cy = map(int, nm.split("/"))
        bx0, by0, bx1, by1 = tmn.tile_bounds_np(cz, cx, cy)
        cw, cs = tmn.inv_merc_np(bx0, by0)
        ce, cn = tmn.inv_merc_np(bx1, by1)
        bb = ln.find("k:Region/k:LatLonAltBox", NS)
        assert abs(float(bb.find("k:north", NS).text) - cn) < 1e-8
        assert abs(float(bb.find("k:west", NS).text) - cw) < 1e-8
    # leaf doc has no links
    leaf = ET.fromstring(out[(4, 4, 10)]["kml"])
    assert leaf.find("k:Document", NS).findall("k:NetworkLink", NS) == []


def test_write_superoverlay_tree(spark, tmp_path):
    from tilers_tools_spark.sources.tileset import write_superoverlay_kml

    dest = str(tmp_path / "kmltree")
    write_superoverlay_kml(_tiles_df(spark), dest, name="demo")
    root = ET.parse(os.path.join(dest, "doc.kml")).getroot()
    doc = root.find("k:Document", NS)
    assert doc.find("k:name", NS).text == "demo"
    top = sorted(ln.find("k:Link/k:href", NS).text for ln in doc.findall("k:NetworkLink", NS))
    assert top == ["3/2/2.kml", "3/3/2.kml"]
    # every linked child resolves to a file on disk
    for dirpath, _d, files in os.walk(dest):
        for fn in files:
            if not fn.endswith(".kml") or fn == "doc.kml":
                continue
            t = ET.parse(os.path.join(dirpath, fn)).getroot().find("k:Document", NS)
            for ln in t.findall("k:NetworkLink", NS):
                href = ln.find("k:Link/k:href", NS).text
                assert os.path.exists(os.path.normpath(os.path.join(dirpath, href))), href
