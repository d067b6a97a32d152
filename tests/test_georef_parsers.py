"""M8 — chart parsers + GCP affine fit (map2gdal role) on synthetic headers."""

import numpy as np

from tilers_tools_spark.functions import georef_parsers as gp
from tilers_tools_spark.functions import tilemath as tm


def _make_ozi(gcps, border_ll):
    lines = ["OziExplorer Map Data File Version 2.2", "Test Map", "test.png", "1 ,Map Code,"]
    for i, (px, py, lon, lat) in enumerate(gcps, 1):
        lad, lam = int(abs(lat)), (abs(lat) - int(abs(lat))) * 60
        lod, lom = int(abs(lon)), (abs(lon) - int(abs(lon))) * 60
        lines.append(
            f"Point{i:02d},xy, {int(px)}, {int(py)},in, deg, {lad}, {lam:.6f},{'N' if lat >= 0 else 'S'},"
            f" {lod}, {lom:.6f},{'E' if lon >= 0 else 'W'}, grid, , , ,N"
        )
    lines.append(f"MMPNUM,{len(border_ll)}")
    for i, (lon, lat) in enumerate(border_ll, 1):
        lines.append(f"MMPXY,{i},{i*10},{i*20}")
    for i, (lon, lat) in enumerate(border_ll, 1):
        lines.append(f"MMPLL,{i}, {lon:.6f}, {lat:.6f}")
    return "\n".join(lines)


def test_ozi_parse_and_affine_roundtrip():
    # synth ground truth: corner-origin affine, gsd 50 m/px at (10E, 45N)
    gsd = 50.0
    mx0, my1 = tm.merc_np(np.array([10.0]), np.array([45.0]))
    mx0, my1 = float(mx0[0]), float(my1[0])
    pts = [(0, 0), (1000, 0), (0, 800), (1000, 800), (500, 400)]
    gcps = []
    for px, py in pts:
        lon, lat = tm.inv_merc_np(np.array([mx0 + gsd * px]), np.array([my1 - gsd * py]))
        gcps.append((px, py, float(lon[0]), float(lat[0])))
    text = _make_ozi(gcps, [(10.0, 45.0), (10.5, 45.0), (10.5, 44.7)])
    parsed = gp.parse_ozi_map(text)
    assert len(parsed["gcps"]) == 5 and len(parsed["border_ll"]) == 3
    A = gp.fit_affine_3857(parsed["gcps"])
    assert abs(A[0, 0] - gsd) < 1e-3 and abs(-A[1, 1] - gsd) < 1e-3
    g = gp.affine_to_georef(A, 1000, 800)
    assert abs(g["mx0"] - mx0) < 1.0 and abs(g["my1"] - my1) < 1.0
    assert abs(g["gsd"] - gsd) < 1e-3


def test_kap_parse():
    hdr = (
        b"! BSB chart header\r\n"
        b"BSB/NA=TEST CHART,NU=123,RA=1000,800\r\n"
        b"REF/1,0,0,45.0,10.0\r\n"
        b"REF/2,1000,0,45.0,10.5\r\n"
        b"REF/3,0,800,44.6,10.0\r\n"
        b"PLY/1,45.0,10.0\r\n"
        b"PLY/2,45.0,10.5\r\n"
        b"PLY/3,44.6,10.5\r\n"
        b"\x1a\x00binarydatafollows"
    )
    parsed = gp.parse_kap_header(hdr)
    assert parsed["name"] == "TEST CHART"
    assert len(parsed["gcps"]) == 3 and len(parsed["border_ll"]) == 3
    assert parsed["gcps"][1][:2] == (1000.0, 0.0)
    A = gp.fit_affine_3857(parsed["gcps"])
    assert A[0, 0] > 0 and A[1, 1] < 0


def test_parse_udf(spark):
    gsd = 100.0
    mx0, my1 = tm.merc_np(np.array([-70.0]), np.array([-30.0]))
    mx0, my1 = float(mx0[0]), float(my1[0])
    gcps = []
    for px, py in [(0, 0), (512, 0), (0, 512), (512, 512)]:
        lon, lat = tm.inv_merc_np(np.array([mx0 + gsd * px]), np.array([my1 - gsd * py]))
        gcps.append((px, py, float(lon[0]), float(lat[0])))
    text = _make_ozi(gcps, [])
    df = spark.createDataFrame([("c1", text, 512, 512)], "chart_id string, header string, w int, h int")
    udf = gp.parse_georef_udf("ozi")
    out = df.select("chart_id", udf("header", "w", "h").alias("g")).select("chart_id", "g.*").first()
    assert abs(out["gsd"] - gsd) < 1e-3
    assert abs(out["mx0"] - mx0) < 1.0


def test_geo_nos_parse_and_affine():
    gsd = 25.0
    mx0, my1 = tm.merc_np(np.array([-122.5]), np.array([37.8]))
    mx0, my1 = float(mx0[0]), float(my1[0])
    lines = ["Bitmap=chart.nos", "Name=TEST NOS"]
    pts = [(0, 0), (800, 0), (0, 600), (800, 600)]
    for i, (px, py) in enumerate(pts, 1):
        lon, lat = tm.inv_merc_np(np.array([mx0 + gsd * px]), np.array([my1 - gsd * py]))
        lines.append(f"Point{i:02d}={px},{py},{float(lat[0]):.8f},{float(lon[0]):.8f}")
    lines += ["Vertex01=37.8,-122.5", "Vertex02=37.8,-122.3", "Vertex03=37.6,-122.3"]
    parsed = gp.parse_geo_nos("\n".join(lines))
    assert parsed["name"] == "TEST NOS" and parsed["bitmap"] == "chart.nos"
    assert len(parsed["gcps"]) == 4 and len(parsed["border_ll"]) == 3
    assert parsed["border_ll"][0] == (-122.5, 37.8)  # (lon, lat)
    A = gp.fit_affine_3857(parsed["gcps"])
    g = gp.affine_to_georef(A, 800, 600)
    assert abs(g["gsd"] - gsd) < 1e-3 and abs(g["mx0"] - mx0) < 1.0


def test_kml_overlay_parse_and_georef():
    import math
    # square-pixel box: pick north/south so meter heights match meter width
    mx0, my1 = tm.merc_np(np.array([10.0]), np.array([45.0]))
    w, h, gsd = 1000, 800, 40.0
    mx1 = float(mx0[0]) + gsd * w
    my0 = float(my1[0]) - gsd * h
    lon1, lat0 = tm.inv_merc_np(np.array([mx1]), np.array([my0]))
    kml = f"""<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
<GroundOverlay><name>ov</name><Icon><href>tiles/ov.png</href></Icon>
<LatLonBox><north>45.0</north><south>{float(lat0[0]):.10f}</south>
<east>{float(lon1[0]):.10f}</east><west>10.0</west><rotation>0</rotation></LatLonBox>
</GroundOverlay></Document></kml>"""
    d = gp.parse_kml_overlay(kml)
    assert d["name"] == "ov" and d["href"] == "tiles/ov.png"
    g = gp.kml_overlay_to_georef(d, w, h)
    assert abs(g["gsd"] - gsd) < 1e-6
    assert abs(g["mx0"] - float(mx0[0])) < 1e-6 and abs(g["my1"] - float(my1[0])) < 1e-6
    # rotated overlays rejected (north-up contract)
    d2 = dict(d, rotation=5.0)
    try:
        gp.kml_overlay_to_georef(d2, w, h)
        assert False, "rotation must raise"
    except ValueError:
        pass


def test_poly2_fit_roundtrip():
    """Order-2 polynomial GCP fit recovers a synthetic quadratic warp
    exactly (it's in the model class), and beats the affine fit on it."""
    rng = np.random.default_rng(3)
    P_true = np.array(
        [[1.11e6, 48.0, 1.5, 2e-3, -1e-3, 5e-4],
         [5.66e6, -2.0, -52.0, 8e-4, 2e-3, -1.2e-3]]
    )
    px = rng.uniform(0, 2000, 24)
    py = rng.uniform(0, 1500, 24)
    mx, my = gp.apply_poly2(P_true, px, py)
    lon, lat = tm.inv_merc_np(mx, my)
    gcps = list(zip(px, py, lon, lat))
    P = gp.fit_poly2_3857(gcps)
    rx, ry = gp.apply_poly2(P, px, py)
    assert np.abs(rx - mx).max() < 1e-3 and np.abs(ry - my).max() < 1e-3  # meters
    A = gp.fit_affine_3857(gcps)
    ax = A[0, 0] * px + A[0, 1] * py + A[0, 2]
    assert np.abs(ax - mx).max() > 1.0  # quadratic warp not affine-expressible
    import pytest as _pt
    with _pt.raises(ValueError):
        gp.fit_poly2_3857(gcps[:5])


def test_world_file_parse():
    """World-file 6-line affine (the 'png+world' driver): published
    center-of-UL-pixel convention shifts back half a pixel to the
    engine's corner convention; every documented rejection raises."""
    import pytest as _pt

    A = gp.parse_world_file("2.0\n0.0\n0.0\n-2.0\n101.0\n499.0\n")
    # corner = center - A/2 -> (100, 500); diag = (2, -2)
    assert A[0, 0] == 2.0 and A[1, 1] == -2.0
    assert A[0, 2] == 100.0 and A[1, 2] == 500.0
    g = gp.affine_to_georef(A, 40, 30)
    assert g["gsd"] == 2.0 and g["mx0"] == 100.0 and g["my1"] == 500.0
    assert g["mx1"] == 180.0 and g["my0"] == 440.0
    # scientific notation + whitespace variants parse (GDAL writes %.10f,
    # ESRI tools write exponents)
    A2 = gp.parse_world_file("  1.0e0 0 0 -1e0 0.5 -0.5 ")
    assert A2[0, 2] == 0.0 and A2[1, 2] == 0.0
    with _pt.raises(ValueError):  # rotation
        gp.parse_world_file("2.0\n0.1\n0.0\n-2.0\n0\n0\n")
    with _pt.raises(ValueError):  # anisotropic
        gp.parse_world_file("2.0\n0\n0\n-2.5\n0\n0\n")
    with _pt.raises(ValueError):  # south-up
        gp.parse_world_file("2.0\n0\n0\n2.0\n0\n0\n")
    with _pt.raises(ValueError):  # wrong line count
        gp.parse_world_file("1 2 3 4 5")
    with _pt.raises(ValueError):  # garbage
        gp.parse_world_file("not a world file at all x y")


def test_prj_web_mercator_gate():
    """CRS gate for world-file sidecars: only EPSG:3857 spellings pass."""
    ok = [
        'PROJCS["WGS 84 / Pseudo-Mercator",AUTHORITY["EPSG","3857"]]',
        "EPSG:3857",
        "epsg : 3857",
        'PROJCS["Web_Mercator_Auxiliary_Sphere"]',
        'PROJCS["WGS 84 / Pseudo Mercator"]',
    ]
    bad = [
        None,
        "",
        'PROJCS["WGS 84 / UTM zone 32N",AUTHORITY["EPSG","32632"]]',
        'GEOGCS["WGS 84",AUTHORITY["EPSG","4326"]]',
        "EPSG:38570",  # word boundary: no substring false-positive
        "Mercator_1SP",  # plain mercator is NOT web mercator
    ]
    for s in ok:
        assert gp.prj_is_web_mercator(s), s
    for s in bad:
        assert not gp.prj_is_web_mercator(s), s


def test_world_udf(spark):
    """parse_world_udf end-to-end: valid row yields the corner georef,
    rejected rows (rotation / missing prj) yield the auditable NaN row."""
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("a", "2.0\n0\n0\n-2.0\n101.0\n499.0", "EPSG:3857", 40, 30),
            ("b", "2.0\n0.3\n0\n-2.0\n0\n0", "EPSG:3857", 8, 8),
            ("c", "2.0\n0\n0\n-2.0\n0\n0", None, 8, 8),
        ],
        "image_id string, world string, prj string, w int, h int",
    )
    u = gp.parse_world_udf()
    out = {
        r["image_id"]: r
        for r in df.withColumn("g", u("world", "prj", "w", "h")).select("image_id", "g.*").collect()
    }
    assert out["a"]["mx0"] == 100.0 and out["a"]["my1"] == 500.0 and out["a"]["gsd"] == 2.0
    # the NaN row crosses Arrow as null (pandas float64 NaN == missing)
    for bad in ("b", "c"):
        assert all(
            out[bad][c] is None or out[bad][c] != out[bad][c]
            for c in ("gsd", "mx0", "my0", "mx1", "my1")
        )
