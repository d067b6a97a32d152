"""Reference CLI-surface parity: the three remaining tilers-tools entry
points as spark-submit jobs (gdal_tiler == jobs/tile_pyramid.py, covered by
test_resume + the verify recipe). Each main() runs against the shared test
session (get_spark patched; stop() suppressed)."""

import json
import os
import sys

import numpy as np
import pytest

from tilers_tools_spark.functions import codecs


@pytest.fixture()
def run_job(spark, monkeypatch, capsys):
    """Invoke a job module's main() with argv, shared session, no stop()."""
    import tilers_tools_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    def run(mod_name, argv):
        import importlib

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
        mod = importlib.import_module(mod_name)
        monkeypatch.setattr(sys, "argv", [mod_name] + argv)
        mod.main()
        out = capsys.readouterr().out.strip().splitlines()
        return json.loads([ln for ln in out if ln.startswith("{")][-1])

    return run


@pytest.fixture()
def tile_dir(spark, tmp_path):
    from tilers_tools_spark.sources import tileset

    rng = np.random.default_rng(7)
    rows = []
    for i in range(24):
        z = int(rng.integers(3, 6))
        arr = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        rows.append((z, int(rng.integers(0, 2**z)), int(rng.integers(0, 2**z)), codecs.encode_png(arr)))
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary").dropDuplicates(["z", "x", "y"])
    d = str(tmp_path / "tiles_xyz")
    tileset.write_tileset_dir(df, d, scheme="xyz")
    return d, df


def test_tiles_convert_job(run_job, tile_dir, tmp_path, spark):
    src, df = tile_dir
    out = str(tmp_path / "mb")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", out, "--dst-format", "mbtiles", "--single-file",
    ])
    assert res["tiles"] == df.count()
    from tilers_tools_spark.sources import mbtiles as mbt

    back = mbt.read_mbtiles(spark, res["out"])
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b
    # and back out to a TMS dir tree with tilemap metadata
    out2 = str(tmp_path / "tms")
    res2 = run_job("tiles_convert", [
        "--src", res["out"], "--src-format", "mbtiles",
        "--dst", out2, "--dst-format", "dir", "--dst-scheme", "tms",
    ])
    assert res2["tiles"] == df.count()
    assert os.path.exists(os.path.join(out2, "tilemapresource.xml"))
    assert "tms: true" in open(os.path.join(out2, "leaflet.html")).read()
    tj = json.load(open(os.path.join(out2, "tiles.json")))
    assert tj["tilejson"] == "3.0.0" and tj["scheme"] == "tms"


def test_tiles_merge_job(run_job, tile_dir, tmp_path, spark):
    src, df = tile_dir
    out = str(tmp_path / "merged")
    res = run_job("tiles_merge", ["--base", src, "--overlay", src, "--out", out])
    assert res["tiles"] == df.count()  # identical sets -> same key count
    from tilers_tools_spark.sources import tileset

    back = tileset.read_tileset_dir(spark, out, scheme="xyz")
    assert back.count() == df.count()


def test_map2gdal_job(run_job, tmp_path, spark):
    charts = tmp_path / "charts"
    charts.mkdir()
    # a GEO/NOS sidecar with 4 exact GCPs (same construction as the parser test)
    from tilers_tools_spark.functions import tilemath as tm

    gsd = 25.0
    mx0, my1 = tm.merc_np(np.array([-122.5]), np.array([37.8]))
    mx0, my1 = float(mx0[0]), float(my1[0])
    lines = ["Bitmap=chart.nos", "Name=TEST NOS"]
    for i, (px, py) in enumerate([(0, 0), (1024, 0), (0, 1024), (1024, 1024)], 1):
        lon, lat = tm.inv_merc_np(np.array([mx0 + gsd * px]), np.array([my1 - gsd * py]))
        lines.append(f"Point{i:02d}={px},{py},{float(lat[0]):.8f},{float(lon[0]):.8f}")
    (charts / "a.geo").write_text("\n".join(lines))
    (charts / "bad.geo").write_text("Name=NO GCPS HERE")
    # world-file sidecar pair (png+world driver): stem-joined .prj carries
    # the CRS; a second world file without a .prj must yield the NaN row
    (charts / "w.pgw").write_text("2.0\n0.0\n0.0\n-2.0\n101.0\n499.0\n")
    (charts / "w.prj").write_text('PROJCS["WGS 84 / Pseudo-Mercator",AUTHORITY["EPSG","3857"]]')
    (charts / "noprj.wld").write_text("2.0\n0.0\n0.0\n-2.0\n0.0\n0.0\n")
    # ESRI ASCII grid + same-stem .prj: header-only georef, real dims
    (charts / "dem.asc").write_text(
        "ncols 4\nnrows 3\nxllcorner 10.0\nyllcorner 20.0\ncellsize 2.0\n"
        + ("1.5 " * 12).strip() + "\n"
    )
    (charts / "dem.prj").write_text("EPSG:3857")
    (charts / "noprj_dem.asc").write_text(
        "ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ncellsize 1\n1 2 3 4\n"
    )
    out = str(tmp_path / "georef.parquet")
    res = run_job("map2gdal", ["--charts", str(charts), "--out", out])
    assert res["charts"] == 6
    pdf = spark.read.parquet(out).toPandas().set_index("path")
    good = pdf[pdf.index.str.endswith("a.geo")].iloc[0]
    assert abs(good["gsd"] - gsd) < 1e-3 and abs(good["mx0"] - mx0) < 1.0
    bad = pdf[pdf.index.str.endswith("bad.geo")].iloc[0]
    assert np.isnan(bad["gsd"])  # parse failure kept, auditable
    wld = pdf[pdf.index.str.endswith("w.pgw")].iloc[0]
    assert wld["kind"] == "world" and wld["mx0"] == 100.0 and wld["my1"] == 500.0
    noprj = pdf[pdf.index.str.endswith("noprj.wld")].iloc[0]
    assert np.isnan(noprj["gsd"])  # undeclared CRS never enters the contract
    asc = pdf[pdf.index.str.endswith("dem.asc")].iloc[0]
    assert asc["kind"] == "aaigrid" and (asc["w"], asc["h"]) == (4, 3)
    assert asc["gsd"] == 2.0 and asc["mx0"] == 10.0 and asc["my1"] == 26.0
    noprj_asc = pdf[pdf.index.str.endswith("noprj_dem.asc")].iloc[0]
    assert (noprj_asc["w"], noprj_asc["h"]) == (2, 2)  # header still real
    assert np.isnan(noprj_asc["gsd"])  # undeclared CRS -> NaN georef


def test_tiles_convert_mixed_containers_fail_loudly(run_job, tmp_path, spark):
    """Pass-through convert validates the single-container assumption
    over a sampled prefix and aborts on a mixed PNG+TIFF set instead of
    mislabeling every file's extension (ADVICE r4)."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.sources import tileset

    rng = np.random.default_rng(8)
    rows = []
    for i in range(8):
        arr = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        blob = codecs.encode_png(arr) if i % 2 == 0 else tiffcodec.encode_tiff(arr)
        rows.append((3, i, i, blob))
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary")
    src = str(tmp_path / "mixed_xyz")
    tileset.write_tileset_dir(df, src, scheme="xyz")
    with pytest.raises(SystemExit, match="mixed tile containers"):
        run_job("tiles_convert", [
            "--src", src, "--src-format", "dir",
            "--dst", str(tmp_path / "out"), "--dst-format", "mbtiles",
        ])


def test_tiles_convert_tiff_passthrough_ext(run_job, tmp_path, spark):
    """A uniform TIFF tile set passes through with *.tif filenames (the
    sniffed container, not the png fallback — ADVICE r4 ext-map fix)."""
    import glob

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.sources import tileset

    rng = np.random.default_rng(9)
    rows = [
        (3, i, i, tiffcodec.encode_tiff(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary")
    src = str(tmp_path / "tiff_xyz")
    tileset.write_tileset_dir(df, src, scheme="xyz", ext="tif")
    out = str(tmp_path / "tiff_out")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir",
        "--dst", out, "--dst-format", "dir",
    ])
    assert res["tiles"] == 4
    found = glob.glob(os.path.join(out, "**", "*.tif"), recursive=True)
    assert len(found) == 4
    assert not glob.glob(os.path.join(out, "**", "*.png", ), recursive=True)


def test_tiles_convert_kml_superoverlay(run_job, tile_dir, tmp_path, spark):
    """--dst-format kml writes the xyz image tree + per-tile KML docs +
    a root doc.kml whose links resolve on disk."""
    import xml.etree.ElementTree as ET

    src, df = tile_dir
    out = str(tmp_path / "kml")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", out, "--dst-format", "kml", "--name", "demo",
    ])
    assert res["tiles"] == df.count()
    ns = {"k": "http://www.opengis.net/kml/2.2"}
    root = ET.parse(os.path.join(out, "doc.kml")).getroot().find("k:Document", ns)
    assert root.find("k:name", ns).text == "demo"
    links = [ln.find("k:Link/k:href", ns).text for ln in root.findall("k:NetworkLink", ns)]
    assert links
    for href in links:
        assert os.path.exists(os.path.join(out, href))
        # the KML doc's image sibling exists too
        img = ET.parse(os.path.join(out, href)).getroot().find(
            "k:Document/k:GroundOverlay/k:Icon/k:href", ns
        ).text
        assert os.path.exists(os.path.join(out, os.path.dirname(href), img))


def test_gdal_utils_job_addo_cogcheck_roundtrip(run_job, tmp_path, spark):
    """jobs/gdal_utils.py: addo --cog emits blobs that its own cogcheck
    subcommand validates; info reports the overview count."""
    from tilers_tools_spark.functions import tiffcodec

    a = ((np.arange(40)[:, None] * 3 + np.arange(36)[None, :]) % 199).astype(np.uint8)
    blob = tiffcodec.encode_tiff(a, geo={"gsd": 1.0, "mx0": 0.0, "my1": 40.0, "epsg": 3857})
    src = str(tmp_path / "img.parquet")
    spark.createDataFrame([("r", blob)], "image_id string, bytes binary").write.parquet(src)

    cogs = str(tmp_path / "cogs.parquet")
    res = run_job("gdal_utils", [
        "addo", "--images", src, "--out", cogs,
        "--levels", "2,4", "--tile", "16", "--cog",
    ])
    assert res["rows"] == 1

    chk = str(tmp_path / "chk.parquet")
    res2 = run_job("gdal_utils", ["cogcheck", "--images", cogs, "--out", chk])
    assert res2["rows"] == 1
    row = spark.read.parquet(chk).collect()[0]
    assert row["cog_ok"] and row["n_overviews"] == 2

    rep = str(tmp_path / "rep.parquet")
    run_job("gdal_utils", ["info", "--images", cogs, "--out", rep])
    assert spark.read.parquet(rep).collect()[0]["n_overviews"] == 2

    shade = str(tmp_path / "shade.parquet")
    res3 = run_job("gdal_utils", [
        "hillshade", "--images", src, "--out", shade, "--mode", "multidirectional",
    ])
    assert res3["rows"] == 1 and spark.read.parquet(shade).collect()[0]["shade_sum"] > 0


def test_gdal_utils_job_tindex_vrt_warp(run_job, tmp_path, spark):
    """jobs/gdal_utils.py routing for the remaining subcommands: tindex
    footprints, buildvrt grouped mosaic geometry, warp --src 4326."""
    from tilers_tools_spark.functions import tiffcodec

    rows = []
    for i in range(2):
        a = ((np.arange(24)[:, None] + 7 * i + np.arange(20)[None, :]) % 151).astype(np.uint8)
        blob = tiffcodec.encode_tiff(
            a, geo={"gsd": 2.0, "mx0": 100.0 * i, "my1": 48.0, "epsg": 3857})
        rows.append((f"m{i}", "g0", blob))
    src = str(tmp_path / "img.parquet")
    spark.createDataFrame(rows, "image_id string, vrt_group string, bytes binary").write.parquet(src)

    idx = str(tmp_path / "idx.parquet")
    assert run_job("gdal_utils", ["tindex", "--images", src, "--out", idx])["rows"] == 2
    assert spark.read.parquet(idx).collect()[0]["wkt"].startswith("POLYGON")

    vrt = str(tmp_path / "vrt.parquet")
    xml_dir = str(tmp_path / "vrts")
    res = run_job("gdal_utils", [
        "buildvrt", "--images", src, "--out", vrt, "--resolution", "highest",
        "--xml-dir", xml_dir,
    ])
    assert res["rows"] == 2  # one placement row per source raster
    # --xml-dir writes one GDAL .vrt document per clean group, and the
    # engine's own VRT reader inverts it back to the placement rows
    import os

    from tilers_tools_spark.operators import info

    with open(os.path.join(xml_dir, "g0.vrt")) as f:
        doc = f.read()
    assert doc.startswith("<VRTDataset ") and doc.count("<SimpleSource>") == 2
    back = info.vrt_parse(
        spark.createDataFrame([("g0", doc)], "vrt_group string, vrt_xml string")
    )
    assert back.count() == 2

    g = ((np.arange(16)[:, None] * 5 + np.arange(16)[None, :]) % 101).astype(np.uint8)
    gblob = tiffcodec.encode_tiff(
        g, geo={"gsd": 0.01, "mx0": 10.0, "my1": 48.0, "epsg": 4326})
    gsrc = str(tmp_path / "geo.parquet")
    spark.createDataFrame([("g", gblob)], "image_id string, bytes binary").write.parquet(gsrc)
    warped = str(tmp_path / "warped.parquet")
    res2 = run_job("gdal_utils", [
        "warp", "--images", gsrc, "--out", warped, "--src", "4326",
    ])
    assert res2["rows"] == 1
    wrow = spark.read.parquet(warped).collect()[0]
    # lon=10 deg -> 3857 x = R * radians(10)
    assert wrow["out_w"] > 0 and abs(wrow["mx0"] - 1113194.9079327357) < 1.0

    # terrainrgb routing: mapbox encoding, error bounded by the 0.1 m step
    trgb = str(tmp_path / "trgb.parquet")
    res3 = run_job("gdal_utils", [
        "terrainrgb", "--images", src, "--out", trgb, "--encoding", "mapbox",
    ])
    assert res3["rows"] == 2
    for r in spark.read.parquet(trgb).collect():
        assert r["encoding"] == "mapbox" and r["err_max"] <= 0.05 + 1e-12
        assert len(r["rgb_md5"]) == 32 and r["n_nodata"] == 0


def test_dem_ingest_job_chains_into_warp(run_job, tmp_path, spark):
    """jobs/dem_ingest.py: .hgt + .asc(+.prj) directory -> Float32
    GeoTIFF raster table; the hgt row (EPSG:4326) then chains through
    reproject_4326 — the documented hgt -> mercator composition — and
    failures surface as NULL-bytes rows."""
    from tilers_tools_spark.functions import hgt, tiffcodec
    from tilers_tools_spark.operators.translate import reproject_4326

    src = tmp_path / "dem"
    src.mkdir()
    n = 33
    surf = np.round(np.tile(np.arange(n, dtype=np.float64)[:, None], (1, n)))
    (src / "N34W119.hgt").write_bytes(hgt.encode_hgt(surf))
    (src / "grid.asc").write_bytes(
        b"ncols 3\nnrows 2\nxllcorner 10.0\nyllcorner 20.0\ncellsize 2.0\n"
        b"1 2 3 4 5 6\n"
    )
    (src / "grid.prj").write_text("EPSG:3857")
    (src / "noprj.asc").write_bytes(
        b"ncols 2\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\n7 8\n"
    )
    (src / "corrupt.hgt").write_bytes(b"\x00\x01\x02")  # odd byte count
    (src / "pts.xyz").write_bytes(b"0.5 0.5 7\n1.5 0.5 8\n0.5 1.5 9\n1.5 1.5 1\n")
    from tilers_tools_spark.functions import envi as _envi
    ehdr, eraw = _envi.encode_envi(np.array([[5.0, 6.0], [7.0, 8.0]]), interleave="bil", dtype="<i2")
    (src / "cube.hdr").write_bytes(ehdr)
    (src / "cube.img").write_bytes(eraw)

    out = str(tmp_path / "dem_table.parquet")
    res = run_job("dem_ingest", ["--src", str(src), "--out", out, "--any-square"])
    assert res["rows"] == 6 and res["failed"] == 1
    pdf = spark.read.parquet(out).toPandas().set_index("image_id")
    assert pdf.loc["corrupt.hgt"]["bytes"] is None

    # the .asc with a 3857 .prj carries the mercator georef
    a, geo = tiffcodec.decode_tiff(bytes(pdf.loc["grid.asc"]["bytes"]), scale_16bit=False)
    assert {k: geo[k] for k in ("gsd", "mx0", "my1", "epsg")} == {
        "gsd": 2.0, "mx0": 10.0, "my1": 24.0, "epsg": 3857,
    }
    assert np.array_equal(a, np.array([[1, 2, 3], [4, 5, 6]], np.float32))
    # the undeclared-CRS .asc is a grid-space TIFF (no georef)
    _, geo2 = tiffcodec.decode_tiff(bytes(pdf.loc["noprj.asc"]["bytes"]), scale_16bit=False)
    assert geo2 is None
    # gridded-xyz text: grid-space TIFF, north row first
    ax, geo3 = tiffcodec.decode_tiff(bytes(pdf.loc["pts.xyz"]["bytes"]), scale_16bit=False)
    assert geo3 is None and np.array_equal(ax, np.array([[9, 1], [7, 8]], np.float32))
    ae, geo4 = tiffcodec.decode_tiff(bytes(pdf.loc["cube.hdr"]["bytes"]), scale_16bit=False)
    assert geo4 is None and np.array_equal(ae, np.array([[5, 6], [7, 8]], np.float32))

    # chain: hgt GeoTIFF (4326) -> reproject_4326 -> 3857 summary row
    tbl = spark.read.parquet(out).filter("kind = 'hgt' and bytes is not null")
    row = reproject_4326(tbl).collect()[0]
    import math
    assert row["out_w"] > 0 and abs(row["mx0"] - 6378137.0 * math.radians(-119.0)) < 1e-3


def test_dem_tiles_job(run_job, tmp_path, spark):
    """jobs/dem_tiles.py: 3857 DEM table -> terrain-RGB tile tree with
    tilemap xml + leaflet viewer; every written PNG decodes back to
    elevations within the encoding's quantization step."""
    import glob

    from tilers_tools_spark.functions import codecs, tiffcodec, tilemath as tm
    from tilers_tools_spark.operators import terrain

    rng = np.random.default_rng(31)
    dem = np.round(rng.uniform(0, 500, (24, 30))).astype(np.float64)
    z = 16
    span = float(tm.resolution_np(z)) * 256
    geo = {"gsd": span / 12.0, "mx0": 9 * span - tm.ORIGIN + 0.4 * span,
           "my1": 6 * span - tm.ORIGIN - 0.1 * span, "epsg": 3857}
    blob = tiffcodec.encode_tiff(dem.astype(np.float32), geo=geo)
    src = str(tmp_path / "dem.parquet")
    spark.createDataFrame(
        [("d", bytearray(blob))], "image_id string, bytes binary"
    ).write.parquet(src)

    out = str(tmp_path / "terrain")
    res = run_job("dem_tiles", [
        "--images", src, "--out", out, "--zooms", "16,15", "--encoding", "mapbox",
    ])
    files = glob.glob(out + "/*/*/*.png")
    assert res["tiles"] == len(files) and res["tiles"] > 0
    assert os.path.exists(os.path.join(out, "tilemapresource.xml"))
    assert "maxZoom: 16" in open(os.path.join(out, "leaflet.html")).read()
    dem32 = dem.astype(np.float32).astype(np.float64)
    for f in files[:4]:
        zz, xx, yy_xyz = int(f.split("/")[-3]), int(f.split("/")[-2]), int(f.split("/")[-1][:-4])
        ty = (1 << zz) - 1 - yy_xyz  # dir tree is XYZ; keys are TMS
        rgba = codecs.decode_png(open(f, "rb").read())
        back = terrain.terrain_rgb_decode_np(rgba, "mapbox")
        elev = terrain.dem_tile_np(dem32, geo, zz, xx, ty)
        finite = ~np.isnan(elev)
        assert (np.isnan(back) == ~finite).all()
        assert np.abs(back[finite] - elev[finite]).max() <= 0.05 + 1e-9


@pytest.fixture()
def update_pair(spark, tmp_path):
    """old/new XYZ dir trees with known added/removed/changed keys."""
    from pyspark.sql import functions as F

    from tilers_tools_spark.sources import tileset

    rng = np.random.default_rng(11)
    rows = []
    for i in range(30):
        z = 4
        rows.append((z, i % 16, (i * 3) % 16, codecs.encode_png(rng.integers(0, 256, (8, 8, 4), dtype=np.uint8))))
    old_df = spark.createDataFrame(rows, "z int, x long, y long, tile binary").dropDuplicates(["z", "x", "y"]).cache()
    keys = sorted((r["z"], r["x"], r["y"]) for r in old_df.select("z", "x", "y").collect())
    removed, changed = keys[0], keys[1]
    new_df = (
        old_df.where(~((F.col("x") == removed[1]) & (F.col("y") == removed[2])))
        .withColumn(
            "tile",
            F.when(
                (F.col("x") == changed[1]) & (F.col("y") == changed[2]),
                F.lit(codecs.encode_png(np.full((8, 8, 4), 7, dtype=np.uint8))),
            ).otherwise(F.col("tile")),
        )
        .unionByName(
            spark.createDataFrame(
                [(4, 0, 1, codecs.encode_png(np.full((8, 8, 4), 9, dtype=np.uint8)))],
                "z int, x long, y long, tile binary",
            )
        )
        .cache()
    )
    do, dn = str(tmp_path / "old_xyz"), str(tmp_path / "new_xyz")
    tileset.write_tileset_dir(old_df, do, scheme="xyz")
    tileset.write_tileset_dir(new_df, dn, scheme="xyz")
    return do, dn, old_df, new_df


def test_tiles_update_emit(run_job, update_pair, tmp_path, spark):
    do, dn, old_df, new_df = update_pair
    dst = str(tmp_path / "delta")
    res = run_job("tiles_update", [
        "--old", do, "--new", dn, "--mode", "emit", "--dst", dst,
    ])
    assert (res["added"], res["removed"], res["changed"]) == (1, 1, 1)
    from tilers_tools_spark.sources import tileset

    ups = tileset.read_tileset_dir(spark, dst, scheme="xyz")
    assert ups.count() == 2  # added + changed blobs only
    removed = spark.read.parquet(os.path.join(dst, "removed_keys.parquet"))
    assert removed.count() == 1


@pytest.mark.parametrize("dedup", [False, True])
def test_tiles_update_apply_mbtiles(run_job, update_pair, tmp_path, spark, dedup):
    """apply patches a published single-file MBTiles (plain AND dedup
    layouts) in place; reading it back equals the new pyramid, and the
    dedup layout keeps no orphaned blobs."""
    import sqlite3

    from tilers_tools_spark.sources import mbtiles as mbt

    do, dn, old_df, new_df = update_pair
    out = str(tmp_path / "pub")
    path = mbt.write_mbtiles(old_df, out, single_file=True, dedup=dedup)
    res = run_job("tiles_update", [
        "--old", path, "--old-format", "mbtiles", "--new", dn, "--mode", "apply",
    ])
    assert (res["added"], res["removed"], res["changed"]) == (1, 1, 1)
    back = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in mbt.read_mbtiles(spark, path).collect()}
    want = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in new_df.collect()}
    assert back == want
    if dedup:
        con = sqlite3.connect(path)
        orphans = con.execute(
            "SELECT count(*) FROM images WHERE tile_id NOT IN (SELECT tile_id FROM map)"
        ).fetchone()[0]
        con.close()
        assert orphans == 0


def test_tiles_convert_mbtiles_dedup(run_job, tile_dir, tmp_path, spark):
    """--dedup writes the two-table map+images MBTiles layout; the spec
    `tiles` relation survives as a view, and a follow-up convert reading
    the dedup file back out is byte-identical."""
    import sqlite3

    src, df = tile_dir
    out = str(tmp_path / "mbd")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", out, "--dst-format", "mbtiles", "--single-file", "--dedup",
    ])
    assert res["tiles"] == df.count()
    con = sqlite3.connect(res["out"])
    kinds = dict(con.execute("SELECT name, type FROM sqlite_master WHERE name IN ('tiles','map','images')"))
    n_imgs = con.execute("SELECT count(*) FROM images").fetchone()[0]
    con.close()
    assert kinds == {"tiles": "view", "map": "table", "images": "table"}
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}
    assert n_imgs == len(set(a.values()))
    from tilers_tools_spark.sources import mbtiles as mbt

    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in mbt.read_mbtiles(spark, res["out"]).collect()}
    assert a == b


def test_tiles_convert_lint_gate(run_job, tmp_path, spark):
    """--lint aborts on a broken pyramid (z=5 child with no z=3→4 chain)
    and passes a clean one."""
    from tilers_tools_spark.sources import tileset

    blob = codecs.encode_png(np.zeros((8, 8, 4), dtype=np.uint8))
    bad = spark.createDataFrame([(3, 1, 1, blob), (5, 4, 4, blob)], "z int, x long, y long, tile binary")
    d_bad = str(tmp_path / "bad")
    tileset.write_tileset_dir(bad, d_bad, scheme="xyz")
    with pytest.raises(SystemExit, match="lint failed"):
        run_job("tiles_convert", [
            "--src", d_bad, "--src-format", "dir", "--dst", str(tmp_path / "o1"),
            "--dst-format", "mbtiles", "--single-file", "--lint",
        ])
    good = spark.createDataFrame([(3, 1, 1, blob), (4, 2, 2, blob)], "z int, x long, y long, tile binary")
    d_good = str(tmp_path / "good")
    tileset.write_tileset_dir(good, d_good, scheme="xyz")
    res = run_job("tiles_convert", [
        "--src", d_good, "--src-format", "dir", "--dst", str(tmp_path / "o2"),
        "--dst-format", "mbtiles", "--single-file", "--lint",
    ])
    assert res["tiles"] == 2


def test_tiles_convert_rmaps_roundtrip(run_job, tile_dir, tmp_path, spark):
    """dir -> RMaps sqlitedb -> dir through the CLI (the MOBAC 'RMaps
    SQLite' / OsmAnd container; stored z = 17 - zoom, OSM y)."""
    src, df = tile_dir
    out = str(tmp_path / "rm")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", out, "--dst-format", "rmaps", "--single-file",
    ])
    assert res["tiles"] == df.count()
    assert res["out"].endswith(".sqlitedb")
    out2 = str(tmp_path / "xyz_back")
    res2 = run_job("tiles_convert", [
        "--src", res["out"], "--src-format", "rmaps",
        "--dst", out2, "--dst-format", "dir", "--dst-scheme", "xyz",
    ])
    assert res2["tiles"] == df.count()
    from tilers_tools_spark.sources import tileset

    back = tileset.read_tileset_dir(spark, out2, scheme="xyz")
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_tiles_convert_gpkg_roundtrip(run_job, tile_dir, tmp_path, spark):
    """dir -> GeoPackage -> dir through the CLI (OGC 12-128r18 tile
    pyramid; top-down tile_row, per-zoom gpkg_tile_matrix rows)."""
    src, df = tile_dir
    out = str(tmp_path / "gp")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", out, "--dst-format", "gpkg", "--single-file",
    ])
    assert res["tiles"] == df.count()
    assert res["out"].endswith(".gpkg")
    out2 = str(tmp_path / "xyz_back_gp")
    res2 = run_job("tiles_convert", [
        "--src", res["out"], "--src-format", "gpkg",
        "--dst", out2, "--dst-format", "dir", "--dst-scheme", "xyz",
    ])
    assert res2["tiles"] == df.count()
    from tilers_tools_spark.sources import tileset

    back = tileset.read_tileset_dir(spark, out2, scheme="xyz")
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_tiles_convert_pmtiles_roundtrip(run_job, tile_dir, tmp_path, spark):
    """dir -> PMTiles v3 -> dir through the CLI, both the single-file
    archive and the sharded (disjoint clustered tileid ranges) layout."""
    src, df = tile_dir
    single = str(tmp_path / "t.pmtiles")
    res = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", single, "--dst-format", "pmtiles", "--single-file",
    ])
    assert res["tiles"] == df.count() and res["out"] == single
    from tilers_tools_spark.sources import pmtiles as pmt

    assert pmt.read_metadata(single)["format"] == "png"
    hdr, _ = pmt.read_entries(single)
    assert hdr["tile_type"] == pmt.TILETYPE["png"]
    out2 = str(tmp_path / "xyz_back_pm")
    res2 = run_job("tiles_convert", [
        "--src", single, "--src-format", "pmtiles",
        "--dst", out2, "--dst-format", "dir", "--dst-scheme", "xyz",
    ])
    assert res2["tiles"] == df.count()
    from tilers_tools_spark.sources import tileset

    back = tileset.read_tileset_dir(spark, out2, scheme="xyz")
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in df.collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b
    # sharded layout roundtrips through the dir-of-archives read
    shards = str(tmp_path / "pm_shards")
    res3 = run_job("tiles_convert", [
        "--src", src, "--src-format", "dir", "--src-scheme", "xyz",
        "--dst", shards, "--dst-format", "pmtiles",
    ])
    assert res3["tiles"] == df.count()
    res4 = run_job("tiles_convert", [
        "--src", shards, "--src-format", "pmtiles",
        "--dst", str(tmp_path / "back2"), "--dst-format", "dir", "--dst-scheme", "xyz",
    ])
    assert res4["tiles"] == df.count()


def test_vector_tiles_job_points_mbtiles(run_job, tmp_path, spark):
    """Point MVTs through the CLI into a vector MBTiles: metadata rows
    format=pbf + json vector_layers (MBTiles 1.3 vector convention),
    blobs decode to the expected per-tile feature counts."""
    import sqlite3

    from tilers_tools_spark.functions import mvtcodec as mvt

    pts = str(tmp_path / "pts.parquet")
    rows = [(i, -30.0 + i, 10.0 + (i % 7)) for i in range(40)]
    spark.createDataFrame(rows, "event_id long, lon double, lat double").write.parquet(pts)
    out = run_job("vector_tiles", [
        "--points", pts, "--z", "4", "--dst", str(tmp_path / "vmb"),
        "--dst-format", "mbtiles", "--single-file", "--name", "vt",
    ])
    assert out["tiles"] >= 2 and out["layer"] == "points"
    con = sqlite3.connect(out["out"])
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["format"] == "pbf"
    vl = json.loads(meta["json"])["vector_layers"]
    assert vl[0]["id"] == "points"
    n = 0
    for (blob,) in con.execute("SELECT tile_data FROM tiles"):
        dec = mvt.decode_mvt(bytes(blob))["points"]
        assert dec["version"] == 2
        n += len(dec["features"])
    con.close()
    assert n == 40  # every point landed in exactly one tile


def test_vector_tiles_job_polys_dir(run_job, tmp_path, spark):
    """Polygon MVTs through the CLI into a .pbf dir tree with vector
    TileJSON."""
    import glob as _g

    tsv = str(tmp_path / "p.tsv")
    with open(tsv, "w") as f:
        f.write("sq\tPOLYGON ((10 10, 12 10, 12 12, 10 12, 10 10))\n")
    dst = str(tmp_path / "vdir")
    out = run_job("vector_tiles", [
        "--polys", tsv, "--z", "4", "--dst", dst, "--dst-format", "dir",
    ])
    assert out["tiles"] == 1
    assert _g.glob(dst + "/4/*/*.pbf")
    doc = json.load(open(dst + "/tiles.json"))
    assert doc["vector_layers"][0]["id"] == "polys"
    assert doc["tiles"] == ["{z}/{x}/{y}.pbf"]


def test_vector_tiles_job_shp_dir(run_job, tmp_path, spark):
    """Shapefile polygons through the vector_tiles CLI (--shp): the
    ogr2ogr-role ingest — rings (incl. a hole) become MVT polygon
    features with poly_id = fid."""
    import glob as _g

    from tilers_tools_spark.sources import shapefile as shpf

    sq = [(10.0, 10.0), (10.0, 12.0), (12.0, 12.0), (12.0, 10.0), (10.0, 10.0)]
    hole = [(10.5, 10.5), (11.5, 10.5), (11.5, 11.5), (10.5, 11.5), (10.5, 10.5)]
    shp_path = shpf.write_shapefile(
        str(tmp_path / "poly"), "polygon", [shpf.ensure_orientation([sq, hole])]
    )
    dst = str(tmp_path / "sdir")
    out = run_job("vector_tiles", [
        "--shp", shp_path, "--z", "4", "--dst", dst, "--dst-format", "dir",
    ])
    assert out["tiles"] == 1
    (pbf,) = _g.glob(dst + "/4/*/*.pbf")
    from tilers_tools_spark.functions import mvtcodec as mvt

    dec = mvt.decode_mvt(open(pbf, "rb").read())["polys"]
    assert dec["features"][0]["type"] == mvt.GEOM_POLYGON
    assert json.load(open(dst + "/tiles.json"))["vector_layers"][0]["fields"] == {"poly_id": "String"}


def test_vector_tiles_job_geoparquet_dir(run_job, tmp_path, spark):
    """GeoParquet polygons through the vector_tiles CLI (--geoparquet):
    the modern columnar vector ingest — WKB polygon (with hole) +
    multipolygon rows become MVT polygon features, geometry column
    located via the v1.0 'geo' footer, poly_id from --id-col."""
    import glob as _g

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tilers_tools_spark.sources import geoparquet as gpq

    sq = [(10.0, 10.0), (10.0, 12.0), (12.0, 12.0), (12.0, 10.0), (10.0, 10.0)]
    hole = [(10.5, 10.5), (11.5, 10.5), (11.5, 11.5), (10.5, 11.5), (10.5, 10.5)]
    sq2 = [[(x + 3.0, y) for x, y in sq]]
    table = pa.table({
        "fid": [7, 8],
        "geom": [gpq.write_wkb("polygon", [sq, hole]),
                 gpq.write_wkb("multipolygon", [[sq], sq2])],
    }).replace_schema_metadata({b"geo": json.dumps({
        "version": "1.0.0", "primary_column": "geom",
        "columns": {"geom": {"encoding": "WKB"}},
    }).encode()})
    gpq_path = str(tmp_path / "polys.parquet")
    pq.write_table(table, gpq_path)
    dst = str(tmp_path / "gdir")
    out = run_job("vector_tiles", [
        "--geoparquet", gpq_path, "--id-col", "fid",
        "--z", "4", "--dst", dst, "--dst-format", "dir",
    ])
    assert out["tiles"] == 1
    (pbf,) = _g.glob(dst + "/4/*/*.pbf")
    from tilers_tools_spark.functions import mvtcodec as mvt

    dec = mvt.decode_mvt(open(pbf, "rb").read())["polys"]
    assert dec["features"][0]["type"] == mvt.GEOM_POLYGON
    assert sorted(f["props"].get("poly_id") for f in dec["features"]) == ["7", "8"]


def test_vector_tiles_job_lines_dir(run_job, tmp_path, spark):
    """Linestring MVTs through the CLI (--lines TSV) into .pbf tree."""
    from tilers_tools_spark.functions import mvtcodec as mvt

    tsv = str(tmp_path / "l.tsv")
    with open(tsv, "w") as f:
        f.write("r1\tLINESTRING (10 10, 11 11, 12 10)\n")
    dst = str(tmp_path / "ldir")
    out = run_job("vector_tiles", [
        "--lines", tsv, "--z", "4", "--dst", dst, "--dst-format", "dir",
    ])
    assert out["tiles"] == 1 and out["layer"] == "lines"
    import glob as _g

    (pbf,) = _g.glob(dst + "/4/*/*.pbf")
    dec = mvt.decode_mvt(open(pbf, "rb").read())["lines"]
    assert dec["features"][0]["type"] == mvt.GEOM_LINE
    assert json.load(open(dst + "/tiles.json"))["vector_layers"][0]["fields"] == {"line_id": "String"}


def test_tiles_optimize_job(run_job, tmp_path, spark):
    """Rewrite an ingest-order (hash-shuffled) 64x64 grid and verify the
    reported pruning improvement on an 8x8 probe viewport."""
    import pyspark.sql.functions as F

    xs = [(int(i % 64), int(i // 64), float(i)) for i in range(4096)]
    src = str(tmp_path / "src")
    (spark.createDataFrame(xs, "x long, y long, v double")
        .withColumn("_k", F.xxhash64("x", "y"))
        .repartitionByRange(16, "_k").sortWithinPartitions("_k").drop("_k")
        .write.mode("overwrite").parquet(src))
    out = str(tmp_path / "opt")
    res = run_job("tiles_optimize",
                  ["--in", src, "--out", out, "--zoom", "6",
                   "--files", "16", "--viewport", "8,16,15,23"])
    assert res["rows_in"] == res["rows_out"] == 4096
    assert res["read_fraction_before"] >= 0.9
    assert res["read_fraction_after"] <= 0.25


def test_heatmap_tiles_job_dir(run_job, tmp_path, spark):
    """Point heatmap through the CLI into a z/x/y.png tree: every level
    z_min..z_base present, blobs decode to 256x256 RGBA with the hottest
    pixel hitting the top-of-ramp color, TileJSON written."""
    from tilers_tools_spark.functions import codecs

    pts = str(tmp_path / "hpts.parquet")
    rows = [(i, -30.0 + (i % 5) * 0.01, 10.0 + (i // 5) * 0.01)
            for i in range(60)]
    spark.createDataFrame(rows, "event_id long, lon double, lat double").write.parquet(pts)
    out = run_job("heatmap_tiles", [
        "--points", pts, "--z-base", "6", "--z-min", "4",
        "--dst", str(tmp_path / "hm"),
    ])
    assert out["tiles"] >= 3 and out["z_base"] == 6 and out["z_min"] == 4
    root = tmp_path / "hm"
    assert (root / "tiles.json").exists()
    pngs = sorted(root.rglob("*.png"))
    zs = {int(p.relative_to(root).parts[0]) for p in pngs}
    assert zs == {4, 5, 6}
    hot = 0
    for p in pngs:
        arr = codecs.decode_png(p.read_bytes())
        assert arr.shape == (256, 256, 4)
        if (arr == np.array([255, 0, 0, 255], np.uint8)).all(-1).any():
            hot += 1
    # the pyramid-wide v_max pixel renders opaque red somewhere
    assert hot >= 1
