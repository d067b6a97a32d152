"""T2/M4 — tile-set transforms: scheme flip involution, path layouts,
MBTiles roundtrip (XYZ -> MBTiles -> TMS identity), merge/overlay.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.functions import codecs
from tilers_tools_spark.operators import convert
from tilers_tools_spark.sources import mbtiles as mbt


@pytest.fixture(scope="module")
def tiles_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        z = int(rng.integers(3, 9))
        arr = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        rows.append(
            (f"img{i:03d}", z, int(rng.integers(0, 2**z)), int(rng.integers(0, 2**z)), codecs.encode_png(arr))
        )
    return spark.createDataFrame(rows, "image_id string, z int, x long, y long, tile binary").cache()


def test_flip_involution(tiles_df):
    back = convert.flip_y(convert.flip_y(tiles_df))
    assert back.exceptAll(tiles_df).isEmpty() and tiles_df.exceptAll(back).isEmpty()


def test_paths(tiles_df):
    p = convert.tile_path(tiles_df, "xyz").select("z", "x", "y", "path").collect()
    for r in p:
        zz, xx, yy = (int(v) for v in r["path"][:-4].split("/"))
        assert zz == r["z"] and xx == r["x"] and yy == (2**r["z"] - 1 - r["y"])
    p = convert.tile_path(tiles_df, "tms").first()
    zz, xx, yy = (int(v) for v in p["path"][:-4].split("/"))
    assert (zz, xx, yy) == (p["z"], p["x"], p["y"])
    p = convert.tile_path(tiles_df, "zyx").first()
    zz, yy, xx = (int(v) for v in p["path"][:-4].split("/"))
    assert zz == p["z"] and xx == p["x"] and yy == 2 ** p["z"] - 1 - p["y"]
    assert convert.sasplanet_path(tiles_df).first()["path"].startswith("z")
    assert convert.maemo_mapper_path(tiles_df).first()["path"]
    p = convert.ozi_path(tiles_df).first()
    zz, xx, yy = (int(v) for v in p["path"][:-4].split("-"))
    assert zz == p["z"] and xx == p["x"] and yy == 2 ** p["z"] - 1 - p["y"]
    p = convert.mapnav_path(tiles_df).first()
    zz, yy, xx = (int(v) for v in p["path"][:-4].split("/"))
    assert (zz, xx, yy) == (p["z"], p["x"], p["y"])  # TMS y, row-major


def test_mbtiles_roundtrip(tiles_df, spark, tmp_path):
    out = str(tmp_path / "mb")
    path = mbt.write_mbtiles(tiles_df, out, metadata={"name": "t"}, single_file=True)
    back = mbt.read_mbtiles(spark, path)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b
    assert mbt.read_mbtiles_metadata(path)["name"] == "t"


def test_mbtiles_parallel_shard_read(tiles_df, spark, tmp_path):
    """Multi-shard dir reads via executors (distributed MapInPandas scan,
    not a driver createDataFrame of all rows) and matches the write input."""
    out = str(tmp_path / "mbshards")
    mbt.write_mbtiles(tiles_df.repartition(6), out, metadata={"name": "t"})
    import glob as _g
    assert len(_g.glob(out + "/part-*.mbtiles")) > 1
    back = mbt.read_mbtiles(spark, out)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


@pytest.fixture(scope="module")
def dup_tiles_df(spark):
    """64 tiles over 3 distinct blobs — the uniform-ocean shape dedup is for."""
    blobs = [b"SEA" * 40, b"LAND" * 30, b"COAST" * 24]
    rows = []
    for i in range(64):
        z = 5 + (i % 3)  # unique (z, x, y): x = i//3 is distinct within each z
        rows.append((f"img{i:03d}", z, i // 3, (i * 7) % (2**z), blobs[i % 3]))
    return spark.createDataFrame(rows, "image_id string, z int, x long, y long, tile binary").cache()


def test_mbtiles_dedup_roundtrip_and_layout(dup_tiles_df, spark, tmp_path):
    """dedup=True single-file: `tiles` is a VIEW over map+images, images
    stores each distinct blob exactly once, and the standard read path
    (which selects from `tiles`) round-trips unchanged."""
    import sqlite3

    out = str(tmp_path / "mbdedup")
    path = mbt.write_mbtiles(dup_tiles_df, out, metadata={"name": "d"}, single_file=True, dedup=True)
    con = sqlite3.connect(path)
    kinds = dict(con.execute("SELECT name, type FROM sqlite_master WHERE name IN ('tiles','map','images')"))
    assert kinds == {"tiles": "view", "map": "table", "images": "table"}
    n_imgs = con.execute("SELECT count(*) FROM images").fetchone()[0]
    n_map = con.execute("SELECT count(*) FROM map").fetchone()[0]
    con.close()
    src = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in dup_tiles_df.select("z", "x", "y", "tile").collect()}
    assert n_imgs == len(set(src.values())) == 3
    assert n_map == len(src)
    back = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in mbt.read_mbtiles(spark, path).collect()}
    assert back == src
    assert mbt.read_mbtiles_metadata(path)["name"] == "d"


def test_mbtiles_dedup_sharded_parallel_read(dup_tiles_df, spark, tmp_path):
    """dedup shards read back via the distributed MapInPandas scan (the
    `tiles` view serves the same spec SELECT), per-shard blob dedup holds."""
    import glob as _g
    import sqlite3

    out = str(tmp_path / "mbdedupsh")
    mbt.write_mbtiles(dup_tiles_df.repartition(6), out, dedup=True)
    shards = _g.glob(out + "/part-*.mbtiles")
    assert len(shards) > 1
    for s in shards:
        con = sqlite3.connect(s)
        n_imgs = con.execute("SELECT count(*) FROM images").fetchone()[0]
        n_distinct = con.execute("SELECT count(DISTINCT tile_data) FROM images").fetchone()[0]
        con.close()
        assert n_imgs == n_distinct <= 3
    back = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in mbt.read_mbtiles(spark, out).collect()}
    src = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in dup_tiles_df.select("z", "x", "y", "tile").collect()}
    assert back == src


def test_mbtiles_dedup_map_projection(dup_tiles_df):
    import hashlib

    rows = convert.to_mbtiles_dedup_map(dup_tiles_df).collect()
    src = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in dup_tiles_df.select("z", "x", "y", "tile").collect()}
    assert len(rows) == len(src)
    for r in rows:
        k = (r["zoom_level"], r["tile_column"], r["tile_row"])
        assert r["tile_id"] == hashlib.md5(src[k]).hexdigest()


def test_mbtiles_tms_row_convention(tiles_df):
    kv = convert.to_mbtiles_keys(tiles_df).first()
    # canonical y IS TMS; spec stores TMS row directly
    src = tiles_df.first()
    assert kv["tile_row"] == src["y"] and kv["zoom_level"] == src["z"]


def test_tilemap_metadata(tiles_df):
    md = convert.tilemap_metadata(tiles_df).collect()
    total = sum(r["n_tiles"] for r in md)
    assert total == tiles_df.count()
    for r in md:
        assert r["xmin"] <= r["xmax"] and r["ymin"] <= r["ymax"]


def test_tilejson_pinned(spark, tmp_path):
    """TileJSON 3.0 writer pinned by hand: z=2, x in {1,2}, y=1 (TMS) →
    span = ORIGIN/2, bounds lon [-90, 90], lat [-66.51326..., 0]."""
    import json
    import math

    from tilers_tools_spark.sources import tileset

    df = spark.createDataFrame(
        [(2, 1, 1, b"t"), (2, 2, 1, b"t")], "z int, x long, y long, tile binary"
    )
    out = tileset.write_tilejson(df, str(tmp_path), name="pin", ext="png", scheme="xyz")
    doc = json.load(open(out))
    assert doc["tilejson"] == "3.0.0" and doc["name"] == "pin" and doc["scheme"] == "xyz"
    assert doc["tiles"] == ["{z}/{x}/{y}.png"]
    assert doc["minzoom"] == 2 and doc["maxzoom"] == 2
    lat_s = math.degrees(2.0 * math.atan(math.exp(-math.pi / 2.0)) - math.pi / 2.0)
    want = [-90.0, round(lat_s, 8), 90.0, 0.0]
    assert doc["bounds"] == pytest.approx(want, abs=1e-8)
    assert doc["center"][:2] == pytest.approx([0.0, round(lat_s / 2.0, 8)], abs=1e-8)
    with pytest.raises(ValueError):
        tileset.write_tilejson(df, str(tmp_path), scheme="zyx")


def test_transcode_roundtrip(tiles_df):
    from tilers_tools_spark.functions import jpegcodec

    j = convert.transcode(tiles_df.limit(5), "png", "jpeg", quality=95).collect()
    for r in j:
        dec = jpegcodec.decode_jpeg(bytes(r["tile"]))
        assert dec.shape == (8, 8, 3)
    raw = convert.transcode(tiles_df.limit(5), "png", "raw").collect()
    for r in raw:
        assert codecs.decode_raw(bytes(r["tile"])).shape == (8, 8, 4)
    # 4:2:0 tiles decode to the same shape through the subsampled MCU path
    j420 = convert.transcode(tiles_df.limit(5), "png", "jpeg", quality=95, subsampling="420").collect()
    for r in j420:
        blob = bytes(r["tile"])
        i = blob.find(b"\xff\xc0")
        assert blob[i + 11] == 0x22  # SOF luma sampling byte
        assert jpegcodec.decode_jpeg(blob).shape == (8, 8, 3)
    # bmp target: 32-bpp BI_BITFIELDS, lossless vs the png source
    src = {r["x"]: codecs.decode_png(bytes(r["tile"])) for r in tiles_df.limit(5).collect()}
    for r in convert.transcode(tiles_df.limit(5), "png", "bmp").collect():
        blob = bytes(r["tile"])
        assert codecs.sniff_fmt(blob) == "bmp"
        assert np.array_equal(codecs.decode_bmp(blob), codecs.to_rgba(src[r["x"]]))
    # gif target: paletted lossless for OPAQUE <=256-color tiles; random-
    # alpha tiles fail loudly (quantize/flatten upstream)
    from tilers_tools_spark.functions import gifcodec

    rng = np.random.default_rng(3)
    op = rng.integers(0, 256, (3, 8, 8, 4), dtype=np.uint8)
    op[:, :, :, 3] = 255
    spark = tiles_df.sparkSession
    odf = spark.createDataFrame(
        [(4, i, i, codecs.encode_png(op[i])) for i in range(3)],
        "z int, x long, y long, tile binary",
    )
    for r in convert.transcode(odf, "png", "gif").collect():
        blob = bytes(r["tile"])
        assert codecs.sniff_fmt(blob) == "gif"
        assert np.array_equal(gifcodec.decode_gif(blob), op[r["x"]][:, :, :3])
    with pytest.raises(Exception, match="opaque"):
        convert.transcode(tiles_df.limit(2), "png", "gif").collect()


def test_merge_overlay(spark, tiles_df):
    # overlay == base where overlay fully opaque; keeps disjoint keys
    base = tiles_df.limit(10)
    overlay = tiles_df.orderBy("image_id").limit(20).drop("image_id")
    merged = convert.merge_tilesets(base.drop("image_id"), overlay)
    n_keys = base.select("z", "x", "y").union(overlay.select("z", "x", "y")).distinct().count()
    assert merged.count() == n_keys
    # opaque overlay wins on collisions
    both = (
        base.select("z", "x", "y", F.col("tile").alias("tb"))
        .join(overlay.select("z", "x", "y", F.col("tile").alias("to")), ["z", "x", "y"])
        .join(merged, ["z", "x", "y"])
        .collect()
    )
    for r in both:
        ov = codecs.decode_png(bytes(r["to"]))
        mg = codecs.decode_png(bytes(r["tile"]))
        if (ov[:, :, 3] == 255).all():
            assert np.array_equal(mg[:, :, :3], ov[:, :, :3])


def test_tilemap_xml(tiles_df, tmp_path):
    import xml.etree.ElementTree as ET
    from tilers_tools_spark.sources.tileset import write_tilemap_xml
    from tilers_tools_spark.functions import tilemath as tm

    out = write_tilemap_xml(tiles_df, str(tmp_path), title="t")
    root = ET.parse(out).getroot()
    assert root.tag == "TileMap" and root.get("version") == "1.0.0"
    assert root.find("SRS").text == "EPSG:900913"
    zs = sorted(int(r["z"]) for r in tiles_df.select("z").distinct().collect())
    ts = root.find("TileSets").findall("TileSet")
    assert [int(t.get("href")) for t in ts] == zs
    for t in ts:
        assert abs(float(t.get("units-per-pixel")) - tm.RES0 / 2 ** int(t.get("href"))) < 1e-9
    bb = root.find("BoundingBox")
    assert float(bb.get("minx")) < float(bb.get("maxx"))
    # deterministic bytes
    a = open(out).read()
    write_tilemap_xml(tiles_df, str(tmp_path), title="t")
    assert open(out).read() == a


def test_tilemap_xml_geodetic(spark, tmp_path):
    """Global-geodetic TMS metadata: SRS EPSG:4326, origin (-180,-90),
    units-per-pixel 0.703125/2^z, profile attr 'global-geodetic', degree
    bounds derived from the deepest zoom's tile range."""
    import xml.etree.ElementTree as ET
    import pandas as _pd
    from tilers_tools_spark.sources.tileset import write_tilemap_xml
    from tilers_tools_spark.functions import tilemath as tm

    # z=1 geodetic: 4x2 grid; tiles (1,2,1) and (1,3,1) = lon [0,180) lat [0,90)
    df = spark.createDataFrame(
        _pd.DataFrame({"z": [1, 1], "x": [2, 3], "y": [1, 1], "tile": [b"a", b"b"]})
    )
    out = write_tilemap_xml(df, str(tmp_path), title="g", profile="geodetic")
    root = ET.parse(out).getroot()
    assert root.find("SRS").text == "EPSG:4326"
    o = root.find("Origin")
    assert float(o.get("x")) == -180.0 and float(o.get("y")) == -90.0
    tsets = root.find("TileSets")
    assert tsets.get("profile") == "global-geodetic"
    (t1,) = tsets.findall("TileSet")
    assert float(t1.get("units-per-pixel")) == tm.RES0_GEO / 2.0
    bb = root.find("BoundingBox")
    assert (float(bb.get("minx")), float(bb.get("miny")), float(bb.get("maxx")), float(bb.get("maxy"))) == (
        0.0, 0.0, 180.0, 90.0,
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_tilemap_xml(df, str(tmp_path), profile="utm")


def test_quadkey_published_kat_and_roundtrip(spark):
    """Bing tile-system KAT (published docs): level-3 tile x=3, y_xyz=5 ->
    quadkey '213'; plus full roundtrip via from_quadkey at mixed zooms."""
    import pandas as _pd
    from tilers_tools_spark.operators import convert as cv

    # y in TMS: y_tms = 2^z - 1 - y_xyz
    rows = _pd.DataFrame(
        {
            "z": [3, 1, 1, 2, 8, 0],
            "x": [3, 0, 1, 3, 137, 0],
            # y is TMS: y_tms = 2^z - 1 - y_xyz; KAT y_xyz = [5, 0, 0, 3, 201, 0]
            "y": [2 ** 3 - 1 - 5, 1 - 0, 1 - 0, 3 - 3, 2 ** 8 - 1 - 201, 0],
        }
    )
    t = cv.quadkey(spark.createDataFrame(rows))
    got = {(r["z"], r["x"]): r["quadkey"] for r in t.collect()}
    assert got[(3, 3)] == "213"  # published example
    assert got[(1, 0)] == "0" and got[(1, 1)] == "1"
    assert got[(2, 3)] == "33"
    assert got[(0, 0)] == ""  # root tile: empty quadkey, roundtrips below
    back = cv.from_quadkey(t.select("quadkey"), "quadkey").toPandas()
    merged = t.toPandas().merge(back, on="quadkey", suffixes=("", "_rt"))
    assert (merged.z == merged.z_rt).all()
    assert (merged.x == merged.x_rt).all()
    assert (merged.y == merged.y_rt).all()


def test_tiles_in_bbox_pushdown(spark, tmp_path):
    """The viewport filter is literal range predicates: against a
    z-partitioned parquet tile table the z predicate partition-prunes and
    x/y reach PushedFilters (row-group pruning) — and the result matches
    a brute-force filter."""
    import numpy as np
    import pandas as _pd
    from tilers_tools_spark.operators import convert as cv

    rng = np.random.default_rng(3)
    rows = _pd.DataFrame(
        {
            "z": np.repeat([7, 8], 500),
            "x": rng.integers(0, 256, 1000),
            "y": rng.integers(0, 256, 1000),
        }
    )
    rows.loc[rows.z == 7, ["x", "y"]] %= 128
    path = str(tmp_path / "tiles")
    spark.createDataFrame(rows).write.partitionBy("z").parquet(path)
    t = spark.read.parquet(path)
    hits = cv.tiles_in_bbox(t, 8, -60.0, -30.0, 45.0, 40.0)
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(x" in plan
    # partition pruning: only the z=8 directory is read
    assert "PartitionFilters" in plan
    got = {(r["x"], r["y"]) for r in hits.collect()}
    from tilers_tools_spark.functions import tilemath as tmn

    mx0, my0 = tmn.merc_np(np.array([-60.0]), np.array([-30.0]))
    mx1, my1 = tmn.merc_np(np.array([45.0]), np.array([40.0]))
    x0, x1, y0, y1 = (int(v[0]) for v in tmn.cover_range_np(mx0, my0, mx1, my1, np.array([8])))
    want = {
        (int(r.x), int(r.y))
        for _, r in rows[rows.z == 8].iterrows()
        if x0 <= r.x <= x1 and y0 <= r.y <= y1
    }
    assert got == want


def test_transcode_to_tiff_roundtrip(spark):
    """tiff joins png/jpeg/raw as a transcode target: RGBA survives a
    png -> tiff -> raw double transcode byte-exactly (deflate TIFF is
    lossless), closing container symmetry with the sniffing reader."""
    import numpy as np

    from tilers_tools_spark.functions import codecs
    from tilers_tools_spark.operators import convert

    rng = np.random.default_rng(17)
    arrs = [rng.integers(0, 256, (8, 8, 4), dtype=np.uint8) for _ in range(3)]
    rows = [(3, i, i, codecs.encode_png(a)) for i, a in enumerate(arrs)]
    df = spark.createDataFrame(rows, "z int, x long, y long, tile binary")
    as_tiff = convert.transcode(df, src_fmt="png", dst_fmt="tiff")
    blobs = {r["x"]: bytes(r["tile"]) for r in as_tiff.collect()}
    assert all(codecs.sniff_fmt(b) == "tiff" for b in blobs.values())
    back = convert.transcode(as_tiff, src_fmt="tiff", dst_fmt="raw")
    out = {r["x"]: codecs.decode_raw(bytes(r["tile"])) for r in back.collect()}
    for i, a in enumerate(arrs):
        assert np.array_equal(out[i], a)


def test_zoomify_path_hand_pinned(spark):
    """Published Zoomify numbering pinned by hand: z0 single tile is
    index 0; z1 tiles follow row-major (1..4); z2 starts at 5 — offset
    (4^z-1)/3 — and TileGroup folders break every 256 tiles."""
    rows = [(0, 0, 0), (1, 0, 1), (1, 1, 0), (2, 3, 0), (5, 10, (2**5 - 1) - 7)]
    df = spark.createDataFrame(
        [(z, x, y, b"") for z, x, y in rows], "z int, x long, y long, tile binary"
    )
    got = {(r["z"], r["x"]): (r["tile_index"], r["path"])
           for r in convert.zoomify_path(df).collect()}
    # (z, x, y TMS): y_xyz = 2^z-1-y
    assert got[(0, 0)] == (0, "TileGroup0/0-0-0.jpg")        # the root tile
    assert got[(1, 0)] == (1, "TileGroup0/1-0-0.jpg")        # y_xyz=0 row first
    assert got[(1, 1)] == (4, "TileGroup0/1-1-1.jpg")        # last z1 tile
    assert got[(2, 3)] == (5 + 3 * 4 + 3, "TileGroup0/2-3-3.jpg")
    # z=5 offset (4^5-1)/3 = 341; y_xyz=7 -> idx = 341 + 7*32 + 10 = 575
    assert got[(5, 10)] == (575, "TileGroup2/5-10-7.jpg")


def test_zoomify_dir_write(tiles_df, tmp_path):
    import glob

    from tilers_tools_spark.sources import tileset

    d = str(tmp_path / "zfy")
    tileset.write_tileset_dir(tiles_df.limit(6), d, scheme="zoomify")
    files = glob.glob(d + "/TileGroup*/*.png")
    assert len(files) == 6
    for f in files:
        assert f.split("/")[-2].startswith("TileGroup")


def test_leaflet_html_writer(tiles_df, tmp_path):
    """gdal2tiles -w leaflet parity: zoom range, tms flag, url template
    and fitBounds lat/lon recomputed from the deepest zoom's tile range
    via a scalar replay of the same published inverse-mercator formula."""
    import math
    import re as _re

    from tilers_tools_spark.functions import tilemath as tm
    from tilers_tools_spark.sources import tileset

    out = tileset.write_leaflet_html(tiles_df, str(tmp_path), title="t", scheme="tms")
    html = open(out).read()
    zs = [int(r["z"]) for r in tiles_df.select("z").distinct().collect()]
    assert f"minZoom: {min(zs)}, maxZoom: {max(zs)}, tms: true" in html
    assert "L.tileLayer('./{z}/{x}/{y}.png'" in html
    m = _re.search(r"fitBounds\(\[\[([-\d.]+), ([-\d.]+)\], \[([-\d.]+), ([-\d.]+)\]\]\)", html)
    assert m
    la0, lo0, la1, lo1 = (float(v) for v in m.groups())
    # scalar replay of the bounds: deepest zoom's tile extent corners
    from tilers_tools_spark.operators.convert import tilemap_metadata
    deepest = max(tilemap_metadata(tiles_df).collect(), key=lambda r: r["z"])
    span = tm.RES0 / (2.0 ** deepest["z"]) * 256.0
    R = 6378137.0
    def inv(mx, my):
        return (math.degrees(mx / R),
                math.degrees(2.0 * math.atan(math.exp(my / R)) - math.pi / 2.0))
    lo0e, la0e = inv(deepest["xmin"] * span - tm.ORIGIN, deepest["ymin"] * span - tm.ORIGIN)
    lo1e, la1e = inv((deepest["xmax"] + 1) * span - tm.ORIGIN, (deepest["ymax"] + 1) * span - tm.ORIGIN)
    assert abs(la0 - la0e) < 1e-6 and abs(lo0 - lo0e) < 1e-6
    assert abs(la1 - la1e) < 1e-6 and abs(lo1 - lo1e) < 1e-6


def test_openlayers_html_writer(tiles_df, tmp_path):
    """gdal2tiles -w openlayers parity: mercator extent from the deepest
    zoom's tile range, zoom bounds, and the {-y} TMS url token."""
    import re as _re

    from tilers_tools_spark.functions import tilemath as tm
    from tilers_tools_spark.operators.convert import tilemap_metadata
    from tilers_tools_spark.sources import tileset

    out = tileset.write_openlayers_html(tiles_df, str(tmp_path), title="t", scheme="tms")
    html = open(out).read()
    zs = [int(r["z"]) for r in tiles_df.select("z").distinct().collect()]
    assert f"minZoom: {min(zs)}, maxZoom: {max(zs)}" in html
    assert "/{z}/{x}/{-y}.png" in html
    m = _re.search(r"var extent = \[([-\d.e+]+), ([-\d.e+]+), ([-\d.e+]+), ([-\d.e+]+)\];", html)
    assert m
    deepest = max(tilemap_metadata(tiles_df).collect(), key=lambda r: r["z"])
    span = tm.RES0 / (2.0 ** deepest["z"]) * 256.0
    exp = (deepest["xmin"] * span - tm.ORIGIN, deepest["ymin"] * span - tm.ORIGIN,
           (deepest["xmax"] + 1) * span - tm.ORIGIN, (deepest["ymax"] + 1) * span - tm.ORIGIN)
    got = tuple(float(v) for v in m.groups())
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, exp))
    # xyz scheme keeps the plain {y} token
    html2 = open(tileset.write_openlayers_html(tiles_df, str(tmp_path / "x"), scheme="xyz")).read()
    assert "/{z}/{x}/{y}.png" in html2


def test_rmaps_key_convention(tiles_df):
    """Published RMaps/BigPlanet rules worked by hand: stored z = 17 -
    zoom, y flipped TMS -> OSM top-down, s = 0 (e.g. zoom 10, y_tms 3 ->
    stored (z=7, y=1020))."""
    src = tiles_df.first()
    kv = convert.to_rmaps_keys(tiles_df).first()
    assert kv["z"] == 17 - src["z"]
    assert kv["y"] == 2 ** src["z"] - 1 - src["y"]
    assert kv["x"] == src["x"] and kv["s"] == 0
    # inverse is the identity
    back = convert.from_rmaps_keys(convert.to_rmaps_keys(tiles_df))
    a = tiles_df.select("z", "x", "y", "tile")
    assert back.exceptAll(a).isEmpty() and a.exceptAll(back).isEmpty()


def test_rmaps_roundtrip_and_schema(tiles_df, spark, tmp_path):
    import sqlite3

    from tilers_tools_spark.sources import rmaps

    out = str(tmp_path / "rm")
    path = rmaps.write_rmaps(tiles_df, out, single_file=True)
    assert path.endswith(".sqlitedb")
    # structural: the published schema, byte-for-byte column names + pk
    con = sqlite3.connect(path)
    cols = con.execute("PRAGMA table_info(tiles)").fetchall()
    assert [c[1] for c in cols] == ["x", "y", "z", "s", "image"]
    assert [c[1] for c in cols if c[5] > 0] == ["x", "y", "z", "s"]  # pk members
    stored_z = [r[0] for r in con.execute("SELECT DISTINCT z FROM tiles")]
    con.close()
    src_z = {r["z"] for r in tiles_df.select("z").distinct().collect()}
    assert set(stored_z) == {17 - z for z in src_z}
    info = rmaps.read_rmaps_info(path)
    assert info["minzoom"] == min(stored_z) and info["maxzoom"] == max(stored_z)
    back = rmaps.read_rmaps(spark, path)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_rmaps_parallel_shard_read(tiles_df, spark, tmp_path):
    import glob as _g

    from tilers_tools_spark.sources import rmaps

    out = str(tmp_path / "rmshards")
    rmaps.write_rmaps(tiles_df.repartition(6), out)
    assert len(_g.glob(out + "/part-*.sqlitedb")) > 1
    back = rmaps.read_rmaps(spark, out)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_gpkg_key_convention(tiles_df):
    """Published GeoPackage rules worked by hand (OGC 12-128r18 §2.2.8):
    tile_row is TOP-DOWN (row 0 north), so tile_row = 2^z - 1 - y_tms;
    zoom_level and tile_column pass through (e.g. zoom 10, y_tms 3 ->
    tile_row 1020)."""
    src = tiles_df.first()
    kv = convert.to_gpkg_keys(tiles_df).first()
    assert kv["zoom_level"] == src["z"]
    assert kv["tile_column"] == src["x"]
    assert kv["tile_row"] == 2 ** src["z"] - 1 - src["y"]
    back = convert.from_gpkg_keys(convert.to_gpkg_keys(tiles_df))
    a = tiles_df.select("z", "x", "y", "tile")
    assert back.exceptAll(a).isEmpty() and a.exceptAll(back).isEmpty()


def test_gpkg_roundtrip_and_metadata(tiles_df, spark, tmp_path):
    import sqlite3

    from tilers_tools_spark.functions import tilemath as tm
    from tilers_tools_spark.sources import gpkg

    out = str(tmp_path / "gp")
    path = gpkg.write_gpkg(tiles_df, out, single_file=True)
    assert path.endswith(".gpkg")
    # structural: required OGC tables + the GPKG magic application_id
    con = sqlite3.connect(path)
    assert con.execute("PRAGMA application_id").fetchone()[0] == 0x47504B47
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"gpkg_spatial_ref_sys", "gpkg_contents", "gpkg_tile_matrix_set",
            "gpkg_tile_matrix", "tiles"} <= tables
    srs = {r[0] for r in con.execute("SELECT srs_id FROM gpkg_spatial_ref_sys")}
    assert {-1, 0, 4326, 3857} <= srs  # spec-required rows + the tile SRS
    # per-zoom matrix rows: 2^z x 2^z, 256px, pixel size RES0/2^z by hand
    mats = {z: (w, h, tw, th, px, py) for z, w, h, tw, th, px, py in con.execute(
        "SELECT zoom_level, matrix_width, matrix_height, tile_width,"
        " tile_height, pixel_x_size, pixel_y_size FROM gpkg_tile_matrix")}
    src_z = {r["z"] for r in tiles_df.select("z").distinct().collect()}
    assert set(mats) == src_z
    for z, (w, h, tw, th, px, py) in mats.items():
        assert (w, h, tw, th) == (2**z, 2**z, 256, 256)
        assert px == py == tm.RES0 / 2**z
    # contents bbox: actual tile extent at max zoom, worked independently
    zmax = max(src_z)
    keys = [(r["x"], 2 ** r["z"] - 1 - r["y"]) for r in tiles_df.collect() if r["z"] == zmax]
    tsz = tm.RES0 * 256.0 / 2**zmax
    exp = (-tm.ORIGIN + min(c for c, _ in keys) * tsz,
           tm.ORIGIN - (max(r for _, r in keys) + 1) * tsz,
           -tm.ORIGIN + (max(c for c, _ in keys) + 1) * tsz,
           tm.ORIGIN - min(r for _, r in keys) * tsz)
    got = con.execute(
        "SELECT min_x, min_y, max_x, max_y FROM gpkg_contents").fetchone()
    assert all(abs(a - b) < 1e-6 for a, b in zip(got, exp))
    con.close()
    info = gpkg.read_gpkg_info(path)
    assert info["table"] == "tiles" and info["srs_id"] == 3857
    back = gpkg.read_gpkg(spark, path)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_gpkg_parallel_shard_read(tiles_df, spark, tmp_path):
    import glob as _g

    from tilers_tools_spark.sources import gpkg

    out = str(tmp_path / "gpshards")
    gpkg.write_gpkg(tiles_df.repartition(6), out)
    assert len(_g.glob(out + "/part-*.gpkg")) > 1
    back = gpkg.read_gpkg(spark, out)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_osmdroid_key_convention(tiles_df):
    """Published osmdroid getIndex rule worked by hand: key =
    (((z << z) + x) << z) + y_osm with y_osm = 2^z - 1 - y_tms (e.g.
    z=10, x=5, y_tms=3 -> y_osm=1020, key = (10*1024 + 5)*1024 + 1020 =
    10491900); inverse is the identity."""
    src = tiles_df.first()
    kv = convert.to_osmdroid_keys(tiles_df, provider="p").first()
    z, x, y = src["z"], src["x"], src["y"]
    assert kv["key"] == (((z << z) + x) << z) + (2**z - 1 - y)
    assert kv["provider"] == "p"
    back = convert.from_osmdroid_keys(convert.to_osmdroid_keys(tiles_df))
    a = tiles_df.select("z", "x", "y", "tile")
    assert back.exceptAll(a).isEmpty() and a.exceptAll(back).isEmpty()


def test_osmdroid_roundtrip_and_schema(tiles_df, spark, tmp_path):
    import sqlite3

    from tilers_tools_spark.sources import osmdroid

    out = str(tmp_path / "osm")
    path = osmdroid.write_osmdroid(tiles_df, out, provider="p", single_file=True)
    assert path.endswith(".sqlite")
    con = sqlite3.connect(path)
    cols = con.execute("PRAGMA table_info(tiles)").fetchall()
    assert [c[1] for c in cols] == ["key", "provider", "tile"]
    assert [c[1] for c in cols if c[5] > 0] == ["key", "provider"]  # pk members
    provs = [r[0] for r in con.execute("SELECT DISTINCT provider FROM tiles")]
    con.close()
    assert provs == ["p"]
    back = osmdroid.read_osmdroid(spark, path)
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_osmdroid_parallel_shard_read(tiles_df, spark, tmp_path):
    import glob as _g

    from tilers_tools_spark.sources import osmdroid

    out = str(tmp_path / "osmshards")
    osmdroid.write_osmdroid(tiles_df.repartition(6), out)
    assert len(_g.glob(out + "/part-*.sqlite")) > 1
    back = osmdroid.read_osmdroid(spark, out)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    a = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in tiles_df.select("z", "x", "y", "tile").collect()}
    b = {(r["z"], r["x"], r["y"]): bytes(r["tile"]) for r in back.collect()}
    assert a == b


def test_webdataset_roundtrip_and_determinism(spark, tmp_path):
    """Tar-shard export: adjacent {key}.{ext}/{key}.txt members, sorted
    within shard, zeroed tar metadata -> byte-identical re-export;
    read-back recovers bytes + captions exactly (incl. unicode and a
    caption-less sample)."""
    import hashlib
    import tarfile as _tar

    from tilers_tools_spark.sources import webdataset as wds

    rows = [
        ("img_a", b"\x01\x02\x03", "png", "a striped cat"),
        ("img_b", b"\x04\x05", "jpeg", "café terrace — night"),
        ("img_c", b"\x06", "raw", None),
        ("img_d", b"\x07\x08", "png", "plain"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, caption string")
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    wds.write_webdataset(df, out1, n_shards=3, seed=5)
    wds.write_webdataset(df, out2, n_shards=3, seed=5)
    import glob as _g

    f1 = sorted(_g.glob(out1 + "/shard-*.tar"))
    assert f1  # at least one shard materialized
    dig = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()
    assert [dig(f) for f in f1] == [dig(f) for f in sorted(_g.glob(out2 + "/shard-*.tar"))]
    # jpeg ext mapping + member adjacency + sorted order inside a shard
    names = []
    for f in f1:
        with _tar.open(f) as tf:
            ns = tf.getnames()
            stems = [n.rpartition(".")[0] for n in ns]
            assert stems == sorted(stems)  # sorted, adjacent per key
            names += ns
    assert any(n.endswith(".jpg") for n in names) and not any(n.endswith(".jpeg") for n in names)
    assert "img_c.txt" not in names  # caption-less sample has no txt member
    back = {r["image_id"]: r for r in wds.read_webdataset(spark, out1).collect()}
    for k, b, fmt, cap in rows:
        assert bytes(back[k]["bytes"]) == b and back[k]["fmt"] == fmt
        assert back[k]["caption"] == cap
    # manifest agrees with what landed in the tars
    man = {r["shard_id"]: r["n_members"] for r in
           wds.shard_manifest(df, n_shards=3, seed=5).collect()}
    per_shard = {}
    for f in f1:
        sid = int(f.rsplit("-", 1)[1].split(".")[0])
        with _tar.open(f) as tf:
            per_shard[sid] = len({n.rpartition(".")[0] for n in tf.getnames()})
    assert per_shard == {k: v for k, v in man.items() if v}


def test_wmts_capabilities_pinned(spark, tmp_path):
    """WMTS GetCapabilities pinned by hand on the TileJSON fixture (z=2,
    x in {1,2}, y_tms=1): ScaleDenominator(2) = RES0/4/0.00028 =
    139770566.00717944..., MatrixWidth 4, limits flip TMS y=1 to
    TileRow 2, WGS84 bbox lon [-90, 90] / lat [lat_s, 0]."""
    import math
    import xml.etree.ElementTree as ET

    from tilers_tools_spark.sources import tileset

    df = spark.createDataFrame(
        [(2, 1, 1, b"t"), (2, 2, 1, b"t")], "z int, x long, y long, tile binary"
    )
    out = tileset.write_wmts_capabilities(df, str(tmp_path), name="pin", ext="png")
    ns = {"w": "http://www.opengis.net/wmts/1.0", "ows": "http://www.opengis.net/ows/1.1"}
    root = ET.parse(out).getroot()
    tmx = root.findall(".//w:TileMatrixSet/w:TileMatrix", ns)
    assert len(tmx) == 1
    assert tmx[0].find("ows:Identifier", ns).text == "2"
    sd = float(tmx[0].find("w:ScaleDenominator", ns).text)
    assert sd == pytest.approx(156543.03392804097 / 4 / 0.00028, rel=1e-15)
    assert tmx[0].find("w:MatrixWidth", ns).text == "4"
    lim = root.find(".//w:TileMatrixLimits", ns)
    assert lim.find("w:MinTileRow", ns).text == "2" and lim.find("w:MaxTileRow", ns).text == "2"
    assert lim.find("w:MinTileCol", ns).text == "1" and lim.find("w:MaxTileCol", ns).text == "2"
    lo = root.find(".//ows:WGS84BoundingBox/ows:LowerCorner", ns).text.split()
    hi = root.find(".//ows:WGS84BoundingBox/ows:UpperCorner", ns).text.split()
    lat_s = math.degrees(2.0 * math.atan(math.exp(-math.pi / 2.0)) - math.pi / 2.0)
    assert [float(lo[0]), float(lo[1])] == pytest.approx([-90.0, lat_s], abs=1e-7)
    assert [float(hi[0]), float(hi[1])] == pytest.approx([90.0, 0.0], abs=1e-7)
    url = root.find(".//w:ResourceURL", ns)
    assert url.get("template") == "{TileMatrix}/{TileCol}/{TileRow}.png"
