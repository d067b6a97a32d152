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


def test_transcode_roundtrip(tiles_df):
    from tilers_tools_spark.functions import jpegcodec

    j = convert.transcode(tiles_df.limit(5), "png", "jpeg", quality=95).collect()
    for r in j:
        dec = jpegcodec.decode_jpeg(bytes(r["tile"]))
        assert dec.shape == (8, 8, 3)
    raw = convert.transcode(tiles_df.limit(5), "png", "raw").collect()
    for r in raw:
        assert codecs.decode_raw(bytes(r["tile"])).shape == (8, 8, 4)


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
