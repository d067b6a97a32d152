"""T1/T2 — distributed pipeline vs minitiler oracle, bit-for-tile
(BASELINE.json:6): identical (image_id, z, x, y) sets, identical H3/S2 ids,
byte-identical PNG tiles, captions carried unchanged (BASELINE.json:15).
"""

import numpy as np
import pytest

from fixtures import gen
from oracle import minitiler as mt
from tilers_tools_spark.functions import codecs, h3lite
from tilers_tools_spark.operators.render import render_pyramid


@pytest.fixture(scope="module")
def oracle_tiles():
    out = {}
    for rec in gen.gen_images(100, fmts=("raw", "png", "jpeg")):
        for r in mt.tile_image(rec):
            out[(r["image_id"], r["z"], r["x"], r["y"])] = r
    return out


@pytest.fixture(scope="module")
def engine_tiles(spark, images_smoke):
    df = spark.read.parquet(images_smoke)
    return render_pyramid(df).toPandas()


def test_key_sets_bit_for_tile(engine_tiles, oracle_tiles):
    ekeys = set(zip(engine_tiles.image_id, engine_tiles.z, engine_tiles.x, engine_tiles.y))
    assert ekeys == set(oracle_tiles.keys())
    assert len(engine_tiles) == len(ekeys)  # no dup keys


def test_xyz_y_and_schema(engine_tiles):
    z = engine_tiles.z.to_numpy()
    assert np.array_equal(engine_tiles.y_xyz.to_numpy(), (1 << z.astype(np.int64)) - 1 - engine_tiles.y.to_numpy())
    assert engine_tiles.h3_res.between(0, 12).all()


def test_pixels_byte_identical(engine_tiles, oracle_tiles):
    sample = engine_tiles.sample(n=min(200, len(engine_tiles)), random_state=1)
    for _, row in sample.iterrows():
        o = oracle_tiles[(row.image_id, row.z, row.x, row.y)]
        arr = codecs.decode_png(bytes(row.tile))
        assert np.array_equal(arr, o["rgba"]), (row.image_id, row.z, row.x, row.y)
        # byte-level: engine PNG encoder is deterministic
        assert bytes(row.tile) == codecs.encode_tile_png(o["rgba"])


def test_h3_s2_captions_match_oracle(engine_tiles, oracle_tiles):
    for _, row in engine_tiles.sample(n=min(300, len(engine_tiles)), random_state=2).iterrows():
        o = oracle_tiles[(row.image_id, row.z, row.x, row.y)]
        assert row.s2_cell == o["s2_cell"]
        assert row.caption == o["caption"]
        h3_ora = int(h3lite.latlng_to_cell(np.array([o["lat"]]), np.array([o["lon"]]), mt.h3_res_for_zoom(row.z))[0])
        assert row.h3_cell == h3_ora


@pytest.mark.parametrize("kernel", ["cubic", "lanczos", "nearest"])
def test_base_resampling_kernels_bit_identical(spark, images_smoke, kernel):
    """gdalwarp-set base-cut kernels beyond bilinear (SURVEY §2.3 row 17:
    near, bilinear, cubic, lanczos) — engine vs oracle byte-identical,
    same shared 8.8 fixed-point contract (nearest is gather-only)."""
    df = spark.read.parquet(images_smoke).limit(12)
    eng = render_pyramid(df, base_resampling=kernel).toPandas()
    ids = set(eng.image_id)
    ora = {}
    for rec in gen.gen_images(100, fmts=("raw", "png", "jpeg")):
        if rec["image_id"] in ids:
            for r in mt.tile_image(rec, base_resampling=kernel):
                ora[(r["image_id"], r["z"], r["x"], r["y"])] = r
    assert set(zip(eng.image_id, eng.z, eng.x, eng.y)) == set(ora.keys())
    for _, row in eng.sample(n=min(120, len(eng)), random_state=3).iterrows():
        o = ora[(row.image_id, row.z, row.x, row.y)]
        assert bytes(row.tile) == codecs.encode_tile_png(o["rgba"]), (row.image_id, row.z, row.x, row.y)
    # the kernel differs from bilinear on real content (actually engaged)
    bil = render_pyramid(df, base_resampling="bilinear").toPandas()
    key = ["image_id", "z", "x", "y"]
    merged = eng.merge(bil, on=key, suffixes=("_c", "_b"))
    assert any(bytes(a) != bytes(b) for a, b in zip(merged.tile_c, merged.tile_b))


def test_determinism_across_parallelism(spark, images_smoke):
    """T3: local partitioning must not affect results (order-insensitive)."""
    df = spark.read.parquet(images_smoke)
    a = render_pyramid(df.repartition(2)).drop("part_id").toPandas()
    b = render_pyramid(df.repartition(13)).drop("part_id").toPandas()
    key = ["image_id", "z", "x", "y"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert all(bytes(x) == bytes(y) for x, y in zip(a.tile, b.tile))
    assert (a.h3_cell.to_numpy() == b.h3_cell.to_numpy()).all()


def test_warp_tile_rotated_affine_bit_identical(spark):
    """General-affine warp (rotation) — engine vs oracle byte-identical,
    same 8.8 fixed-point contract; north-up degenerate case agrees with
    the pyramid kernel's geometry."""
    import math
    from tilers_tools_spark.functions import tilemath as tm
    from tilers_tools_spark.operators.render import render_warped, warp_tile, affine_cover

    rng = np.random.default_rng(12)
    w, h = 300, 220
    rgba = np.dstack([
        rng.integers(0, 256, (h, w, 3), dtype=np.uint8),
        np.full((h, w), 255, np.uint8),
    ])
    # rotated chart near (139.7E, 35.7N): gsd 40 m/px, 25 deg rotation
    theta = math.radians(25.0)
    gsd = 40.0
    mx_c, my_c = (float(v[0]) for v in tm.merc_np(np.array([139.7]), np.array([35.7])))
    A = np.array([
        [gsd * math.cos(theta), gsd * math.sin(theta), mx_c],
        [gsd * math.sin(theta), -gsd * math.cos(theta), my_c],
    ])
    z = 13
    txmin, txmax, tymin, tymax = affine_cover(A, w, h, z)
    assert (txmax - txmin + 1) * (tymax - tymin + 1) > 1
    n_checked = 0
    for tx in range(txmin, txmax + 1):
        for ty in range(tymin, tymax + 1):
            eng = warp_tile(rgba, A, z, tx, ty)
            ora = mt.warp_tile(rgba, A, z, tx, ty)
            assert np.array_equal(eng, ora), (tx, ty)
            n_checked += 1
    assert n_checked >= 2
    # the Spark operator end-to-end: rows match the per-tile kernel
    pdf = __import__("pandas").DataFrame([{
        "image_id": "r0", "bytes": codecs.encode_raw(rgba), "fmt": "raw",
        "a00": A[0, 0], "a01": A[0, 1], "a02": A[0, 2],
        "a10": A[1, 0], "a11": A[1, 1], "a12": A[1, 2],
    }])
    df = spark.createDataFrame(pdf)
    got = render_warped(df, zoom=z).toPandas()
    want_keys = set()
    for tx in range(txmin, txmax + 1):
        for ty in range(tymin, tymax + 1):
            if mt.warp_tile(rgba, A, z, tx, ty)[:, :, 3].max() > 0:
                want_keys.add((z, tx, ty))
    assert {(r.z, r.x, r.y) for r in got.itertuples()} == want_keys
    for r in got.itertuples():
        assert bytes(r.tile) == codecs.encode_tile_png(mt.warp_tile(rgba, A, z, r.x, r.y))
