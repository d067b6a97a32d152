"""T1 golden-file check (FIXTURES.md §7): the committed key set + spot
tiles were produced by the oracle; the engine must reproduce them exactly.
Fast regression guard that runs without the (slow) in-test oracle.
"""

import csv
import hashlib
import os

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_engine_matches_golden(spark, images_smoke):
    from tilers_tools_spark.operators.render import render_pyramid

    with open(os.path.join(GOLDEN, "tile_keys.csv")) as f:
        want = {
            (r["image_id"], int(r["z"]), int(r["x"]), int(r["y"]), int(r["y_xyz"]), int(r["h3_cell"]), int(r["s2_cell"]))
            for r in csv.DictReader(f)
        }
    tiles = render_pyramid(spark.read.parquet(images_smoke)).select(
        "image_id", "z", "x", "y", "y_xyz", "h3_cell", "s2_cell", "tile"
    ).toPandas()
    got = {
        (r.image_id, int(r.z), int(r.x), int(r.y), int(r.y_xyz), int(r.h3_cell), int(r.s2_cell))
        for r in tiles.itertuples()
    }
    assert got == want

    with open(os.path.join(GOLDEN, "manifest.csv")) as f:
        manifest = {r["file"]: r["sha256"] for r in csv.DictReader(f)}
    by_key = {(r.image_id, int(r.z), int(r.x), int(r.y)): bytes(r.tile) for r in tiles.itertuples()}
    for name, sha in manifest.items():
        image_id, z, x, y = name[:-4].rsplit("_", 3)[0], *map(int, name[:-4].rsplit("_", 3)[1:])
        assert hashlib.sha256(by_key[(image_id, z, x, y)]).hexdigest() == sha, name
