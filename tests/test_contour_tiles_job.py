"""contour_tiles CLI job: DEM GeoTIFF -> contour MVT tree end-to-end
(georef placement, pbf decode, TileJSON)."""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np

from tilers_tools_spark.functions import codecs, tiffcodec
from tilers_tools_spark.functions import tilemath as tm


def test_contour_tiles_job(spark, tmp_path):
    # cone DEM, 64x64, centered near (10E, 20N) at ~500 m/px in 3857
    h = w = 64
    r, c = np.mgrid[0:h, 0:w]
    dem = (100.0 - np.hypot(r - 32, c - 32) * 2.0).astype(np.float32)
    mx, my = tm.merc_np(np.array([10.0]), np.array([20.0]))
    gsd = 500.0
    geo = {"gsd": gsd, "mx0": float(mx[0]) - 32 * gsd, "my1": float(my[0]) + 32 * gsd,
           "epsg": 3857}
    blob = tiffcodec.encode_tiff(dem, geo=geo)
    src = str(tmp_path / "dems.parquet")
    spark.createDataFrame([("d1", blob)], "image_id string, bytes binary").write.parquet(src)
    dst = str(tmp_path / "ctiles")

    out = subprocess.run(
        [sys.executable, "jobs/contour_tiles.py", "--dems", src, "--levels", "50",
         "--z", "8", "--dst", dst, "--master", "local[4]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["n_lines"] >= 1 and stats["n_tiles"] >= 1
    assert stats["rasters_skipped_no_georef"] == 0

    # the level-50 contour of the cone is a ring of radius 25 px around
    # (10E, 20N): the covering z=8 tile must be the one containing the center
    zz = np.array([8])
    txa, tya = tm.tile_xy_np(mx, my, zz)
    tx, ty = int(txa[0]), int(tya[0])
    import os

    found = []
    for root, _d, files in os.walk(dst):
        for f in files:
            if f.endswith(".pbf"):
                parts = root.split(os.sep)
                found.append((int(parts[-2]), int(parts[-1]), int(f[:-4])))
    assert found, "no pbf tiles written"
    xs = {(x, 2**8 - 1 - y_xyz) for _z, x, y_xyz in found}  # dir scheme is xyz
    assert (tx, ty) in xs
    # every blob decodes and carries the contours layer
    from tilers_tools_spark.functions import mvtcodec

    for root, _d, files in os.walk(dst):
        for f in files:
            if f.endswith(".pbf"):
                layers = mvtcodec.decode_mvt(open(os.path.join(root, f), "rb").read())
                assert "contours" in layers
    # TileJSON written with vector_layers
    tj = json.load(open(os.path.join(dst, "tiles.json")))
    assert tj["vector_layers"][0]["id"] == "contours"
