"""Produce the committed golden fixtures (FIXTURES.md §7) from the oracle:
(a) full (image_id,z,x,y,y_xyz,h3_cell,s2_cell) key set CSV for sf-smoke,
(b) 20 spot-check tiles as PNG bytes, (c) a sha256 manifest.
Run: python tools/make_golden.py
"""

import csv
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fixtures import gen  # noqa: E402
from oracle import minitiler as mt  # noqa: E402
from tilers_tools_spark.functions import codecs, h3lite  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    os.makedirs(os.path.join(OUT, "tiles"), exist_ok=True)
    rows = []
    spot = []
    for rec in gen.gen_images(100, fmts=("raw", "png", "jpeg")):
        for r in mt.tile_image(rec):
            h3 = int(h3lite.latlng_to_cell(np.array([r["lat"]]), np.array([r["lon"]]), mt.h3_res_for_zoom(r["z"]))[0])
            rows.append((r["image_id"], r["z"], r["x"], r["y"], r["y_xyz"], h3, r["s2_cell"]))
            spot.append((r, rows[-1]))
    rows.sort()
    with open(os.path.join(OUT, "tile_keys.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["image_id", "z", "x", "y", "y_xyz", "h3_cell", "s2_cell"])
        w.writerows(rows)
    # deterministic 20-tile spot check: every len//20-th tile in sorted order
    spot.sort(key=lambda t: t[1])
    manifest = []
    step = max(1, len(spot) // 20)
    for r, key in spot[::step][:20]:
        png = codecs.encode_tile_png(r["rgba"])
        name = f"{key[0]}_{key[1]}_{key[2]}_{key[3]}.png"
        with open(os.path.join(OUT, "tiles", name), "wb") as f:
            f.write(png)
        manifest.append((name, hashlib.sha256(png).hexdigest()))
    with open(os.path.join(OUT, "manifest.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "sha256"])
        w.writerows(manifest)
    print(f"{len(rows)} keys, {len(manifest)} golden tiles -> {OUT}")


if __name__ == "__main__":
    main()
