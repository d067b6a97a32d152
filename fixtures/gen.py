"""Deterministic synthetic fixtures per FIXTURES.md — images + polygons.

Self-contained (NumPy + stdlib), seeded; the stand-in for the reference
tool's sample maps (reference checkout absent, SURVEY.md §0.1). Writes
parquet via pyarrow so tests/bench can `spark.read.parquet(...)`.

Scale points: sf-smoke N=100, sf-correct N=10_000, sf-bench N=1_000_000.
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tilers_tools_spark.functions import codecs, georef  # noqa: E402

SEED = georef.SEED
_U64 = np.uint64


def make_pixels(i: int, phash: int, w: int, h: int) -> np.ndarray:
    """Procedural RGB uint8 per FIXTURES.md §4 (3 lines of NumPy)."""
    col = np.arange(w, dtype=np.int64)[None, :]
    row = np.arange(h, dtype=np.int64)[:, None]
    # phash arrives as a signed int64 (parquet schema); mask to the unsigned
    # bit pattern before the uint64 array conversion (NumPy deprecation)
    b_seed = int(
        georef.splitmix64(np.array([phash & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64) ^ _U64(georef.TAG_PIX))[0]
    )
    r = (col * 3 + i) % 256
    g = (row * 5 + 2 * i) % 256
    b = ((col ^ row) + b_seed) % 256
    return np.dstack(np.broadcast_arrays(r, g, b)).astype(np.uint8)


def image_keys(n: int, seed: int = SEED) -> list[tuple[str, int]]:
    """(image_id, phash) pairs of gen_images(n, seed=seed) WITHOUT
    synthesizing pixel data — for consumers that only need the keys
    (e.g. the phash_near_dup oracle): ~1000x cheaper than gen_images."""
    idx = np.arange(n, dtype=np.uint64)
    phash = georef.splitmix64(_U64(seed) ^ idx)
    return [(f"img{i:08d}", int(np.int64(phash[i].astype(np.int64)))) for i in range(n)]


def gen_images(n: int, fmts=("raw", "png", "jpeg"), seed: int = SEED):
    """Yield dicts matching the binding schema (BASELINE.json:15)."""
    idx = np.arange(n, dtype=np.uint64)
    phash = georef.splitmix64(_U64(seed) ^ idx)
    w, h = georef.derive_size_np(phash)
    geo = georef.derive_georef_np(phash, w, h)
    for i in range(n):
        fmt = fmts[i % len(fmts)]
        pix = make_pixels(i, int(phash[i]), int(w[i]), int(h[i]))
        if fmt == "raw":
            data = codecs.encode_raw(pix)
        elif fmt == "png":
            data = codecs.encode_png(pix)
        elif fmt == "jpeg":
            from tilers_tools_spark.functions import jpegcodec

            data = jpegcodec.encode_jpeg(pix)
        else:
            raise ValueError(fmt)
        yield {
            "image_id": f"img{i:08d}",
            "bytes": data,
            "w": int(w[i]),
            "h": int(h[i]),
            "fmt": fmt,
            "caption": f"synthetic scene {i} lat={geo['lat_c'][i]:.4f} lon={geo['lon_c'][i]:.4f}",
            "phash": int(np.int64(phash[i].astype(np.int64))),
        }


IMAGES_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


def write_images_sharded(dir_path: str, n: int, n_shards: int = 64, fmts=("raw", "png", "jpeg"), seed: int = SEED):
    """Write the images fixture as a directory of n_shards parquet files so
    a Spark scan parallelizes WITHOUT a repartition shuffle (bytes never
    cross the wire — matters on bandwidth-limited boxes and mirrors how a
    100TB table is laid out as many files)."""
    os.makedirs(dir_path, exist_ok=True)
    writers = [
        pq.ParquetWriter(os.path.join(dir_path, f"part-{s:05d}.parquet"), IMAGES_SCHEMA)
        for s in range(n_shards)
    ]
    buf: list[list] = [[] for _ in range(n_shards)]
    try:
        for i, rec in enumerate(gen_images(n, fmts, seed)):
            s = i % n_shards
            buf[s].append(rec)
            if len(buf[s]) >= 256:
                writers[s].write_table(pa.Table.from_pylist(buf[s], IMAGES_SCHEMA))
                buf[s] = []
        for s in range(n_shards):
            if buf[s]:
                writers[s].write_table(pa.Table.from_pylist(buf[s], IMAGES_SCHEMA))
    finally:
        for w in writers:
            w.close()
    return dir_path


def write_images_parquet(path: str, n: int, fmts=("raw", "png", "jpeg"), seed: int = SEED, rows_per_group: int = 2000):
    rows = []
    writer = pq.ParquetWriter(path, IMAGES_SCHEMA)
    try:
        for rec in gen_images(n, fmts, seed):
            rows.append(rec)
            if len(rows) >= rows_per_group:
                writer.write_table(pa.Table.from_pylist(rows, IMAGES_SCHEMA))
                rows = []
        if rows:
            writer.write_table(pa.Table.from_pylist(rows, IMAGES_SCHEMA))
    finally:
        writer.close()
    return path


# ---------------------------------------------------------------------------
# polygons (FIXTURES.md §5)
# ---------------------------------------------------------------------------


def gen_polygons(n_poly: int = 64, seed: int = SEED):
    """Convex CCW rings on ellipses; last 8 centered on the HOT box."""
    polys = []
    for j in range(n_poly):
        # FIXTURES.md §5's symbolic `SEED ^ 0xP0 ^ j` key, with TAG_POLY=0xB000
        s = georef.splitmix64(np.asarray([seed ^ 0xB000 ^ j], dtype=np.uint64))
        k = int(5 + (int(s[0]) & 0xFFFF) % 6)
        s2 = georef.splitmix64(s)
        s3 = georef.splitmix64(s2)
        s4 = georef.splitmix64(s3)
        if j >= n_poly - 8:
            lon_c = georef.HOT_LON + (georef.u01(s2)[0] - 0.5) * 1.5
            lat_c = georef.HOT_LAT + (georef.u01(s3)[0] - 0.5) * 1.5
        else:
            lon_c = -180.0 + 360.0 * georef.u01(s2)[0]
            lat_c = -66.0 + 132.0 * georef.u01(s3)[0]
        r_lon = 0.5 + 2.5 * georef.u01(s4)[0]
        r_lat = 0.5 + 2.5 * georef.u01(georef.splitmix64(s4))[0]
        ang = 2.0 * math.pi * np.arange(k) / k
        ring = [
            {"lon": float(lon_c + r_lon * math.cos(a)), "lat": float(np.clip(lat_c + r_lat * math.sin(a), -84.0, 84.0))}
            for a in ang
        ]
        polys.append({"poly_id": f"poly{j:04d}", "ring": ring})
    return polys


POLY_SCHEMA = pa.schema(
    [
        ("poly_id", pa.string()),
        ("ring", pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))),
    ]
)


def write_polygons_parquet(path: str, n_poly: int = 64, seed: int = SEED):
    pq.write_table(pa.Table.from_pylist(gen_polygons(n_poly, seed), POLY_SCHEMA), path)
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--fmts", default="raw,png,jpeg")
    ap.add_argument("--polys", type=int, default=0)
    a = ap.parse_args()
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    if a.polys:
        write_polygons_parquet(a.out, a.polys)
    else:
        write_images_parquet(a.out, a.n, tuple(a.fmts.split(",")))
    print(a.out)
