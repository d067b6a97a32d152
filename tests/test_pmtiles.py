"""PMTiles v3 container (sources/pmtiles.py) — spec KATs + roundtrips.

Spec pinning strategy: tile-id addressing is pinned to HAND-DERIVED values
(the pyramid offset (4^z-1)/3 is closed-form; the order-1 Hilbert visit
order (0,0)->(0,1)->(1,1)->(1,0) is worked by hand from the published xy2d
loop below), directory serialization is pinned to handcrafted varint bytes
assembled byte-by-byte in the test, and the end-to-end paths (dedup,
run-length collapse, leaf directories, shards, lookup) are roundtripped
through Spark — so the writer and reader cannot share a hidden encoding
bug without also disagreeing with the literal bytes pinned here.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pytest

from tilers_tools_spark.sources import pmtiles as pm

# ---------------------------------------------------------------------------
# tile id addressing
# ---------------------------------------------------------------------------


def test_tileid_kat_hand_derived():
    # z=0: single tile, id 0
    assert int(pm.zxy_to_tileid_np(0, np.array([0]), np.array([0]))[0]) == 0
    # z=1 pyramid offset acc(1) = (4^1-1)/3 = 1; order-1 xy2d by hand:
    #   (0,0): rx=ry=0, d+=0            -> 0
    #   (0,1): rx=0 ry=1, d+=1*(0^1)=1  -> 1
    #   (1,1): rx=1 ry=1, d+=1*(3^1)=2  -> 2
    #   (1,0): rx=1 ry=0, d+=1*(3^0)=3  -> 3
    for (x, y), want in {(0, 0): 1, (0, 1): 2, (1, 1): 3, (1, 0): 4}.items():
        assert int(pm.zxy_to_tileid_np(1, np.array([x]), np.array([y]))[0]) == want
    # closed-form pyramid offsets: id of (z, 0, 0) is acc(z) because
    # xy2d(0,0) = 0 at every order
    for z, acc in ((2, 5), (3, 21), (4, 85), (5, 341)):
        assert int(pm.zxy_to_tileid_np(z, np.array([0]), np.array([0]))[0]) == acc


def test_tileid_roundtrip_and_range():
    rng = np.random.RandomState(7)
    for z in (0, 1, 3, 7, 12, 20):
        n = 1 << z
        xs = rng.randint(0, n, 25)
        ys = rng.randint(0, n, 25)
        for x, y, t in zip(xs, ys, pm.zxy_to_tileid_np(z, xs, ys)):
            assert pm.tileid_to_zxy(int(t)) == (z, int(x), int(y))
    with pytest.raises(ValueError):
        pm.zxy_to_tileid_np(28, np.array([0]), np.array([0]))
    with pytest.raises(ValueError):
        pm.tileid_to_zxy(-1)


# ---------------------------------------------------------------------------
# directory serialization — handcrafted bytes
# ---------------------------------------------------------------------------


def test_directory_bytes_kat():
    # entries (tileid, offset, length, run): second is contiguous with the
    # first (offset 100 = 0+100 -> encoded 0), third is a dedup
    # back-pointer to offset 0 (encoded 0+1=1), lengths/runs plain varints
    entries = [(5, 0, 100, 1), (6, 100, 200, 3), (42, 0, 100, 1)]
    data = pm.serialize_directory(entries)
    want = bytes(
        [3]                     # n_entries
        + [5, 1, 36]            # tileid deltas: 5, 6-5, 42-6
        + [1, 3, 1]             # run lengths
        + [100, 0xC8, 0x01, 100]  # lengths: 100, 200 (varint C8 01), 100
        + [1, 0, 1]             # offsets: 0+1, contiguous->0, 0+1
    )
    assert data == want
    assert pm.deserialize_directory(data) == entries


def test_varint_multibyte():
    buf = bytearray()
    pm._put_varint(buf, 0)
    pm._put_varint(buf, 127)
    pm._put_varint(buf, 128)
    pm._put_varint(buf, 300)
    assert bytes(buf) == bytes([0x00, 0x7F, 0x80, 0x01, 0xAC, 0x02])
    mv = memoryview(bytes(buf))
    vals, pos = [], 0
    for _ in range(4):
        v, pos = pm._get_varint(mv, pos)
        vals.append(v)
    assert vals == [0, 127, 128, 300]
    with pytest.raises(ValueError):
        pm._put_varint(bytearray(), -1)


def test_header_pack_parse_roundtrip():
    h = {
        "root_offset": 127, "root_length": 64,
        "metadata_offset": 191, "metadata_length": 22,
        "leaf_offset": 213, "leaf_length": 0,
        "data_offset": 213, "data_length": 4096,
        "addressed_tiles": 80, "tile_entries": 65, "tile_contents": 33,
        "clustered": True,
        "internal_compression": pm.COMPRESSION_GZIP,
        "tile_compression": pm.COMPRESSION_NONE,
        "tile_type": pm.TILETYPE["png"],
        "min_zoom": 2, "max_zoom": 3,
        "min_lon_e7": -1800000000, "min_lat_e7": -850511287,
        "max_lon_e7": 1800000000, "max_lat_e7": 850511287,
        "center_zoom": 2, "center_lon_e7": 0, "center_lat_e7": 123,
    }
    raw = pm._pack_header(h)
    assert len(raw) == pm.HEADER_LEN
    assert raw[:7] == b"PMTiles" and raw[7] == 3
    assert pm.parse_header(raw) == h
    with pytest.raises(ValueError):
        pm.parse_header(b"NotPMT!" + raw[7:])


# ---------------------------------------------------------------------------
# end-to-end through Spark
# ---------------------------------------------------------------------------


def _fixture_df(spark):
    # z=2 all-SEA (one 16-tile Hilbert run), z=3 checkerboard (dedup
    # without runs: consecutive Hilbert cells are 4-neighbors, so (x+y)
    # parity ALWAYS alternates along the curve)
    rows = []
    for z in (2, 3):
        n = 1 << z
        for x in range(n):
            for y in range(n):
                blob = (
                    b"SEA" if (z == 2 or (x + y) % 2 == 0)
                    else ("T%d/%d/%d" % (z, x, y)).encode()
                )
                rows.append((z, x, y, blob))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["z", "x", "y", "tile"]),
        "z long, x long, y long, tile binary",
    )
    return df, {(z, x, y): b for z, x, y, b in rows}


def test_roundtrip_dedup_runs_counters(spark, tmp_path):
    df, want = _fixture_df(spark)
    p = str(tmp_path / "t.pmtiles")
    pm.write_pmtiles(df, p, metadata={"name": "fix"})
    hdr, entries = pm.read_entries(p)
    assert hdr["addressed_tiles"] == 80
    # z=2's 16 consecutive SEA tiles collapse to ONE run entry (16 saved
    # minus the 1 survivor = 65); z=3 checkerboard cannot run
    assert hdr["tile_entries"] == 65
    assert any(r > 1 for _t, _o, _l, r in entries)
    # contents: 1 shared SEA blob + 32 distinct z=3 blobs
    assert hdr["tile_contents"] == 33
    assert hdr["clustered"] is True
    assert hdr["min_zoom"] == 2 and hdr["max_zoom"] == 3
    # full-world coverage at z=3 -> E7 bounds are the mercator world
    # (85.05112877980659 deg * 1e7 rounds half-up to ...288)
    assert hdr["min_lon_e7"] == -1800000000 and hdr["max_lon_e7"] == 1800000000
    assert hdr["min_lat_e7"] == -850511288 and hdr["max_lat_e7"] == 850511288
    back = pm.read_pmtiles(spark, p).toPandas()
    got = {(r.z, r.x, r.y): bytes(r.tile) for r in back.itertuples()}
    assert got == want
    assert pm.read_metadata(p) == {"name": "fix"}
    # deterministic bytes: same input twice -> identical archive
    p2 = str(tmp_path / "t2.pmtiles")
    pm.write_pmtiles(df, p2, metadata={"name": "fix"})
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_lookup_incl_run_interior_and_miss(spark, tmp_path):
    df, want = _fixture_df(spark)
    p = str(tmp_path / "t.pmtiles")
    pm.write_pmtiles(df, p)
    # run interior: any z=2 tile resolves to the single SEA entry
    for (x, y_tms) in ((0, 0), (1, 2), (3, 3)):
        y_xyz = (1 << 2) - 1 - y_tms
        assert pm.lookup_pmtiles(p, 2, x, y_xyz) == b"SEA"
    z, x, y_tms = 3, 5, 2
    y_xyz = (1 << z) - 1 - y_tms
    assert pm.lookup_pmtiles(p, z, x, y_xyz) == want[(z, x, y_tms)]
    assert pm.lookup_pmtiles(p, 5, 0, 0) is None  # zoom not present
    assert pm.lookup_pmtiles(p, 1, 0, 0) is None  # below min zoom


def test_leaf_directories(spark, tmp_path):
    df, want = _fixture_df(spark)
    p = str(tmp_path / "leaf.pmtiles")
    pm.write_pmtiles(df, p, max_root_entries=4, leaf_size=6)
    hdr, entries = pm.read_entries(p)
    assert hdr["leaf_length"] > 0
    assert len(entries) == 65  # leaf resolution reassembles the full list
    back = pm.read_pmtiles(spark, p).toPandas()
    assert {(r.z, r.x, r.y): bytes(r.tile) for r in back.itertuples()} == want
    y_xyz = (1 << 3) - 1 - 2
    assert pm.lookup_pmtiles(p, 3, 5, y_xyz) == want[(3, 5, 2)]
    assert pm.lookup_pmtiles(p, 2, 1, 1) == b"SEA"


def test_shards_disjoint_and_complete(spark, tmp_path):
    df, want = _fixture_df(spark)
    sd = str(tmp_path / "shards")
    pm.write_pmtiles_shards(df, sd, 3)
    shards = sorted(glob.glob(os.path.join(sd, "part-*.pmtiles")))
    assert len(shards) >= 2
    got = {}
    ranges = []
    for s in shards:
        hdr, entries = pm.read_entries(s)
        ids = [t for t, _o, _l, _r in entries]
        ranges.append((min(ids), max(ids)))
        for r in pm.read_pmtiles(spark, s).toPandas().itertuples():
            key = (r.z, r.x, r.y)
            assert key not in got  # disjoint
            got[key] = bytes(r.tile)
    assert got == want
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # clustered disjoint tileid ranges


def test_collision_resolution_and_empty(spark, tmp_path):
    dup = spark.createDataFrame(
        pd.DataFrame(
            [(1, 0, 0, b"aa"), (1, 0, 0, b"zz"), (1, 1, 1, b"bb")],
            columns=["z", "x", "y", "tile"],
        ),
        "z long, x long, y long, tile binary",
    )
    p = str(tmp_path / "dup.pmtiles")
    pm.write_pmtiles(dup, p)
    hdr, _ = pm.read_entries(p)
    assert hdr["addressed_tiles"] == 2  # collision resolved to one winner
    back = pm.read_pmtiles(spark, p).toPandas()
    winners = {(r.z, r.x, r.y): bytes(r.tile) for r in back.itertuples()}
    # deterministic max-md5 winner: md5('aa')=4124.. > md5('zz')=21ad.. is
    # a string compare on hex; just pin determinism across two writes
    p2 = str(tmp_path / "dup2.pmtiles")
    pm.write_pmtiles(dup, p2)
    assert open(p, "rb").read() == open(p2, "rb").read()
    assert winners[(1, 1, 1)] == b"bb"
    with pytest.raises(ValueError):
        pm.write_pmtiles(dup.filter("z = 99"), str(tmp_path / "e.pmtiles"))


def test_png_tile_type_sniffed(spark, tmp_path):
    from tilers_tools_spark.functions.codecs import encode_png

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    blob = encode_png(arr)
    df = spark.createDataFrame(
        pd.DataFrame([(0, 0, 0, blob)], columns=["z", "x", "y", "tile"]),
        "z long, x long, y long, tile binary",
    )
    p = str(tmp_path / "png.pmtiles")
    pm.write_pmtiles(df, p)
    hdr, _ = pm.read_entries(p)
    assert hdr["tile_type"] == pm.TILETYPE["png"]
    assert pm.lookup_pmtiles(p, 0, 0, 0) == blob
