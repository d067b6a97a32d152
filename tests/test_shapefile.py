"""ESRI Shapefile container (sources/shapefile.py) — handcrafted spec
bytes + roundtrips + the distributed Spark read.

Independence strategy: the reader is pinned against a .shp/.shx/.dbf
triplet ASSEMBLED BYTE-BY-BYTE in this file with every offset taken from
the public whitepaper (mixed BE headers / LE content is where symmetric
writer+reader bugs would hide), so the oracle gate's write->read pairing
cannot cancel a shared layout error.
"""

from __future__ import annotations

import struct

import pytest

from tilers_tools_spark.sources import shapefile as shpf

# ---------------------------------------------------------------------------
# handcrafted bytes (the independent pin)
# ---------------------------------------------------------------------------


def _hand_shp_polygon() -> bytes:
    """One polygon record: outer CW square (0,0)-(0,2)-(2,2)-(2,0) —
    spec layout written out literally:

      main header (100 B): >i 9994 | 20 zero bytes | >i file_len_words |
        <i 1000 | <i 5 | <4d bbox | <4d z/m ranges (zeros)
      record header (8 B): >i rec#1 | >i content_len_words
      content: <i 5 | <4d bbox | <i numparts=1 | <i numpoints=5 |
        <i part0_start=0 | <10d points
    """
    pts = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]  # CW
    content = struct.pack("<i", 5)
    content += struct.pack("<4d", 0.0, 0.0, 2.0, 2.0)
    content += struct.pack("<2i", 1, 5)
    content += struct.pack("<i", 0)
    for x, y in pts:
        content += struct.pack("<2d", x, y)
    assert len(content) == 4 + 32 + 8 + 4 + 80  # 128 bytes = 64 words
    rec = struct.pack(">2i", 1, len(content) // 2) + content
    total = 100 + len(rec)
    hdr = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", total // 2)
    hdr += struct.pack("<2i", 1000, 5)
    hdr += struct.pack("<4d", 0.0, 0.0, 2.0, 2.0)
    hdr += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    assert len(hdr) == 100
    return hdr + rec


def test_parse_shp_handcrafted_polygon():
    hdr, recs = shpf.parse_shp(_hand_shp_polygon())
    assert hdr["shape_type"] == 5
    assert hdr["bbox"] == (0.0, 0.0, 2.0, 2.0)
    (fid, kind, has_z, parts) = recs[0]
    assert (fid, kind, has_z) == (1, "polygon", False)
    assert parts == [[(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]]
    assert not shpf.ring_is_hole(parts[0])  # CW = outer per spec


def test_parse_shx_handcrafted():
    # header + two index records: offsets 50/120 words, lengths 64/10 words
    data = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", (100 + 16) // 2)
    data += struct.pack("<2i", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    data += struct.pack(">2i", 50, 64) + struct.pack(">2i", 120, 10)
    assert shpf.parse_shx(data) == [(1, 100, 128), (2, 240, 20)]
    with pytest.raises(ValueError):
        shpf.parse_shx(b"\x00" * 100)


def test_parse_dbf_handcrafted():
    """dBase III bytes by hand: version 0x03, 2 records (one deleted),
    fields NAME C(6) and CAT N(4)."""
    hdr_size = 32 + 32 * 2 + 1
    rec_size = 1 + 6 + 4
    d = struct.pack("<B3BIHH", 0x03, 99, 1, 1, 2, hdr_size, rec_size) + b"\x00" * 20
    d += b"NAME".ljust(11, b"\x00") + b"C" + b"\x00" * 4 + bytes([6, 0]) + b"\x00" * 14
    d += b"CAT".ljust(11, b"\x00") + b"N" + b"\x00" * 4 + bytes([4, 0]) + b"\x00" * 14
    d += b"\x0d"
    d += b" " + b"alpha " + b"  42"
    d += b"*" + b"dead  " + b"   9"  # deleted -> skipped
    d += b"\x1a"
    fields, rows = shpf.parse_dbf(d)
    assert [f[:2] for f in fields] == [("NAME", "C"), ("CAT", "N")]
    assert rows == [{"NAME": "alpha", "CAT": 42}]
    with pytest.raises(ValueError):
        shpf.parse_dbf(b"\x05" + d[1:])


def test_point_z_variant_xy_extracted():
    """PointZ (type 11): x, y, z, m doubles — XY extracted, has_z set."""
    content = struct.pack("<i4d", 11, 3.0, 4.0, 99.0, 0.0)
    kind, has_z, parts = shpf._parse_record_content(content)
    assert (kind, has_z) == ("point", True)
    assert parts == [[(3.0, 4.0)]]


def test_unsupported_type_raises():
    with pytest.raises(NotImplementedError):
        shpf._parse_record_content(struct.pack("<i", 31))  # MultiPatch
    with pytest.raises(ValueError):
        shpf.parse_shp(struct.pack(">i", 1234) + b"\x00" * 96)


# ---------------------------------------------------------------------------
# write -> parse roundtrips
# ---------------------------------------------------------------------------


def test_roundtrip_all_kinds():
    sq = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]
    parts = shpf.ensure_orientation([sq, hole])
    assert not shpf.ring_is_hole(parts[0]) and shpf.ring_is_hole(parts[1])
    for kind, recs in (
        ("polygon", [parts]),
        ("point", [[[(1.5, -2.5)]], [[(0.0, 0.0)]]]),
        ("polyline", [[[(0.0, 0.0), (1.0, 1.0)], [(2.0, 2.0), (3.0, 3.0), (4.0, 4.0)]]]),
        ("multipoint", [[[(0.0, 1.0), (2.0, 3.0)]]]),
    ):
        shp, shx = shpf.write_shp(recs, kind)
        hdr, back = shpf.parse_shp(shp)
        assert [r[3] for r in back] == recs
        assert [r[0] for r in back] == list(range(1, len(recs) + 1))
        spans = shpf.parse_shx(shx)
        # spans point at record headers; re-slice the .shp through them
        for (fid, off, ln), rec in zip(spans, back):
            k2, _z, p2 = shpf._parse_record_content(shp[off + 8:off + 8 + ln])
            assert p2 == rec[3]
    with pytest.raises(ValueError):
        shpf.write_shp([], "point")


def test_dbf_roundtrip_types():
    fields = [("NAME", "C", 12, 0), ("CAT", "N", 6, 0), ("SCORE", "N", 10, 3),
              ("OK", "L", 1, 0)]
    rows = [
        {"NAME": "poly-0", "CAT": 4, "SCORE": 0.125, "OK": True},
        {"NAME": "x", "CAT": None, "SCORE": None, "OK": False},
    ]
    f2, r2 = shpf.parse_dbf(shpf.write_dbf(fields, rows))
    assert [tuple(f[:4]) for f in f2] == fields
    assert r2 == rows
    with pytest.raises(ValueError):
        shpf.write_dbf([("NAME", "C", 2, 0)], [{"NAME": "too-long"}])


# ---------------------------------------------------------------------------
# Spark read path
# ---------------------------------------------------------------------------


def _write_fixture(tmp_path):
    recs, rows = [], []
    for k in range(6):
        cx, cy = float(k * 10), float(k * 5)
        sq = [(cx, cy), (cx, cy + 2), (cx + 2, cy + 2), (cx + 2, cy), (cx, cy)]
        parts = [sq]
        if k == 2:
            parts.append([(cx + 0.5, cy + 0.5), (cx + 1.5, cy + 0.5),
                          (cx + 1.5, cy + 1.5), (cx + 0.5, cy + 1.5),
                          (cx + 0.5, cy + 0.5)])
        recs.append(shpf.ensure_orientation(parts))
        rows.append({"NAME": f"f{k}", "CAT": k % 3})
    return shpf.write_shapefile(
        str(tmp_path / "fix"), "polygon", recs,
        fields=[("NAME", "C", 8, 0), ("CAT", "N", 4, 0)], rows=rows,
    )


def test_read_shapefile_spark(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = shpf.read_shapefile(spark, path).toPandas().sort_values(["fid", "part"])
    assert len(df) == 7  # 6 outers + 1 hole
    assert set(df.columns) >= {"fid", "shape", "part", "is_hole", "ring", "NAME", "CAT"}
    hole = df[(df.fid == 3) & (df.part == 1)].iloc[0]
    assert bool(hole.is_hole)
    assert hole.NAME == "f2" and hole.CAT == 2
    r0 = df[(df.fid == 1) & (df.part == 0)].iloc[0]
    assert [(p["lon"], p["lat"]) for p in r0.ring][0] == (0.0, 0.0)
    # .shx is required for the distributed read
    import os

    os.remove(str(tmp_path / "fix.shx"))
    with pytest.raises(FileNotFoundError):
        shpf.read_shapefile(spark, path)


def test_shapefile_polygons_into_pip_join(spark, tmp_path):
    """End-to-end: shapefile polygons -> pip_join finds the planted
    points, including the even-odd hole exclusion."""
    from tilers_tools_spark.operators.spatial import pip_join

    path = _write_fixture(tmp_path)
    polys = shpf.shapefile_polygons_df(spark, path)
    pts = spark.createDataFrame(
        [
            (1, 1.0, 1.0),    # inside fid 1 (k=0 square at 0..2)
            (2, 21.0, 11.0),  # inside fid 3 (k=2) but in its HOLE -> excluded
            (3, 20.2, 10.2),  # inside fid 3 outside the hole
            (4, 99.0, 99.0),  # nowhere
        ],
        "pt_id long, lon double, lat double",
    )
    got = {
        (r["pt_id"], r["poly_id"])
        for r in pip_join(pts, polys).select("pt_id", "poly_id").collect()
    }
    assert got == {(1, "1"), (3, "3")}
