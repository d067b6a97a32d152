"""WKB/EWKB codec + GeoParquet ingest (sources/geoparquet.py).

The parser is pinned against HANDCRAFTED spec bytes assembled hex-digit
by hex-digit from OGC 06-103r4 §8 and the PostGIS EWKB convention —
independent of the module's own writer — so the symmetric write→read
pairing used by the oracle gate cannot hide a shared layout bug.
"""

import struct

import pytest

from tilers_tools_spark.sources import geoparquet as gp


def f64le(x):
    return struct.pack("<d", x).hex()


def f64be(x):
    return struct.pack(">d", x).hex()


# --- handcrafted spec-byte KATs (independent of write_wkb) -------------------


def test_point_ndr_canonical():
    # the canonical POINT(1 2) NDR example: 01 01000000 + two LE doubles
    buf = bytes.fromhex("0101000000" + "000000000000f03f" + "0000000000000040")
    comps, srid = gp.parse_wkb(buf)
    assert srid is None
    assert comps == [("point", False, False, [(1.0, 2.0)])]


def test_point_xdr():
    # 00 00000001 + two BE doubles — XDR byte order
    buf = bytes.fromhex("0000000001" + "3ff0000000000000" + "4000000000000000")
    comps, srid = gp.parse_wkb(buf)
    assert comps == [("point", False, False, [(1.0, 2.0)])]
    assert srid is None


def test_point_ewkb_srid_4326():
    # PostGIS EWKB: type 0x20000001 LE = 01000020, SRID 4326 LE = e6100000
    buf = bytes.fromhex("01" + "01000020" + "e6100000" + f64le(-71.064) + f64le(42.28))
    comps, srid = gp.parse_wkb(buf)
    assert srid == 4326
    assert comps == [("point", False, False, [(-71.064, 42.28)])]


def test_point_iso_z():
    # ISO Z point: type 1001 LE = e9030000; Z ordinate parsed past
    buf = bytes.fromhex("01" + "e9030000" + f64le(3.0) + f64le(4.0) + f64le(9.5))
    comps, srid = gp.parse_wkb(buf)
    assert comps == [("point", True, False, [(3.0, 4.0)])]


def test_point_ewkb_z_flag():
    # EWKB Z flag 0x80000001 LE = 01000080 (no SRID)
    buf = bytes.fromhex("01" + "01000080" + f64le(3.0) + f64le(4.0) + f64le(9.5))
    comps, _ = gp.parse_wkb(buf)
    assert comps == [("point", True, False, [(3.0, 4.0)])]


def test_point_iso_zm():
    # ISO ZM point: type 3001 LE = b90b0000; Z and M parsed past
    buf = bytes.fromhex("01" + "b90b0000"
                        + f64le(1.0) + f64le(2.0) + f64le(3.0) + f64le(4.0))
    comps, _ = gp.parse_wkb(buf)
    assert comps == [("point", True, False, [(1.0, 2.0)])]


def test_linestring_ndr():
    buf = bytes.fromhex("01" + "02000000" + "03000000"
                        + f64le(0) + f64le(0) + f64le(1) + f64le(0)
                        + f64le(1) + f64le(1))
    comps, _ = gp.parse_wkb(buf)
    assert comps == [("linestring", False, False, [(0, 0), (1, 0), (1, 1)])]


def test_polygon_with_hole_ring_roles():
    # type 3, 2 rings: ring 0 outer (is_hole False), ring 1 hole (True)
    outer = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    hole = [(1, 1), (1, 2), (2, 2), (2, 1), (1, 1)]
    hx = "01" + "03000000" + "02000000" + "05000000"
    for x, y in outer:
        hx += f64le(x) + f64le(y)
    hx += "05000000"
    for x, y in hole:
        hx += f64le(x) + f64le(y)
    comps, _ = gp.parse_wkb(bytes.fromhex(hx))
    assert [(k, h) for k, _z, h, _r in comps] == [("polygon", False), ("polygon", True)]
    assert comps[0][3] == [(float(x), float(y)) for x, y in outer]
    assert comps[1][3] == [(float(x), float(y)) for x, y in hole]


def test_multipoint_nested_headers_collapse():
    # each member point repeats its OWN full header per the spec
    hx = ("01" + "04000000" + "02000000"
          + "0101000000" + f64le(10) + f64le(20)
          + "0101000000" + f64le(30) + f64le(40))
    comps, _ = gp.parse_wkb(bytes.fromhex(hx))
    assert comps == [("multipoint", False, False, [(10.0, 20.0), (30.0, 40.0)])]


def test_multipolygon_two_members_mixed_endian():
    # member 1 NDR, member 2 XDR — nested byte orders are independent
    sq1 = [(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]
    sq2 = [(5, 5), (6, 5), (6, 6), (5, 6), (5, 5)]
    hx = "01" + "06000000" + "02000000"
    hx += "01" + "03000000" + "01000000" + "05000000"
    for x, y in sq1:
        hx += f64le(x) + f64le(y)
    hx += "00" + "00000003" + "00000001" + "00000005"
    for x, y in sq2:
        hx += f64be(x) + f64be(y)
    comps, _ = gp.parse_wkb(bytes.fromhex(hx))
    assert [c[0] for c in comps] == ["multipolygon", "multipolygon"]
    assert [c[2] for c in comps] == [False, False]
    assert comps[0][3][0] == (0.0, 0.0) and comps[1][3][0] == (5.0, 5.0)


def test_geometrycollection_members_keep_kinds():
    hx = ("01" + "07000000" + "02000000"
          + "0101000000" + f64le(1) + f64le(2)
          + "01" + "02000000" + "02000000"
          + f64le(0) + f64le(0) + f64le(9) + f64le(9))
    comps, _ = gp.parse_wkb(bytes.fromhex(hx))
    assert [c[0] for c in comps] == ["point", "linestring"]


def test_errors_fail_loudly():
    with pytest.raises(ValueError, match="byte-order"):
        gp.parse_wkb(bytes.fromhex("0201000000") + b"\x00" * 16)
    with pytest.raises(ValueError, match="unknown geometry type"):
        gp.parse_wkb(bytes.fromhex("01" + "63000000"))
    with pytest.raises(ValueError, match="trailing"):
        gp.parse_wkb(bytes.fromhex("0101000000" + f64le(1) + f64le(2)) + b"\x00")


# --- writer roundtrips -------------------------------------------------------


@pytest.mark.parametrize("bo", ["<", ">"])
@pytest.mark.parametrize("srid", [None, 3857])
@pytest.mark.parametrize("has_z", [False, True])
def test_roundtrip_all_kinds(bo, srid, has_z):
    sq = [(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]
    hole = [(0.5, 0.5), (0.5, 1.0), (1.0, 1.0), (1.0, 0.5), (0.5, 0.5)]
    cases = [
        ("point", [[(3.5, -7.25)]]),
        ("linestring", [[(0, 0), (1, 2), (3, 1)]]),
        ("polygon", [sq, hole]),
        ("multipoint", [[(1, 1), (2, 2), (3, 3)]]),
        ("multilinestring", [[(0, 0), (1, 1)], [(5, 5), (6, 7)]]),
        ("multipolygon", [[sq], [[(x + 10, y) for x, y in sq], [(x + 10, y) for x, y in hole]]]),
    ]
    for kind, parts in cases:
        buf = gp.write_wkb(kind, parts, has_z=has_z, z=1.5, srid=srid, byteorder=bo)
        comps, got_srid = gp.parse_wkb(buf)
        assert got_srid == srid
        assert all(c[0] == kind for c in comps)
        assert all(c[1] == has_z for c in comps)
        flat = [c[3] for c in comps]
        if kind in ("polygon",):
            expect = [[(float(x), float(y)) for x, y in r] for r in parts]
            assert flat == expect
            assert [c[2] for c in comps] == [False, True]
        elif kind == "multipolygon":
            rings = [r for poly in parts for r in poly]
            assert flat == [[(float(x), float(y)) for x, y in r] for r in rings]
            assert [c[2] for c in comps] == [False, False, True]
        else:
            assert flat == [[(float(x), float(y)) for x, y in r] for r in parts]


# --- Spark: decode operator, polygon contract, GeoParquet footer -------------


def test_wkb_geometries_and_pip(spark):
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators.spatial import pip_join

    sq = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0)]
    hole = [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0), (1.0, 1.0)]
    far = [[(x + 20.0, y) for x, y in sq]]
    rows = [
        (1, gp.write_wkb("polygon", [sq, hole], srid=4326)),
        (2, gp.write_wkb("multipolygon", [[sq], far], byteorder=">")),
        (3, gp.write_wkb("point", [[(50.0, 50.0)]])),
    ]
    df = spark.createDataFrame(rows, "geom_id long, geometry binary")
    geo = gp.wkb_geometries(df).toPandas().sort_values(["geom_id", "part"])
    assert list(geo["kind"]) == ["polygon", "polygon", "multipolygon",
                                 "multipolygon", "point"]
    assert list(geo["is_hole"]) == [False, True, False, False, False]
    assert geo[geo.geom_id == 1]["srid"].iloc[0] == 4326

    polys = gp.wkb_polygons_df(df)
    pts = spark.createDataFrame(
        [(10, 0.5, 0.5), (11, 1.5, 1.5), (12, 21.0, 1.0), (13, 50.0, 50.0)],
        "pt_id long, lon double, lat double",
    )
    got = {
        (r["pt_id"], r["poly_id"])
        for r in pip_join(pts, polys).select("pt_id", "poly_id").collect()
    }
    # (10) in poly1 outer and poly2 first member; (11) in poly1's HOLE ->
    # excluded from 1 but inside poly2 (no hole there); (12) only in poly2's
    # far member; (13) nowhere (the point geometry is not a polygon)
    assert got == {(10, "1"), (10, "2"), (11, "2"), (12, "2")}


def test_read_geoparquet_footer(spark, tmp_path):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    buf1 = gp.write_wkb("point", [[(1.0, 2.0)]])
    buf2 = gp.write_wkb("polygon", [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]])
    table = pa.table({"geom_id": [1, 2], "geom": [buf1, buf2]})
    geo_meta = {
        "version": "1.0.0",
        "primary_column": "geom",
        "columns": {"geom": {"encoding": "WKB", "geometry_types": []}},
    }
    table = table.replace_schema_metadata({b"geo": json.dumps(geo_meta).encode()})
    path = str(tmp_path / "gate.parquet")
    pq.write_table(table, path)

    out = gp.read_geoparquet(spark, path).toPandas().sort_values("geom_id")
    assert list(out["kind"]) == ["point", "polygon"]

    bad = {**geo_meta, "columns": {"geom": {"encoding": "point"}}}
    table2 = table.replace_schema_metadata({b"geo": json.dumps(bad).encode()})
    path2 = str(tmp_path / "bad.parquet")
    pq.write_table(table2, path2)
    with pytest.raises(NotImplementedError, match="encoding"):
        gp.read_geoparquet(spark, path2)
