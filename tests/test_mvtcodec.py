"""MVT 2.1 codec vs hand-worked spec examples + roundtrips.

The geometry KATs are the vector-tile-spec's OWN documented command
streams (section 4.3.5 examples), written down by hand here — they pin
the wire layout independently of the encoder/decoder twins.
"""

import struct

from tilers_tools_spark.functions import mvtcodec as mvt


def test_varint_zigzag_primitives():
    assert mvt._varint(0) == b"\x00"
    assert mvt._varint(1) == b"\x01"
    assert mvt._varint(300) == b"\xac\x02"  # protobuf docs example
    assert [mvt._zigzag(v) for v in (0, -1, 1, -2, 2147483647)] == [0, 1, 2, 3, 4294967294]
    for v in (0, 1, -1, 25, -17, 1 << 40, -(1 << 40)):
        assert mvt._unzigzag(mvt._zigzag(v)) == v
    # negative int64 varint is 10 bytes of two's complement
    assert len(mvt._varint(-1)) == 10


def test_spec_point_kat():
    """Spec 4.3.5.1: a point at (25, 17) encodes to [9, 50, 34]."""
    assert mvt.point_geometry([(25, 17)]) == [9, 50, 34]


def test_spec_multipoint_kat():
    """Spec 4.3.5.2: points (5,7) and (3,2) -> [17, 10, 14, 3, 9]."""
    assert mvt.point_geometry([(5, 7), (3, 2)]) == [17, 10, 14, 3, 9]


def test_spec_polygon_kat():
    """Spec 4.3.5.4: polygon (3,6) (8,12) (20,34) ->
    [9, 6, 12, 18, 10, 12, 24, 44, 15] (MoveTo, LineTo x2, ClosePath)."""
    cmds = mvt.polygon_geometry([[(3, 6), (8, 12), (20, 34)]])
    assert cmds == [9, 6, 12, 18, 10, 12, 24, 44, 15]


def test_winding_enforced():
    """The spec triangle has +area (exterior); its reverse must be
    re-reversed by the encoder; a hole keeps negative area."""
    tri = [(3, 6), (8, 12), (20, 34)]
    assert mvt.signed_area2(tri) == 38
    assert mvt.polygon_geometry([tri[::-1]]) == mvt.polygon_geometry([tri])
    # square with a hole: outer +, inner -
    outer = [(0, 0), (10, 0), (10, 10), (0, 10)]
    hole = [(2, 2), (2, 4), (4, 4), (4, 2)]
    cmds = mvt.polygon_geometry([outer, hole])
    paths = mvt.decode_geometry(cmds)
    assert mvt.signed_area2(paths[0]) > 0 and mvt.signed_area2(paths[1]) < 0
    assert set(paths[1]) == set(hole)


def test_cursor_carries_across_rings():
    """Deltas are relative to the last vertex of the previous ring."""
    r1 = [(0, 0), (4, 0), (4, 4)]
    r2 = [(100, 100), (104, 100), (104, 104)]
    cmds = mvt.polygon_geometry([r1]) + []
    two = mvt.polygon_geometry([r1, r2[::-1]])  # second forced interior
    paths = mvt.decode_geometry(two)
    assert paths[0][0] == (0, 0) and set(paths[1]) == set(r2)
    assert len(two) > len(cmds)


def test_tile_roundtrip_with_props():
    feats = [
        {
            "id": 7,
            "type": mvt.GEOM_POLYGON,
            "geometry": mvt.polygon_geometry([[(3, 6), (8, 12), (20, 34)]]),
            "props": {"name": "tri", "rank": 3, "score": 0.5, "ok": True},
        },
        {
            "id": 8,
            "type": mvt.GEOM_POINT,
            "geometry": mvt.point_geometry([(25, 17)]),
            "props": {"name": "pt"},
        },
    ]
    blob = mvt.encode_mvt({"demo": (feats, 4096)})
    out = mvt.decode_mvt(blob)
    layer = out["demo"]
    assert layer["version"] == 2 and layer["extent"] == 4096
    f0, f1 = layer["features"]
    assert f0["id"] == 7 and f0["type"] == mvt.GEOM_POLYGON
    assert f0["props"] == {"name": "tri", "rank": 3, "score": 0.5, "ok": True}
    assert f0["paths"] == [[(3, 6), (8, 12), (20, 34)]]
    assert f1["props"] == {"name": "pt"} and f1["paths"] == [[(25, 17)]]
    # keys/values interning: 'name' appears once in the key table
    # (structural check via a second encode being byte-identical)
    assert mvt.encode_mvt({"demo": (feats, 4096)}) == blob


def test_value_wire_layouts():
    """Value one-ofs: string field 1, double field 3 little-endian,
    int64 field 4 varint, bool field 7."""
    assert mvt._encode_value("ab") == b"\x0a\x02ab"
    assert mvt._encode_value(True) == b"\x38\x01"
    assert mvt._encode_value(5) == b"\x20\x05"
    assert mvt._encode_value(1.5) == b"\x19" + struct.pack("<d", 1.5)
    for v in ("x", -3, 2.25, False):
        assert mvt._decode_value(mvt._encode_value(v)) == v


def test_spec_linestring_kat():
    """Spec 4.3.5.3: linestring (2,2) (2,10) (10,10) ->
    [9, 4, 4, 18, 0, 16, 16, 0]."""
    assert mvt.line_geometry([[(2, 2), (2, 10), (10, 10)]]) == [9, 4, 4, 18, 0, 16, 16, 0]
    # multi-linestring roundtrip, cursor carried across paths
    paths = [[(0, 0), (5, 0)], [(9, 9), (9, 12), (12, 12)]]
    assert mvt.decode_geometry(mvt.line_geometry(paths)) == paths
