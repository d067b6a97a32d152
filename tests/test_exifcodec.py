"""Exif 2.3 parser/builder (functions/exifcodec.py) + the exif_metadata
operator. The layout anchor is the HAND-ASSEMBLED byte KAT below: every
offset in it was computed on paper from the TIFF 6.0 / Exif 2.3 layout
rules (12-byte entries, inline-if-<=4-bytes, out-of-line value areas),
so the parser is pinned to the published wire format independently of
the repo's own builder. The builder is then checked as parse∘build ==
identity in both byte orders, and an APP1 inserted into a real JPEG from
the engine's own encoder must leave pixel decode byte-identical."""

import struct

import numpy as np
import pytest

from tilers_tools_spark.functions import exifcodec as ec
from tilers_tools_spark.functions import jpegcodec


def _handmade_app1() -> bytes:
    """Big-endian Exif: IFD0 {Orientation=6, GPS-IFD ptr -> 38}; GPS IFD
    {N 40 deg 26 min 46.20 sec, W 79 deg 58 min 56.40 sec}. Offsets by
    hand: IFD0 block 8..37 (2 entries), GPS IFD 38..91 (4 entries), lat
    rationals at 92, lon rationals at 116; TIFF total 140 bytes."""
    tiff = bytes.fromhex(
        "4d4d002a00000008"  # MM, magic 42, IFD0 @ 8
        "0002"  # IFD0: 2 entries
        "0112000300000001" "00060000"  # Orientation SHORT 1 = 6 (inline)
        "8825000400000001" "00000026"  # GPS IFD pointer LONG = 38
        "00000000"  # next IFD: none
        "0004"  # GPS IFD: 4 entries
        "0001000200000002" "4e000000"  # GPSLatitudeRef ASCII "N\0" inline
        "0002000500000003" "0000005c"  # GPSLatitude 3 RATIONAL @ 92
        "0003000200000002" "57000000"  # GPSLongitudeRef ASCII "W\0"
        "0004000500000003" "00000074"  # GPSLongitude 3 RATIONAL @ 116
        "00000000"  # next IFD: none
        # lat @ 92: 40/1, 26/1, 4620/100
        "0000002800000001" "0000001a00000001" "0000120c00000064"
        # lon @ 116: 79/1, 58/1, 5640/100
        "0000004f00000001" "0000003a00000001" "0000160800000064"
    )
    assert len(tiff) == 140
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def test_handmade_kat():
    jpeg = b"\xff\xd8" + _handmade_app1() + b"\xff\xd9"
    r = ec.parse_exif(jpeg)
    assert r["orientation"] == 6
    assert r["lat"] == 40 + 26 / 60.0 + (4620 / 100) / 3600.0
    assert r["lon"] == -(79 + 58 / 60.0 + (5640 / 100) / 3600.0)
    assert r["make"] is None and r["alt"] is None and r["dt_original"] is None


@pytest.mark.parametrize("bo", ["<", ">"])
def test_roundtrip(bo):
    neg, lat_dms = ec.dms_of(37.7749)
    negl, lon_dms = ec.dms_of(-122.4194)
    app1 = ec.build_exif_app1(
        byteorder=bo,
        orientation=8,
        make="ACME",
        model="Cam 9000",
        dt_original="2024:05:01 12:34:56",
        px=(640, 480),
        gps={
            "lat_ref": "S" if neg else "N",
            "lat_dms": lat_dms,
            "lon_ref": "W" if negl else "E",
            "lon_dms": lon_dms,
            "alt": ((12345, 100), 1),
        },
    )
    r = ec.parse_exif(b"\xff\xd8" + app1 + b"\xff\xd9")
    assert (r["orientation"], r["make"], r["model"]) == (8, "ACME", "Cam 9000")
    assert (r["px_w"], r["px_h"], r["dt_original"]) == (640, 480, "2024:05:01 12:34:56")
    # dms_of is exact on the milli-second grid; both coords sit on it
    assert r["lat"] == 37 + 46 / 60.0 + (29640 / 1000) / 3600.0
    assert abs(r["lat"] - 37.7749) < 1e-9 and abs(r["lon"] + 122.4194) < 1e-9
    assert r["alt"] == -123.45  # AltitudeRef 1 = below sea level


def test_insert_preserves_pixel_decode():
    rgb = ((np.arange(16 * 16 * 3).reshape(16, 16, 3) * 5 + 11) % 256).astype(np.uint8)
    jpeg = jpegcodec.encode_jpeg(rgb, quality=85)
    app1 = ec.build_exif_app1(orientation=3, gps=None, make="X")
    tagged = ec.insert_app1(jpeg, app1)
    assert np.array_equal(jpegcodec.decode_jpeg(tagged), jpegcodec.decode_jpeg(jpeg))
    r = ec.parse_exif(tagged)
    assert r["orientation"] == 3 and r["make"] == "X" and r["lat"] is None


def test_absence_vs_corruption():
    # JPEG without Exif: valid, all-None record
    assert ec.parse_exif(b"\xff\xd8\xff\xd9") == ec._EMPTY
    # bare TIFF blob: parsed directly (Exif-in-TIFF)
    tiff = ec.build_exif_app1(orientation=5)[4 + 6 :]
    assert ec.parse_exif(tiff)["orientation"] == 5
    # non-image blob: loud
    with pytest.raises(ValueError):
        ec.parse_exif(b"garbage-blob")
    # structurally corrupt Exif payload: loud
    good = ec.build_exif_app1(orientation=1)
    cut = good[4 + 6 :][:10]
    bad = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(cut)) + b"Exif\x00\x00" + cut
    with pytest.raises(ValueError):
        ec.parse_exif(b"\xff\xd8" + bad + b"\xff\xd9")
    # BigTIFF magic inside an APP1: Exif mandates classic -> loud
    bigt = b"II" + struct.pack("<HI", 43, 8)
    app = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(bigt)) + b"Exif\x00\x00" + bigt
    with pytest.raises(ValueError):
        ec.parse_exif(b"\xff\xd8" + app + b"\xff\xd9")


def test_dms_of_grid_exactness():
    for dec in (0.0, 12.3456789, -89.999999, 0.0005, -0.0005):
        neg, dms = ec.dms_of(dec)
        back = dms[0][0] / dms[0][1] + (dms[1][0] / dms[1][1]) / 60.0 + (
            dms[2][0] / dms[2][1]
        ) / 3600.0
        got = -back if neg else back
        assert abs(got - dec) <= 0.5 / 3600000 + 1e-12
        assert 0 <= dms[1][0] < 60 and 0 <= dms[2][0] < 60000


def test_exif_metadata_operator(spark):
    from tilers_tools_spark.operators import multimodal

    app_ok = ec.build_exif_app1(
        orientation=6,
        gps={
            "lat_ref": "N",
            "lat_dms": [(40, 1), (26, 1), (4620, 100)],
            "lon_ref": "W",
            "lon_dms": [(79, 1), (58, 1), (5640, 100)],
        },
    )
    cut = app_ok[4 + 6 :][:10]
    app_bad = b"\xff\xe1" + struct.pack(">H", 2 + 6 + len(cut)) + b"Exif\x00\x00" + cut
    rows = [
        ("a", b"\xff\xd8" + app_ok + b"\xff\xd9"),
        ("b", b"\xff\xd8\xff\xd9"),
        ("c", b"\xff\xd8" + app_bad + b"\xff\xd9"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    out = {r["image_id"]: r.asDict() for r in multimodal.exif_metadata(df).collect()}
    assert out["a"]["exif_ok"] and out["a"]["orientation"] == 6
    assert out["a"]["lat"] == 40 + 26 / 60.0 + (4620 / 100) / 3600.0
    assert out["b"]["exif_ok"] and out["b"]["lat"] is None  # absent Exif is valid
    assert not out["c"]["exif_ok"] and out["c"]["orientation"] is None  # corrupt is flagged
