"""SRTM .hgt codec (functions/hgt.py): handcrafted-bytes KAT (decode
pinned against hand-assembled big-endian int16 bytes, independent of the
encoder), roundtrips, filename georef, and the loud rejects. The UDF
path is gated end-to-end by the hgt_ingest driver query."""

import struct

import numpy as np
import pytest

from tilers_tools_spark.functions import hgt


def test_decode_handcrafted_kat():
    # 2x2 synthetic grid assembled by hand: big-endian int16, row 0 is
    # the NORTH edge; -32768 is void -> NaN
    blob = struct.pack(">4h", 100, -5, -32768, 32767)
    arr = hgt.decode_hgt(blob, any_square=True)
    exp = np.array([[100.0, -5.0], [np.nan, 32767.0]])
    assert np.array_equal(arr, exp, equal_nan=True)
    # byte-level sanity: the first sample really is big-endian
    assert blob[:2] == b"\x00\x64"


def test_published_size_gate_and_roundtrip():
    rng = np.random.default_rng(3)
    a = np.round(rng.uniform(-500, 4000, (1201, 1201)))
    a[7, 9] = np.nan
    blob = hgt.encode_hgt(a)
    assert len(blob) == 1201 * 1201 * 2
    back = hgt.decode_hgt(blob)  # strict: 1201 is a published size
    assert np.array_equal(back, a, equal_nan=True)
    # non-published square sizes need the explicit synthetic opt-out
    small = hgt.encode_hgt(np.zeros((4, 4)))
    with pytest.raises(ValueError, match="published SRTM size"):
        hgt.decode_hgt(small)
    assert hgt.decode_hgt(small, any_square=True).shape == (4, 4)


def test_name_parse_and_georef():
    assert hgt.parse_hgt_name("N34W119.hgt") == (34, -119)
    assert hgt.parse_hgt_name("s02e010.HGT") == (-2, 10)
    assert hgt.parse_hgt_name("/data/srtm/N00E000.hgt.zip") == (0, 0)
    g = hgt.hgt_georef("N34W119.hgt", 1201)
    assert g == {
        "lat0": 34.0, "lon0": -119.0, "lat1": 35.0, "lon1": -118.0,
        "step_deg": 1.0 / 1200.0, "n": 1201,
    }
    for bad in ("badname.hgt", "N91W000.hgt", "N10E181.hgt", "34N119W.hgt", ""):
        with pytest.raises(ValueError):
            hgt.parse_hgt_name(bad)


def test_hgt_feeds_reproject_4326():
    # orientation contract: hgt row 0 is the NORTH edge, which is exactly
    # reproject_4326_np's lat1 top-left convention — a row-index surface
    # must land with small values at the top of the mercator grid
    import math

    from tilers_tools_spark.operators.translate import _R, reproject_4326_np

    n = 41
    surf = np.tile(np.arange(n, dtype=np.float64)[:, None], (1, n))
    arr = hgt.decode_hgt(hgt.encode_hgt(surf), any_square=True)
    g = hgt.hgt_georef("N34W119.hgt", n)
    out, geo = reproject_4326_np(
        arr, g["lon0"], g["lat1"], g["step_deg"], resample="nearest"
    )
    assert geo["epsg"] == 3857
    assert geo["mx0"] == _R * math.radians(-119.0)
    assert out[0].max() <= 1.0 and out[-1].min() >= n - 2.0
    # monotone north->south (non-strict: nearest duplicates source rows
    # where the mercator grid oversamples)
    means = out.mean(axis=1)
    assert (np.diff(means) >= 0).all() and means[-1] > means[0]


def test_loud_rejects():
    with pytest.raises(ValueError, match="odd"):
        hgt.decode_hgt(b"\x00\x01\x02")
    with pytest.raises(ValueError, match="not a square"):
        hgt.decode_hgt(b"\x00" * 12, any_square=True)  # 6 samples
    with pytest.raises(ValueError, match="square 2-D"):
        hgt.encode_hgt(np.zeros((2, 3)))
    with pytest.raises(ValueError, match="fit int16"):
        hgt.encode_hgt(np.full((2, 2), 40000.0))
    with pytest.raises(ValueError, match="fit int16"):
        hgt.encode_hgt(np.full((2, 2), -32768.0))  # void reserved
    with pytest.raises(ValueError, match="integral"):
        hgt.encode_hgt(np.full((2, 2), 1.5))
