"""ENVI raw-binary codec (functions/envi.py): handcrafted header+bytes
KATs (hand-assembled expectations, independent of the encoder),
interleave/dtype/byte-order roundtrips, map-info georef arithmetic, and
the loud rejects."""

import struct

import numpy as np
import pytest

from tilers_tools_spark.functions import envi


def test_decode_handcrafted_kat():
    # 3 samples x 2 lines x 2 bands, int16 big-endian, BIL, offset 4:
    # line0 = band0 row0 [1,2,3], band1 row0 [10,20,30]; line1 likewise
    hdr = b"""ENVI
samples = 3
lines = 2
bands = 2
header offset = 4
data type = 2
interleave = bil
byte order = 1
data ignore value = -999
"""
    vals = [1, 2, 3, 10, 20, 30, 4, -999, 6, 40, 50, 60]
    raw = b"SKIP" + struct.pack(">12h", *vals)
    arr, meta = envi.decode_envi(hdr, raw)
    assert arr.shape == (2, 3, 2)
    exp0 = np.array([[1, 2, 3], [4, np.nan, 6]])  # band 0, ignore -> NaN
    exp1 = np.array([[10, 20, 30], [40, 50, 60]])
    assert np.array_equal(arr[:, :, 0], exp0, equal_nan=True)
    assert np.array_equal(arr[:, :, 1], exp1)
    assert meta["dtype"] == ">i2" and meta["header_offset"] == 4


def test_map_info_georef_arithmetic():
    # ref pixel (3, 2) at (100, 500), dx=dy=2 -> corner of pixel (1,1) is
    # (100 - 2*2, 500 + 1*2) = (96, 502)
    hdr = (
        "ENVI\nsamples = 4\nlines = 3\nbands = 1\ndata type = 1\n"
        "interleave = bsq\nbyte order = 0\n"
        "map info = {Arbitrary, 3.0, 2.0,\n 100.0, 500.0, 2.0, 2.0, units=Meters}\n"
    )
    meta = envi.parse_envi_header(hdr)
    assert meta["map_info"] == {
        "projection": "Arbitrary", "gsd": 2.0, "mx0": 96.0, "my1": 502.0,
    }


@pytest.mark.parametrize("il", ["bsq", "bil", "bip"])
@pytest.mark.parametrize("dtype", ["|u1", "<i2", ">f4", "<f8", ">u2"])
def test_roundtrips(il, dtype):
    rng = np.random.default_rng(hash((il, dtype)) % 2**31)
    a = np.round(rng.uniform(0, 200, (5, 7, 3)))
    a[1, 2, 0] = np.nan
    ignore = {"|u1": 255.0, ">u2": 65535.0}.get(dtype, -999.0)
    hdr, raw = envi.encode_envi(a, interleave=il, dtype=dtype, ignore=ignore)
    back, meta = envi.decode_envi(hdr, raw)
    assert np.array_equal(back, a, equal_nan=True)
    assert meta["interleave"] == il
    # single band comes back 2-D
    hdr2, raw2 = envi.encode_envi(a[:, :, 0], interleave=il, dtype=dtype, ignore=ignore)
    back2, _ = envi.decode_envi(hdr2, raw2)
    assert back2.shape == (5, 7)
    assert np.array_equal(back2, a[:, :, 0], equal_nan=True)


def test_loud_rejects():
    ok = (
        "ENVI\nsamples = 2\nlines = 1\nbands = 1\ndata type = 1\n"
        "interleave = bsq\nbyte order = 0\n"
    )
    envi.decode_envi(ok, b"\x01\x02")
    with pytest.raises(ValueError, match="magic"):
        envi.parse_envi_header("samples = 2\n")
    with pytest.raises(ValueError, match="missing 'samples'"):
        envi.parse_envi_header("ENVI\nlines = 1\nbands = 1\ndata type = 1\ninterleave = bsq\n")
    with pytest.raises(ValueError, match="data type 6"):
        envi.parse_envi_header(ok.replace("data type = 1", "data type = 6"))
    with pytest.raises(ValueError, match="interleave"):
        envi.parse_envi_header(ok.replace("bsq", "weird"))
    with pytest.raises(ValueError, match="too short"):
        envi.decode_envi(ok, b"\x01")
    with pytest.raises(ValueError, match="anisotropic"):
        envi.parse_envi_header(ok + "map info = {A, 1, 1, 0, 0, 2.0, 3.0}\n")
    with pytest.raises(ValueError, match="unterminated"):
        envi.parse_envi_header(ok + "map info = {A, 1, 1\n")
    with pytest.raises(ValueError, match="ignore value"):
        envi.encode_envi(np.array([[np.nan]]))


def test_ignore_value_must_fit_dtype():
    with pytest.raises(ValueError, match="not representable"):
        envi.encode_envi(np.array([[1.0]]), dtype="|u1", ignore=-999.0)
