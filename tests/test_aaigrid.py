"""ESRI ASCII grid codec (functions/aaigrid.py): handcrafted-text KATs
(decode pinned against hand-written expectations, independent of the
encoder), bit-exact roundtrips, anchor-spelling shifts, and every loud
reject. No Spark needed — the UDF path is gated end-to-end by the
aaigrid_ingest driver query."""

import numpy as np
import pytest

from tilers_tools_spark.functions import aaigrid


def test_decode_handcrafted_kat():
    # hand-written grid: values chosen so the expected array is obvious;
    # TOP row first per the spec, -9999 -> NaN
    text = b"""ncols 3
nrows 2
xllcorner 10.5
yllcorner -20.0
cellsize 2.5
NODATA_value -9999
1 2.5 -9999
-4 0 6e1
"""
    arr, meta = aaigrid.parse_aaigrid(text)
    exp = np.array([[1.0, 2.5, np.nan], [-4.0, 0.0, 60.0]])
    assert np.array_equal(arr, exp, equal_nan=True)
    assert meta == {
        "ncols": 3, "nrows": 2, "xll": 10.5, "yll": -20.0,
        "cellsize": 2.5, "nodata": -9999.0,
    }
    g = aaigrid.aaigrid_georef(meta, "EPSG:3857")
    assert g == {"gsd": 2.5, "mx0": 10.5, "my0": -20.0, "mx1": 18.0, "my1": -15.0}


def test_decode_center_and_dxdy_spellings():
    # xllcenter/yllcenter shift by cellsize/2 to the corner convention
    arr, meta = aaigrid.parse_aaigrid(
        "NCOLS 2\nNROWS 1\nXLLCENTER 1.0\nYLLCENTER 2.0\nCELLSIZE 4.0\n7 8\n"
    )
    assert (meta["xll"], meta["yll"]) == (-1.0, 0.0)
    assert np.array_equal(arr, [[7.0, 8.0]])
    # GDAL's dx/dy extension is accepted when square; no NODATA key is fine
    arr2, meta2 = aaigrid.parse_aaigrid(
        "ncols 2\nnrows 2\nxllcorner 0\nyllcorner 0\ndx 3.0\ndy 3.0\n1 2 3 4\n"
    )
    assert meta2["cellsize"] == 3.0 and meta2["nodata"] is None
    assert np.array_equal(arr2, [[1.0, 2.0], [3.0, 4.0]])


def test_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((9, 13)) * 1e4
    a[2, 3] = np.nan
    a[8, 0] = np.nan
    for centered in (False, True):
        blob = aaigrid.encode_aaigrid(a, xll=-3.25, yll=17.0, cellsize=0.5,
                                      centered=centered)
        back, meta = aaigrid.parse_aaigrid(blob)
        assert np.array_equal(back, a, equal_nan=True)  # repr() text: exact
        assert (meta["xll"], meta["yll"], meta["cellsize"]) == (-3.25, 17.0, 0.5)


def test_loud_rejects():
    ok = "ncols 2\nnrows 1\nxllcorner 0\nyllcorner 0\ncellsize 1\n1 2\n"
    aaigrid.parse_aaigrid(ok)
    with pytest.raises(ValueError, match="anisotropic"):
        aaigrid.parse_aaigrid(ok.replace("cellsize 1", "dx 1\ndy 2"))
    with pytest.raises(ValueError, match="both cellsize and dx"):
        aaigrid.parse_aaigrid(ok.replace("cellsize 1", "cellsize 1\ndx 1\ndy 1"))
    with pytest.raises(ValueError, match="value count"):
        aaigrid.parse_aaigrid(ok.replace("1 2\n", "1\n"))
    with pytest.raises(ValueError, match="missing cellsize"):
        aaigrid.parse_aaigrid(ok.replace("cellsize 1\n", ""))
    with pytest.raises(ValueError, match="missing xllcorner"):
        aaigrid.parse_aaigrid(ok.replace("xllcorner 0\n", ""))
    with pytest.raises(ValueError, match="missing ncols"):
        aaigrid.parse_aaigrid(ok.replace("ncols 2\n", ""))
    with pytest.raises(ValueError, match="bad value"):
        aaigrid.parse_aaigrid(ok.replace("ncols 2", "ncols two"))
    with pytest.raises(ValueError, match="bad cell value"):
        aaigrid.parse_aaigrid(ok.replace("1 2", "1 x"))
    with pytest.raises(ValueError, match="must be > 0"):
        aaigrid.parse_aaigrid(ok.replace("cellsize 1", "cellsize 0"))
    with pytest.raises(ValueError, match="bad dimensions"):
        aaigrid.parse_aaigrid(ok.replace("nrows 1", "nrows 1.5"))
    with pytest.raises(ValueError, match="nodata sentinel"):
        aaigrid.encode_aaigrid(np.array([[-9999.0]]))
    with pytest.raises(ValueError, match="2-D"):
        aaigrid.encode_aaigrid(np.zeros(4))
    # georef promotion requires a declared EPSG:3857 — same policy as
    # the world-file driver
    _, meta = aaigrid.parse_aaigrid(ok)
    with pytest.raises(ValueError, match="3857"):
        aaigrid.aaigrid_georef(meta, None)
    with pytest.raises(ValueError, match="3857"):
        aaigrid.aaigrid_georef(meta, 'PROJCS["UTM zone 33N",AUTHORITY["EPSG","32633"]]')
