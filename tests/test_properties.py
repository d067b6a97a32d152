"""Property-based tests (hypothesis) over the pure math contracts:
mercator roundtrip, cover-rule membership, flip involution, indexer
determinism/hierarchy, pack/unpack. No Spark session needed.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from oracle import minitiler as mt
from tilers_tools_spark.functions import h3lite, s2lite
from tilers_tools_spark.functions import tilemath as tm

lon_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
lat_s = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
zoom_s = st.integers(min_value=0, max_value=22)


@settings(max_examples=200, deadline=None)
@given(lon_s, lat_s)
def test_merc_roundtrip(lon, lat):
    mx, my = tm.merc_np(np.array([lon]), np.array([lat]))
    lo, la = tm.inv_merc_np(mx, my)
    assert abs(lo[0] - lon) < 1e-9
    assert abs(la[0] - lat) < 1e-9


@settings(max_examples=200, deadline=None)
@given(lon_s, lat_s, zoom_s)
def test_point_inside_own_cover(lon, lat, z):
    """A point's tile is inside the cover range of any box containing it."""
    mx, my = tm.merc_np(np.array([lon]), np.array([lat]))
    tx, ty = tm.tile_xy_np(mx, my, np.array([z]))
    pad = 10.0  # meters
    txmin, txmax, tymin, tymax = tm.cover_range_np(
        mx - pad, my - pad, mx + pad, my + pad, np.array([z])
    )
    assert txmin[0] <= tx[0] <= txmax[0]
    assert tymin[0] <= ty[0] <= tymax[0]


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**22 - 1), st.integers(min_value=22, max_value=29))
def test_flip_involution_prop(y, z):
    za = np.array([z])
    ya = np.array([y])
    assert tm.tms_to_xyz_np(tm.tms_to_xyz_np(ya, za), za)[0] == y


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=29), st.integers(min_value=0, max_value=2**29 - 1), st.integers(min_value=0, max_value=2**29 - 1))
def test_pack_unpack(z, x, y):
    x = min(x, 2**z - 1) if z < 29 else x
    y = min(y, 2**z - 1) if z < 29 else y
    p = tm.pack_zxy_np(np.array([z]), np.array([x]), np.array([y]))[0]
    assert (p >> 58) == z and ((p >> 29) & (2**29 - 1)) == x and (p & (2**29 - 1)) == y


@settings(max_examples=150, deadline=None)
@given(lon_s, lat_s, st.integers(min_value=0, max_value=12))
def test_h3_hierarchy_prop(lon, lat, res):
    c = h3lite.latlng_to_cell(np.array([lat]), np.array([lon]), res)
    assert h3lite.cell_to_res(c)[0] == res
    for pr in range(res, -1, -4):
        p = h3lite.cell_to_parent(c, pr)
        assert h3lite.cell_to_res(p)[0] == pr
        assert h3lite.cell_base(p)[0] == h3lite.cell_base(c)[0]


@settings(max_examples=150, deadline=None)
@given(lon_s, lat_s, st.integers(min_value=0, max_value=30))
def test_s2_parent_contains_point(lon, lat, level):
    c = s2lite.latlng_to_cell(np.array([lat]), np.array([lon]), level)
    assert s2lite.level_of(c)[0] == level
    if level > 0:
        p = s2lite.parent(c, level - 1)
        direct = s2lite.latlng_to_cell(np.array([lat]), np.array([lon]), level - 1)
        assert p[0] == direct[0]  # S2 nesting is exact (unlike hex aperture 7)


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=16.0, max_value=1024.0, allow_nan=False))
def test_base_zoom_bracket(gsd):
    z = int(tm.base_zoom_np(np.array([gsd]))[0])
    assert mt.base_zoom(gsd) == z
    assert tm.RES0 / 2.0**z <= gsd + 1e-9
    if z > 0:
        assert tm.RES0 / 2.0 ** (z - 1) > gsd - 1e-9


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=29),
    st.integers(min_value=0, max_value=2**29 - 1),
    st.integers(min_value=0, max_value=2**29 - 1),
)
def test_osmdroid_key_z_recovery_unique(z, xa, ya):
    """The osmdroid key's per-zoom ranges [z*4^z, (z+1)*4^z) are disjoint,
    so from_osmdroid_keys' metadata-free z recovery (the unique v with
    key >> 2v == v) is exact for every (z, x, y) — the property the
    Column-side inverse relies on."""
    n = 1 << z
    x, y = xa % n, ya % n
    key = (((z << z) + x) << z) + y
    matches = [v for v in range(30) if (key >> (2 * v)) == v]
    assert matches == [z]
    # and the bit-mask extraction inverts exactly
    assert (key >> z) & (n - 1) == x and key & (n - 1) == y
