"""Vectorized pure-NumPy S2 cell ids (SURVEY.md §2.5 row 26, BASELINE.json:6).

Implements the published S2 cell-id algorithm [SPEC]: unit-sphere XYZ ->
cube face (u,v) -> quadratic (s,t) -> leaf (i,j) at 2^30 resolution ->
64-bit cell id via the space-filling Hilbert curve (lookup tables built by
the standard 4-bit-chunk recursion). No external s2 library exists on this
box (SURVEY.md §7 [ENV]); this module is the engine's and the oracle's
single shared implementation, used inside Arrow/pandas UDFs only.

Bit layout (S2 standard): 3 face bits, 2*level position bits, trailing 1.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP = 1
_INVERT = 2
_POS_TO_IJ = ((0, 1, 3, 2), (0, 2, 3, 1), (3, 2, 0, 1), (3, 1, 0, 2))
_POS_TO_ORIENT = (_SWAP, 0, 0, _INVERT + _SWAP)


def _build_lookups():
    lookup_pos = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * _LOOKUP_BITS + 2), dtype=np.uint64)

    def init(level, i, j, orig_orient, pos, orient):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orient]
        for idx in range(4):
            init(
                level,
                i + (r[idx] >> 1),
                j + (r[idx] & 1),
                orig_orient,
                pos + idx,
                orient ^ _POS_TO_ORIENT[idx],
            )

    for o in range(4):
        init(0, 0, 0, o, 0, o)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()
_U = np.uint64


def xyz_from_latlng(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lng = np.radians(np.asarray(lng_deg, np.float64))
    cl = np.cos(lat)
    return cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)


def face_uv_from_xyz(x, y, z):
    """Largest-abs-component face selection + valid-face (u,v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)
    # per-face u,v (S2 ValidFaceXYZToUV)
    # np.choose evaluates all six branches, so the non-selected faces can
    # divide by near-zero components — overflow/divide/invalid are all
    # expected and masked by the select; silence them wholesale.
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return face.astype(np.int64), u, v


def st_from_uv(u):
    """Quadratic projection (S2_QUADRATIC_PROJECTION)."""
    u = np.asarray(u, np.float64)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def uv_from_st(s):
    s = np.asarray(s, np.float64)
    return np.where(s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def ij_from_st(s):
    return np.clip(np.floor(np.asarray(s, np.float64) * (1 << MAX_LEVEL)), 0, (1 << MAX_LEVEL) - 1).astype(np.int64)


def cell_id_from_face_ij(face, i, j):
    """(face, leaf i, leaf j) -> leaf cell id, Hilbert-curve lookup, vectorized."""
    face = np.asarray(face).astype(np.uint64)
    i = np.asarray(i).astype(np.uint64)
    j = np.asarray(j).astype(np.uint64)
    n = face << _U(60)
    bits = face & _U(_SWAP)
    mask = _U((1 << _LOOKUP_BITS) - 1)
    for k in range(7, -1, -1):
        kk = _U(k * 4)
        bits += ((i >> kk) & mask) << _U(_LOOKUP_BITS + 2)
        bits += ((j >> kk) & mask) << _U(2)
        bits = _LOOKUP_POS[bits]
        n |= (bits >> _U(2)) << _U(k * 8)
        bits &= _U(_SWAP | _INVERT)
    with np.errstate(over="ignore"):
        return (n * _U(2) + _U(1)).astype(np.int64)


def latlng_to_cell(lat_deg, lng_deg, level: int = MAX_LEVEL):
    """lat/lng degrees -> S2 cell id at `level` (int64 array)."""
    x, y, z = xyz_from_latlng(lat_deg, lng_deg)
    face, u, v = face_uv_from_xyz(x, y, z)
    i = ij_from_st(st_from_uv(u))
    j = ij_from_st(st_from_uv(v))
    leaf = cell_id_from_face_ij(face, i, j)
    return parent(leaf, level)


def parent(cell, level: int):
    """Truncate a cell id to `level` (<= its own level)."""
    cell_u = np.asarray(cell).astype(np.uint64)
    lsb = _U(1) << _U(2 * (MAX_LEVEL - level))
    with np.errstate(over="ignore"):
        return ((cell_u & ~(lsb - _U(1))) | lsb).astype(np.int64)


def level_of(cell):
    """Level from trailing-bit position."""
    c = np.asarray(cell).astype(np.uint64)
    lsb_pos = np.zeros_like(c, dtype=np.int64)
    tmp = c.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        nz = (tmp & ((_U(1) << _U(shift)) - _U(1))) == 0
        lsb_pos = np.where(nz, lsb_pos + shift, lsb_pos)
        tmp = np.where(nz, tmp >> _U(shift), tmp)
    return MAX_LEVEL - lsb_pos // 2


def face_ij_from_cell(cell):
    """cell id -> (face, leaf i, leaf j) of a point inside the cell.

    Walks the Hilbert curve with lookup_ij over the position-bit chunks
    (top chunk is 2 levels = 4 bits since 30 = 7*4 + 2; chunk shift skips
    the trailing marker bit). For a non-leaf id the trailing 1 lands mid
    cell, so the caller snaps to the cell grid for the geometric center.
    """
    c = np.asarray(cell).astype(np.uint64)
    face = (c >> _U(61)).astype(np.int64)
    i = np.zeros_like(c)
    j = np.zeros_like(c)
    bits = face.astype(np.uint64) & _U(_SWAP)
    for k in range(7, -1, -1):
        nbits = MAX_LEVEL - 7 * _LOOKUP_BITS if k == 7 else _LOOKUP_BITS
        chunk = (c >> _U(k * 2 * _LOOKUP_BITS + 1)) & _U((1 << (2 * nbits)) - 1)
        bits += chunk << _U(2)
        bits = _LOOKUP_IJ[bits]
        i += (bits >> _U(_LOOKUP_BITS + 2)) << _U(k * _LOOKUP_BITS)
        j += ((bits >> _U(2)) & _U((1 << _LOOKUP_BITS) - 1)) << _U(k * _LOOKUP_BITS)
        bits &= _U(_SWAP | _INVERT)
    return face, i.astype(np.int64), j.astype(np.int64)


# S2 FaceUVtoXYZ table: face -> (x, y, z) in terms of (1, u, v)
#   0:( 1, u, v)  1:(-u, 1, v)  2:(-u,-v, 1)  3:(-1,-v,-u)  4:( v,-1,-u)  5:( v, u,-1)
def xyz_from_face_uv(face, u, v):
    ones = np.ones_like(u)
    x = np.choose(face, [ones, -u, -u, -ones, v, v])
    y = np.choose(face, [u, ones, -v, -v, -ones, u])
    z = np.choose(face, [v, v, ones, -u, -u, -ones])
    return x, y, z


def cell_center_latlng(cell):
    """Inverse: cell id -> (lat_deg, lng_deg) of its center (for tests/kNN)."""
    face, i, j = face_ij_from_cell(cell)
    lvl = level_of(cell)
    side = np.power(2.0, (MAX_LEVEL - lvl).astype(np.float64))  # cell side, leaf ij units
    si = (np.floor(i.astype(np.float64) / side) * side + side / 2.0) / float(1 << MAX_LEVEL)
    ti = (np.floor(j.astype(np.float64) / side) * side + side / 2.0) / float(1 << MAX_LEVEL)
    x, y, z = xyz_from_face_uv(face, uv_from_st(si), uv_from_st(ti))
    norm = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / norm))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng
