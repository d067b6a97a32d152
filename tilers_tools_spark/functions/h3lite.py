"""h3lite — vectorized aperture-7 icosahedral hex index, H3 bit layout.

SURVEY.md §2.5 row 25 / BASELINE.json:6 mandate an H3 (res 0-12) cell key per
tile. No h3 library exists on this box and the box is offline (SURVEY.md §7
[ENV]), and H3's canonical 122-entry base-cell table cannot be reproduced
from public *formulas* (it is data, not math). This module therefore
implements the published H3 *algorithm structure* exactly — gnomonic
projection onto the 20 icosahedron faces, aperture-7 hex grid with the
Class-III ~19.1066° per-resolution rotation, IJK digit chain via the
published _upAp7/_upAp7r/_downAp7/_downAp7r integer transforms, and H3's
64-bit layout (mode 1, 4-bit res, 7-bit base cell, 3-bit digits, unused
digits = 7) — with an engine-defined icosahedron orientation and one base
cell per face (20 base cells).

Guarantees (tested): deterministic; hierarchical (parent-by-truncation ==
parent-by-recompute); res 0..12; uniform-ish cell sizes (res r linear size ~
face/sqrt(7)^r); H3-valid bit layout. NOT guaranteed: numeric equality with
canonical H3 ids — swapping in the canonical orientation + base-cell table
when online is a drop-in change (only `_FACES` + base-cell numbering).

DECISION (final for the offline build, round 3): the canonical 122-entry
base-cell table and icosahedron orientation are published DATA, not
derivable formulas; reconstructing them from memory risks silently-wrong
ids, which is strictly worse than a documented engine-local id space. The
deviation is therefore spec'd (here + README "H3 conformance note"), pinned
by tests/test_indexers.py::test_engine_local_ids_documented_not_canonical
(a canonical KAT vector that must NOT match), and `s2_cell` — an exact
implementation of the published S2 algorithm — is the designated interop
key for joins against external datasets.

All functions are NumPy-vectorized and run inside Arrow/pandas UDFs only
(BASELINE.json:15 — no per-row Python).
"""

from __future__ import annotations

import math

import numpy as np

MAX_RES = 15  # bit layout supports 15; engine uses 0..12 (BASELINE.json:6)

# --------------------------------------------------------------------------
# icosahedron geometry (vertex-up: golden-ratio vertices, fixed orientation)
# --------------------------------------------------------------------------


def _icosahedron():
    phi = (1.0 + math.sqrt(5.0)) / 2.0
    v = []
    for a, b in ((1.0, phi), (-1.0, phi), (1.0, -phi), (-1.0, -phi)):
        v += [(0.0, a, b), (a, b, 0.0), (b, 0.0, a)]
    verts = np.array(v, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    # faces = all vertex triples at mutual min distance (edge length)
    d = np.linalg.norm(verts[:, None, :] - verts[None, :, :], axis=2)
    edge = np.min(d[d > 1e-9])
    faces = []
    n = len(verts)
    for i in range(n):
        for j in range(i + 1, n):
            if abs(d[i, j] - edge) > 1e-6:
                continue
            for k in range(j + 1, n):
                if abs(d[i, k] - edge) < 1e-6 and abs(d[j, k] - edge) < 1e-6:
                    faces.append((i, j, k))
    assert len(faces) == 20
    centers = np.array([verts[list(f)].mean(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # deterministic face ordering: sort by (z desc, atan2(y,x))
    order = np.lexsort((np.arctan2(centers[:, 1], centers[:, 0]), -centers[:, 2]))
    centers = centers[order]
    faces = [faces[o] for o in order]
    # per-face orthonormal basis: ex toward first vertex, ey = c x ex
    ex = []
    ey = []
    for fi, f in enumerate(faces):
        c = centers[fi]
        v0 = verts[f[0]]
        e = v0 - np.dot(v0, c) * c
        e /= np.linalg.norm(e)
        ex.append(e)
        ey.append(np.cross(c, e))
    return centers, np.array(ex), np.array(ey)


_CENTERS, _EX, _EY = _icosahedron()

# res-0 hex circumradius in gnomonic units: large enough that every point of
# a face rounds to the face-center hex -> exactly one base cell per face.
_RES0_HEX = 2.0
_SQRT7 = math.sqrt(7.0)
_AP7_ROT = math.asin(math.sqrt(3.0 / 28.0))  # 19.1066...° Class-III rotation

_MODE_HEX = 1


def _face_xy(lat_deg, lng_deg):
    """lat/lng -> (face, gnomonic local x, y). Vectorized."""
    lat = np.radians(np.asarray(lat_deg, np.float64))
    lng = np.radians(np.asarray(lng_deg, np.float64))
    cl = np.cos(lat)
    xyz = np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)
    dots = xyz @ _CENTERS.T  # (n, 20)
    face = np.argmax(dots, axis=-1)
    c = _CENTERS[face]
    scale = np.einsum("nd,nd->n", xyz, c)
    p = xyz / scale[:, None] - c  # gnomonic offset in tangent plane
    return face, np.einsum("nd,nd->n", p, _EX[face]), np.einsum("nd,nd->n", p, _EY[face])


def _hex_round(i_f, j_f):
    """Fractional 120°-axial (i, j) -> nearest hex center, via cube rounding.

    H3's (i, j) = (I-K, J-K) axes are 120° apart: lattice norm² = i² + j² - ij.
    Mapping (q, r) = (i, -j) turns that into the standard 60°-axial metric
    q² + qr + r², where ordinary cube rounding applies.
    """
    xf, zf = i_f, -j_f
    yf = -xf - zf
    rx, ry, rz = np.round(xf), np.round(yf), np.round(zf)
    dx, dy, dz = np.abs(rx - xf), np.abs(ry - yf), np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), (-rz).astype(np.int64)


_SQRT3 = math.sqrt(3.0)


def _xy_to_axial(x, y, res):
    """World gnomonic xy -> fractional 120°-axial (i, j) in the res-r frame.

    The res-r lattice frame is rotated +res*_AP7_ROT vs the face frame and
    scaled 1/sqrt(7) per res; basis: i-axis = d*(1,0), j-axis = d*(-1/2,√3/2).
    """
    d = _RES0_HEX / _SQRT7**res
    ang = res * _AP7_ROT
    ca, sa = math.cos(ang), math.sin(ang)
    xr = ca * x + sa * y  # R(-ang) @ world
    yr = -sa * x + ca * y
    j = 2.0 * yr / (_SQRT3 * d)
    i = xr / d + j / 2.0
    return i, j


def _axial_to_xy(i, j, res):
    d = _RES0_HEX / _SQRT7**res
    xr = d * (i - j / 2.0)
    yr = d * (_SQRT3 / 2.0) * j
    ang = res * _AP7_ROT
    ca, sa = math.cos(ang), math.sin(ang)
    return ca * xr - sa * yr, sa * xr + ca * yr  # R(+ang) back to world


# aperture-7 up/down on 120°-axial (i, j) — the published H3 _upAp7 rounding
# (coordijk.c) with its exact integer inverse (det 7 matrix pair):
#   up:   (i', j') = round([[3, -1], [1, 2]]/7 @ (i, j))
#   down: (i, j)   = [[2, 1], [-1, 3]] @ (i', j')
def _up_ap7(i, j):
    return (np.round((3 * i - j) / 7.0).astype(np.int64), np.round((i + 2 * j) / 7.0).astype(np.int64))


def _down_ap7(i, j):
    return 2 * i + j, -i + 3 * j


# digit encoding: offset axial (di,dj) = (I-K, J-K) of the IJK unit vectors
# (H3 Direction enum): CENTER=0, K=1, J=2, JK=3, I=4, IK=5, IJ=6.
_DIGIT_OF = {(0, 0): 0, (-1, -1): 1, (0, 1): 2, (-1, 0): 3, (1, 0): 4, (0, -1): 5, (1, 1): 6}
_AXIAL_OF_DIGIT = {v: k for k, v in _DIGIT_OF.items()}

_DIGIT_LUT = np.full((5, 5), -1, dtype=np.int64)
for (di, dj), dig in _DIGIT_OF.items():
    _DIGIT_LUT[di + 2, dj + 2] = dig


def latlng_to_cell(lat_deg, lng_deg, res: int):
    """lat/lng degrees -> h3lite cell (int64 array), res 0..15."""
    lat_deg = np.atleast_1d(np.asarray(lat_deg, np.float64))
    lng_deg = np.atleast_1d(np.asarray(lng_deg, np.float64))
    face, x, y = _face_xy(lat_deg, lng_deg)
    q, r = _xy_to_axial(x, y, res)
    i, j = _hex_round(q, r)
    digits = np.full((res, len(i)), 7, dtype=np.int64)
    for rr in range(res, 0, -1):
        pi, pj = _up_ap7(i, j)
        ci, cj = _down_ap7(pi, pj)
        di, dj = i - ci, j - cj
        d = _DIGIT_LUT[np.clip(di + 2, 0, 4), np.clip(dj + 2, 0, 4)]
        if (d < 0).any():  # guard: a non-unit offset would corrupt the id
            raise AssertionError("aperture-7 digit outside unit neighborhood")
        digits[rr - 1] = d
        i, j = pi, pj
    # base cell = face id (one res-0 cell per face by construction)
    cell = (
        (np.int64(_MODE_HEX) << 59)
        | (np.int64(res) << 52)
        | (face.astype(np.int64) << 45)
    )
    for rr in range(1, MAX_RES + 1):
        d = digits[rr - 1] if rr <= res else np.full_like(cell, 7)
        cell = cell | (d.astype(np.int64) << (3 * (MAX_RES - rr)))
    return cell


def cell_to_res(cell):
    return ((np.asarray(cell).astype(np.int64) >> 52) & 0xF).astype(np.int64)


def cell_base(cell):
    return ((np.asarray(cell).astype(np.int64) >> 45) & 0x7F).astype(np.int64)


def cell_digit(cell, rr):
    return ((np.asarray(cell).astype(np.int64) >> (3 * (MAX_RES - rr))) & 0x7).astype(np.int64)


def cell_to_parent(cell, parent_res):
    """Truncate digits below parent_res (H3 h3ToParent semantics)."""
    c = np.asarray(cell).astype(np.int64)
    res = cell_to_res(c)
    out = (c & ~(np.int64(0xF) << 52)) | (np.int64(parent_res) << 52)
    for rr in range(parent_res + 1, MAX_RES + 1):
        out = out | (np.int64(7) << (3 * (MAX_RES - rr)))
    return np.where(res < parent_res, c, out)


def cell_to_latlng(cell):
    """Cell -> (lat_deg, lng_deg) of center. Inverse of latlng_to_cell."""
    c = np.atleast_1d(np.asarray(cell).astype(np.int64))
    res = cell_to_res(c)
    face = cell_base(c)
    i = np.zeros(len(c), dtype=np.int64)
    j = np.zeros(len(c), dtype=np.int64)
    rmax = int(res.max()) if len(c) else 0
    for rr in range(1, rmax + 1):
        active = rr <= res
        ni, nj = _down_ap7(i, j)
        d = cell_digit(c, rr)
        da = np.array([_AXIAL_OF_DIGIT[k] for k in range(7)], dtype=np.int64)
        dd = np.where(active, d, 0)
        ni = ni + da[dd, 0]
        nj = nj + da[dd, 1]
        i = np.where(active, ni, i)
        j = np.where(active, nj, j)
    # per-row res scale: vectorize via loop over distinct res values
    x = np.zeros(len(c), dtype=np.float64)
    y = np.zeros(len(c), dtype=np.float64)
    for rv in np.unique(res):
        m = res == rv
        xr, yr = _axial_to_xy(i[m].astype(np.float64), j[m].astype(np.float64), int(rv))
        x[m], y[m] = xr, yr
    cen = _CENTERS[face]
    p = cen + x[:, None] * _EX[face] + y[:, None] * _EY[face]
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    return np.degrees(np.arcsin(np.clip(p[:, 2], -1, 1))), np.degrees(np.arctan2(p[:, 1], p[:, 0]))
