"""Douglas-Peucker polyline/ring simplification (the tippecanoe /
`ogr2ogr -simplify` role in an MVT pipeline: geometry detail must shrink
with zoom or low-zoom tiles carry megabytes of sub-pixel vertices).

Contract (documented here because engine AND test/golden reference
implementations must agree):

* distance = perpendicular distance to the INFINITE line through the
  two anchor endpoints (the original Douglas-Peucker 1973 formulation);
  if the endpoints coincide, Euclidean distance to that point;
* a sub-range splits iff max distance is STRICTLY greater than `tol`,
  at the FIRST index attaining the max (np.argmax semantics);
* rings are simplified as the open polyline `ring[0..n]` with the
  closing vertex appended (anchor = vertex 0); a simplified ring with
  fewer than 3 distinct vertices is dropped (degenerate at this tol).

The kernel is iterative (explicit stack — no recursion-depth limit on
million-vertex coastlines) and vectorizes the distance scan per range.
Keep decisions of disjoint ranges are independent, so stack order does
not affect the result (deterministic, partitioning-independent).
"""

from __future__ import annotations

import math

import numpy as np


def dp_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for an open polyline ((n,2) float64)."""
    pts = np.asarray(pts, dtype=np.float64)
    n = pts.shape[0]
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        ax, ay = pts[i]
        bx, by = pts[j]
        dx, dy = bx - ax, by - ay
        seg = pts[i + 1 : j]
        norm2 = dx * dx + dy * dy
        if norm2 == 0.0:
            dist = np.hypot(seg[:, 0] - ax, seg[:, 1] - ay)
        else:
            dist = np.abs((seg[:, 0] - ax) * dy - (seg[:, 1] - ay) * dx) / math.sqrt(norm2)
        k = int(np.argmax(dist))  # first max
        if dist[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def dp_simplify(pts: np.ndarray, tol: float) -> np.ndarray:
    """Simplified open polyline (endpoints always kept)."""
    pts = np.asarray(pts, dtype=np.float64)
    return pts[dp_mask(pts, tol)]


def dp_simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray | None:
    """Simplify a ring given WITHOUT a closing vertex ((n,2), n >= 3).
    Anchors at vertex 0 via the appended closing vertex; returns the open
    simplified ring (again no closing vertex) or None if degenerate
    (< 3 distinct vertices survive)."""
    ring = np.asarray(ring, dtype=np.float64)
    if ring.shape[0] < 3:
        return None
    closed = np.vstack([ring, ring[:1]])
    kept = closed[dp_mask(closed, tol)][:-1]  # drop the duplicated closer
    if kept.shape[0] < 3 or np.unique(kept, axis=0).shape[0] < 3:
        return None
    return kept
