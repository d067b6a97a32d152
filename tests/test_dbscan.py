"""dbscan (operators/spatial.py) vs a brute-force O(n^2) reference:
random blob+noise clouds, the exact-eps boundary (inclusive), the
min_pts-counts-self rule, the deterministic min-label border rule,
duplicate coordinates, and partitioning independence."""

import random

import pytest

from tilers_tools_spark.operators.spatial import dbscan


def ref_dbscan(pts, eps, min_pts):
    """Textbook DBSCAN: all-pairs neighbors, union-find over core-core
    edges with min-root unions (so the final root IS the min core id),
    border -> min core-neighbor label. Independent of the Spark path."""
    nbr = {pid: [] for pid, _, _ in pts}
    for pid, x, y in pts:
        for qid, qx, qy in pts:
            if pid != qid and (x - qx) ** 2 + (y - qy) ** 2 <= eps * eps:
                nbr[pid].append(qid)
    core = {pid for pid, _, _ in pts if len(nbr[pid]) + 1 >= min_pts}
    parent = {c: c for c in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for c in core:
        for q in nbr[c]:
            if q in core:
                ra, rb = find(c), find(q)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    labels = {}
    for pid, _, _ in pts:
        if pid in core:
            labels[pid] = find(pid)
        else:
            cands = [find(q) for q in nbr[pid] if q in core]
            labels[pid] = min(cands) if cands else None
    return core, labels


def run_spark(spark, pts, eps, min_pts, parts=1):
    df = spark.createDataFrame(pts, "id long, x double, y double")
    if parts > 1:
        df = df.repartition(parts)
    out = dbscan(df, eps=eps, min_pts=min_pts).collect()
    return ({r["id"] for r in out if r["is_core"]},
            {r["id"]: r["cluster"] for r in out})


def test_random_clouds_vs_bruteforce(spark):
    rng = random.Random(42)
    pts = []
    pid = 0
    for cx, cy in [(0, 0), (10, 0), (5, 9), (40, 40)]:  # blobs
        for _ in range(30):
            pts.append((pid, cx + rng.uniform(-1, 1), cy + rng.uniform(-1, 1)))
            pid += 1
    for _ in range(40):  # sparse noise
        pts.append((pid, rng.uniform(-20, 60), rng.uniform(-20, 60)))
        pid += 1
    eps, min_pts = 1.2, 4
    core_r, lab_r = ref_dbscan(pts, eps, min_pts)
    core_s, lab_s = run_spark(spark, pts, eps, min_pts)
    assert core_s == core_r
    assert lab_s == lab_r
    assert len({v for v in lab_r.values() if v is not None}) >= 4


def test_eps_boundary_inclusive_and_minpts_counts_self(spark):
    # chain 0-1-2 spaced EXACTLY eps apart: all 3 are eps-neighbors of the
    # middle; min_pts=3 makes only the middle core (2 nbrs + itself = 3),
    # ends are border -> same cluster (label = min core id = 1)
    pts = [(0, 0.0, 0.0), (1, 2.0, 0.0), (2, 4.0, 0.0)]
    core, lab = run_spark(spark, pts, eps=2.0, min_pts=3)
    assert core == {1}
    assert lab == {0: 1, 1: 1, 2: 1}
    # epsilon shrunk below the spacing: nobody has neighbors -> all noise
    core2, lab2 = run_spark(spark, pts, eps=1.999, min_pts=3)
    assert core2 == set() and set(lab2.values()) == {None}


def test_border_point_between_two_clusters_takes_min_label(spark):
    # two tight 6-point line clusters and one border point at exactly eps
    # of ONE core from EACH side (all coordinates exact in binary, so the
    # inclusive boundary is hit bit-exactly): deterministic rule -> min
    # cluster label. bridge nbrs = {x=5, x=20} + self = 3 < min_pts=4.
    left = [(i, float(i), 0.0) for i in range(6)]          # x = 0..5
    right = [(10 + i, 20.0 + i, 0.0) for i in range(6)]    # x = 20..25
    bridge = [(7, 12.5, 0.0)]
    core, lab = run_spark(spark, left + right + bridge, eps=7.5, min_pts=4)
    assert 7 not in core
    assert lab[7] == 0  # min(label(5)=0, label(10)=10)
    assert all(lab[i] == 0 for i in range(6))
    assert all(lab[10 + i] == 10 for i in range(6))


def test_duplicates_and_partitioning_independence(spark):
    rng = random.Random(7)
    pts = [(i, rng.uniform(0, 8), rng.uniform(0, 8)) for i in range(120)]
    pts += [(200 + i, 3.0, 3.0) for i in range(5)]  # 5 coincident points
    eps, min_pts = 0.9, 5
    core_r, lab_r = ref_dbscan(pts, eps, min_pts)
    for parts in (1, 7):
        core_s, lab_s = run_spark(spark, pts, eps, min_pts, parts=parts)
        assert core_s == core_r and lab_s == lab_r


def test_validation(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0)], "id long, x double, y double")
    with pytest.raises(ValueError):
        dbscan(df, eps=0.0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan(df, eps=1.0, min_pts=0)
