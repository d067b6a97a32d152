

def test_exact_stratified_k(spark):
    import hashlib

    from tilers_tools_spark.operators import sampling

    rows = [(i, f"s{i % 3}") for i in range(50)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, stratum string")
    out = sampling.exact_stratified_k(
        df, k=5, strata_cols=["stratum"], key_col="doc_id", seed=9).collect()
    got = {}
    for r in out:
        got.setdefault(r["stratum"], []).append((r["sample_rank"], r["doc_id"]))
    # exact quotas: min(k, size)
    assert sorted(len(v) for v in got.values()) == [1, 5, 5, 5]
    # selection = k smallest md5 digests, rank order matches
    for s, members in got.items():
        ids = [i for i, st in rows if st == s]
        ref = sorted(ids, key=lambda i: (hashlib.md5(f"{i}:9".encode()).hexdigest(), i))[:5]
        assert [d for _, d in sorted(members)] == ref, s


def test_exact_stratified_k_validation(spark):
    import pytest as pt

    from tilers_tools_spark.operators import sampling

    with pt.raises(ValueError):
        sampling.exact_stratified_k(None, 0, ["x"], "y")


def test_order_statistic_vs_sorted(spark):
    import random as rnd

    from tilers_tools_spark.operators import sketch

    rng = rnd.Random(101)
    vals = [rng.randrange(-1000, 1000) for _ in range(500)] + [7] * 50  # ties
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    srt = sorted(vals)
    ks = [1, 2, 137, 275, 549, 550]
    got = {r["k"]: r["value"] for r in sketch.order_statistic(df, ks=ks).collect()}
    assert got == {k: srt[k - 1] for k in ks}


def test_order_statistic_validation(spark):
    import pytest as pt

    from tilers_tools_spark.operators import sketch

    df = spark.createDataFrame([(1,), (2,)], "v long")
    with pt.raises(ValueError):
        sketch.order_statistic(df, ks=[])
    with pt.raises(ValueError):
        sketch.order_statistic(df, ks=[0])
    with pt.raises(ValueError):
        sketch.order_statistic(df, ks=[3]).collect()


def test_winsorize_vs_sorted(spark):
    import random as rnd

    from tilers_tools_spark.operators import sketch

    rng = rnd.Random(7)
    vals = [rng.randrange(-500, 500) for _ in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    srt = sorted(vals)
    lo_k, hi_k = 20, 380
    r = sketch.winsorize(df, lo_k, hi_k).collect()[0]
    lo_v, hi_v = srt[lo_k - 1], srt[hi_k - 1]
    assert (r["n"], r["lo_v"], r["hi_v"]) == (400, lo_v, hi_v)
    assert r["n_lo"] == sum(1 for v in vals if v < lo_v)
    assert r["n_hi"] == sum(1 for v in vals if v > hi_v)
    assert r["sum_clipped"] == sum(min(max(v, lo_v), hi_v) for v in vals)


def test_winsorize_validation(spark):
    import pytest as pt

    from tilers_tools_spark.operators import sketch

    with pt.raises(ValueError):
        sketch.winsorize(None, 0, 5)
    with pt.raises(ValueError):
        sketch.winsorize(None, 5, 4)


def _sky_ref(pts):
    from collections import Counter

    d = Counter(pts)
    out = {}
    for (x, y), n in d.items():
        dom = any(
            (a <= x and b <= y and (a < x or b < y)) for (a, b) in d
        )
        if not dom:
            out[(x, y)] = n
    return out


def test_skyline_vs_brute_and_parallelism_invariance(spark):
    import random as rnd

    from tilers_tools_spark.operators import sketch

    rng = rnd.Random(47)
    pts = [(rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(400)]
    pts += pts[:10]  # planted duplicates
    ref = _sky_ref(pts)
    for parts in (1, 7):
        df = spark.createDataFrame(pts, "x long, y long").repartition(parts)
        got = {(r["x"], r["y"]): r["n"] for r in sketch.skyline2d(df).collect()}
        assert got == ref, parts


def test_skyline_hand_kat(spark):
    from tilers_tools_spark.operators import sketch

    # staircase (1,5),(2,3),(4,2),(6,1) survives; (2,4) dominated by
    # (2,3); (5,5) dominated by everything; duplicate (2,3) merges n=2
    pts = [(1, 5), (2, 3), (2, 3), (4, 2), (6, 1), (2, 4), (5, 5)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["n"] for r in sketch.skyline2d(df).collect()}
    assert got == {(1, 5): 1, (2, 3): 2, (4, 2): 1, (6, 1): 1}


def _iou_ref(boxes, p, q):
    out = {}
    for i, (ida, ax0, ay0, ax1, ay1) in enumerate(boxes):
        for (idb, bx0, by0, bx1, by1) in boxes[i + 1:]:
            a, b = ((ida, ax0, ay0, ax1, ay1), (idb, bx0, by0, bx1, by1))
            if a[0] > b[0]:
                a, b = b, a
            iw = min(a[3], b[3]) - max(a[1], b[1])
            ih = min(a[4], b[4]) - max(a[2], b[2])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            uni = ((a[3] - a[1]) * (a[4] - a[2])
                   + (b[3] - b[1]) * (b[4] - b[2]) - inter)
            if q * inter >= p * uni:
                out[(a[0], b[0])] = (inter, uni)
    return out


def test_iou_pairs_vs_brute(spark):
    import random as rnd

    from tilers_tools_spark.operators import spatial

    rng = rnd.Random(53)
    boxes = []
    for i in range(200):
        x0, y0 = rng.randrange(0, 300), rng.randrange(0, 300)
        boxes.append((i, x0, y0, x0 + rng.randrange(1, 60), y0 + rng.randrange(1, 60)))
    df = spark.createDataFrame(boxes, "id long, x0 long, y0 long, x1 long, y1 long")
    for p, q, cell in ((3, 10, 64), (1, 2, 16), (1, 1, 100)):
        got = {(r["ida"], r["idb"]): (r["inter"], r["uni"])
               for r in spatial.iou_pairs(df, p, q, cell).collect()}
        assert got == _iou_ref(boxes, p, q), (p, q, cell)


def test_iou_pairs_exact_threshold_and_validation(spark):
    import pytest as pt

    from tilers_tools_spark.operators import spatial

    # two 2x2 boxes overlapping in a 1x2 strip: inter 2, union 6,
    # iou exactly 1/3 — included at threshold 1/3, excluded at 34/100
    boxes = [(1, 0, 0, 2, 2), (2, 1, 0, 3, 2)]
    df = spark.createDataFrame(boxes, "id long, x0 long, y0 long, x1 long, y1 long")
    assert spatial.iou_pairs(df, 1, 3, 8).count() == 1
    assert spatial.iou_pairs(df, 34, 100, 8).count() == 0
    with pt.raises(ValueError):
        spatial.iou_pairs(None, 0, 1, 8)
    with pt.raises(ValueError):
        spatial.iou_pairs(None, 2, 1, 8)
    bad = spark.createDataFrame([(1, 5, 5, 5, 9)], "id long, x0 long, y0 long, x1 long, y1 long")
    with pt.raises(Exception, match="degenerate box"):
        spatial.iou_pairs(bad, 1, 2, 8).count()
