

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
