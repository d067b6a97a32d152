

def test_locf_hand(spark):
    from tilers_tools_spark.operators import temporal

    rows = [("a", 1, 10), ("a", 4, 40), ("b", 0, 7)]
    df = spark.createDataFrame(rows, "entity string, bin long, v long")
    got = {
        (r["entity"], r["bin"]): (r["v_filled"], r["filled"], r["src_bin"])
        for r in temporal.locf_fill(df, n_bins=6).collect()
    }
    assert got[("a", 0)] == (None, True, None)     # leading gap stays NULL
    assert got[("a", 1)] == (10, False, 1)
    assert got[("a", 2)] == (10, True, 1)
    assert got[("a", 3)] == (10, True, 1)
    assert got[("a", 4)] == (40, False, 4)
    assert got[("a", 5)] == (40, True, 4)
    assert got[("b", 5)] == (7, True, 0)           # carried across the axis
    assert len(got) == 12


def test_locf_vs_scalar_reference_random(spark):
    import random as rnd

    from tilers_tools_spark.operators import temporal

    rng = rnd.Random(19)
    rows = []
    for e in range(8):
        for b in rng.sample(range(16), rng.randrange(1, 9)):
            rows.append((f"e{e}", b, rng.randrange(0, 50)))
    df = spark.createDataFrame(rows, "entity string, bin long, v long")
    got = {
        (r["entity"], r["bin"]): (r["v_filled"], r["filled"], r["src_bin"])
        for r in temporal.locf_fill(df, n_bins=16).collect()
    }
    obs = {}
    for e, b, v in rows:
        obs.setdefault(e, {})[b] = v
    for e, bins in obs.items():
        last = None
        for b in range(16):
            if b in bins:
                last = b
            ref = (
                (None, True, None) if last is None
                else (bins[last], b not in bins, last)
            )
            assert got[(e, b)] == ref, (e, b)


def test_locf_duplicate_and_validation(spark):
    import pytest as pt

    from tilers_tools_spark.operators import temporal

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 11)], "entity string, bin long, v long")
    with pt.raises(Exception, match="duplicate observation"):
        temporal.locf_fill(df, n_bins=4).collect()
    with pt.raises(ValueError):
        temporal.locf_fill(None, n_bins=1)
    with pt.raises(ValueError):
        temporal.locf_fill(None, n_bins=4097)
