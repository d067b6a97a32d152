"""HyperLogLog sketch vs a scalar replica of the published algorithm
(FFGM 2007) + accuracy, merge-associativity, and small-range pins.

The scalar reference recomputes registers from hashlib.md5 directly and
the estimate with python floats in the engine's documented operand
order — so register indexing, rank, the exact-integer harmonic sum and
both correction branches are each cross-checked, not just the final
number."""

import math

import hashlib
import pandas as pd
import pytest

from tilers_tools_spark.operators import sketch


def _ref(keys, p=12):
    m = 1 << p
    maxrho = 60 - p + 1
    regs = {}
    for k in keys:
        h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
        j = h & (m - 1)
        w = h >> p
        rho = maxrho - w.bit_length() if w else maxrho
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (62 - r) for r in regs.values()) + (m - len(regs)) * (1 << 62)
    scaled = float(s)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * float(m) * float(m) * float(1 << 62) / scaled
    v = m - len(regs)
    est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    return regs, scaled, raw, int(math.floor(est + 0.5))


def _kdf(spark, keys):
    return spark.createDataFrame(pd.DataFrame({"key": [str(k) for k in keys]}))


def test_registers_match_scalar_replica(spark):
    keys = [f"item-{i % 700}" for i in range(3000)]
    regs, scaled, raw, est = _ref(keys)
    got_regs = {
        r["register"]: r["rho"] for r in sketch.hll_sketch(_kdf(spark, keys), "key").collect()
    }
    assert got_regs == regs
    row = sketch.hll_distinct(_kdf(spark, keys), "key").collect()[0]
    assert row["m"] == 4096 and row["nonzero"] == len(regs)
    assert row["v_zero"] == 4096 - len(regs)
    assert row["sum_scaled"] == scaled  # exact: decimal sum, one rounding
    assert row["raw_est"] == raw
    assert row["est"] == est


def test_accuracy_within_std_error(spark):
    true = 20000
    keys = [f"k{i}" for i in range(true)] * 2  # duplicates must not matter
    row = sketch.hll_distinct(_kdf(spark, keys), "key").collect()[0]
    # 1.04/sqrt(4096) = 1.6% standard error; allow 3 sigma
    assert abs(row["est"] - true) / true < 0.05


def test_small_range_linear_counting_exact(spark):
    # 10 distinct keys, collision-free at m=4096: linear counting rounds
    # back to exactly 10 (pinned; scalar replica agrees by construction)
    keys = [f"s{i}" for i in range(10)]
    row = sketch.hll_distinct(_kdf(spark, keys), "key").collect()[0]
    assert row["nonzero"] == 10 and row["est"] == 10
    _, _, _, est = _ref(keys)
    assert est == 10


def test_empty_estimates_zero(spark):
    import pyspark.sql.types as T

    empty = spark.createDataFrame([], T.StructType([T.StructField("key", T.StringType())]))
    row = sketch.hll_distinct(empty, "key").collect()[0]
    assert row["nonzero"] == 0 and row["v_zero"] == 4096 and row["est"] == 0


def test_merge_equals_union_sketch(spark):
    a = [f"a{i}" for i in range(800)]
    b = [f"b{i}" for i in range(600)] + a[:200]
    sa = sketch.hll_sketch(_kdf(spark, a), "key")
    sb = sketch.hll_sketch(_kdf(spark, b), "key")
    merged = {r["register"]: r["rho"] for r in sketch.hll_merge(sa, sb).collect()}
    direct = {
        r["register"]: r["rho"]
        for r in sketch.hll_sketch(_kdf(spark, a + b), "key").collect()
    }
    assert merged == direct
    e1 = sketch.hll_estimate(sketch.hll_merge(sa, sb)).collect()[0]
    e2 = sketch.hll_distinct(_kdf(spark, a + b), "key").collect()[0]
    assert e1 == e2


def test_p_validation_and_other_p(spark):
    with pytest.raises(ValueError):
        sketch.hll_sketch(_kdf(spark, ["x"]), "key", p=4)
    keys = [f"q{i}" for i in range(5000)]
    regs, scaled, raw, est = _ref(keys, p=8)
    row = sketch.hll_distinct(_kdf(spark, keys), "key", p=8).collect()[0]
    assert row["m"] == 256 and row["sum_scaled"] == scaled and row["raw_est"] == raw
    assert row["est"] == est


def _cms_ref(keys, probes, width=64, depth=3):
    """Scalar CM replica: same salted-md5 positions, same min rule."""
    grid = {}
    for key in keys:
        for r in range(depth):
            pos = int(hashlib.md5(f"{key}#cm{r}".encode()).hexdigest()[:15], 16) % width
            grid[(r, pos)] = grid.get((r, pos), 0) + 1
    return {
        q: min(
            grid.get(
                (r, int(hashlib.md5(f"{q}#cm{r}".encode()).hexdigest()[:15], 16) % width),
                0,
            )
            for r in range(depth)
        )
        for q in probes
    }


def test_cms_estimate_matches_scalar_and_never_underestimates(spark):
    from collections import Counter

    keys = [f"w{i % 37}" for i in range(1500)] + ["hot"] * 400
    truth = Counter(keys)
    probes = sorted(truth) + ["absent-key"]
    ref = _cms_ref(keys, probes, width=64, depth=3)
    cms = sketch.cms_build(_kdf(spark, keys), "key", width=64, depth=3)
    est = sketch.cms_estimate(
        _kdf(spark, probes), cms, "key", width=64, depth=3
    ).collect()
    got = {r["key"]: r["est"] for r in est}
    assert got == ref
    for k, t in truth.items():
        assert got[k] >= t  # one-sided error: CM never underestimates
    # a generous width makes the hot key exact
    cms2 = sketch.cms_build(_kdf(spark, keys), "key", width=1 << 14, depth=4)
    est2 = sketch.cms_estimate(_kdf(spark, ["hot"]), cms2, "key").collect()
    assert est2[0]["est"] == 400


def test_cms_merge_additivity(spark):
    a = [f"a{i % 9}" for i in range(300)]
    b = [f"a{i % 5}" for i in range(200)]
    ca = sketch.cms_build(_kdf(spark, a), "key", width=64, depth=3)
    cb = sketch.cms_build(_kdf(spark, b), "key", width=64, depth=3)
    merged = (
        ca.unionByName(cb).groupBy("row", "pos").agg(__import__("pyspark.sql.functions", fromlist=["x"]).sum("cnt").alias("cnt"))
    )
    direct = sketch.cms_build(_kdf(spark, a + b), "key", width=64, depth=3)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_cms_topk_heavy_hitters(spark):
    from collections import Counter

    keys = []
    for i in range(40):
        keys += [f"k{i:02d}"] * (200 - 5 * i)  # strictly decreasing counts
    rows = sketch.cms_topk(_kdf(spark, keys), "key", k=5, width=1 << 14, depth=4).collect()
    truth = Counter(keys)
    assert [r["key"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        "k00", "k01", "k02", "k03", "k04"
    ]
    for r in rows:
        assert r["est"] == truth[r["key"]]  # exact at this width


def test_cms_weighted_and_validation(spark):
    pdf = pd.DataFrame({"key": ["x", "y", "x"], "wgt": [10, 7, 5]})
    df = spark.createDataFrame(pdf)
    cms = sketch.cms_build(df, "key", width=64, depth=3, weight_col="wgt")
    est = sketch.cms_estimate(_kdf(spark, ["x", "y"]), cms, "key", width=64, depth=3)
    got = {r["key"]: r["est"] for r in est.collect()}
    assert got["x"] >= 15 and got["y"] >= 7
    with pytest.raises(ValueError):
        sketch.cms_build(df, "key", width=1)
