"""Focused pins for the r06 optimization-round physical restructures.

Each optimization left results bit-identical by construction; these tests
pin the internals the restructure touched, beyond the DuckDB gate:

* order_statistic: the B-ary multi-k bucketed search (one census job per
  round instead of one count per bisection probe) against a sorted
  reference, including negative values, heavy duplicates and a span wide
  enough that a double-precision bucket index would misplace values
  (the implementation must use integer DIV).
* connected_components: the composed double-compression + deferred label
  relabeling against a brute-force union-find on a random graph, and a
  pointer-chain shape (descending path) that needs full fixed-point
  compression within a round.
* charlm_score: the row-generated trigram census (explode+substring
  instead of a HOF array) against a scalar Python counter.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.operators import dedup, sketch, text


def test_order_statistic_wide_span_and_duplicates(spark):
    rng = random.Random(606)
    # wide span: beyond 2^53 so float bucketing would misplace boundaries
    vals = [rng.randint(-(2**61), 2**61) for _ in range(500)]
    vals += [vals[7]] * 40 + [vals[11]] * 17  # heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    srt = sorted(vals)
    ks = [1, 2, 57, len(vals) // 2, len(vals) - 1, len(vals)]
    got = {r["k"]: r["value"] for r in sketch.order_statistic(df, ks=ks).collect()}
    assert got == {k: srt[k - 1] for k in ks}


def test_order_statistic_constant_column(spark):
    df = spark.createDataFrame([(42,)] * 9, "v long")
    got = {r["k"]: r["value"] for r in sketch.order_statistic(df, ks=[1, 5, 9]).collect()}
    assert got == {1: 42, 5: 42, 9: 42}


def test_connected_components_random_vs_union_find(spark):
    rng = random.Random(1606)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for i in range(n):
        r = find(i)
        want.setdefault(r, []).append(i)
    expect = {i: min(members) for r, members in want.items() for i in members}

    epdf = spark.createDataFrame(edges, "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r["comp"] for r in
           dedup.connected_components(epdf, nodes, id_col="id").collect()}
    assert got == expect


def test_connected_components_descending_path(spark):
    # pointer chains all point downward: 0-1, 1-2, ..., needs the inner
    # fixed-point compression to fully resolve before contraction retires
    # supernodes — the shape the composed double pass must not break
    n = 65
    edges = [(i, i + 1) for i in range(n - 1)]
    epdf = spark.createDataFrame(edges, "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    got = {r["id"]: r["comp"] for r in
           dedup.connected_components(epdf, nodes, id_col="id").collect()}
    assert got == {i: 0 for i in range(n)}


def test_hll_estimate_p_mismatch_fails_loud(spark):
    # ADVICE r05: estimating a p=14 sketch under the default p=12 must
    # raise, not silently return garbage (registers >= 2^12 prove the
    # sketch was built with a larger p)
    df = spark.createDataFrame([(i,) for i in range(20000)], "k long")
    sk14 = sketch.hll_sketch(df, "k", p=14)
    with pytest.raises(Exception, match="hll_estimate"):
        sketch.hll_estimate(sk14, p=12).collect()
    # matching p still estimates within the published error bound
    est = sketch.hll_estimate(sketch.hll_sketch(df, "k", p=12), p=12).collect()[0]
    assert abs(est["est"] - 20000) / 20000 < 0.05


def test_charlm_trigram_census_scalar_reference(spark):
    import collections
    import math
    import re

    docs = [
        (0, "The cat SAT on the mat!"),
        (1, "ab"),          # < 3 normalized chars -> drops out
        (2, "zz  zz 99"),
        (3, ""),
        (4, "the cat sat"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.charlm_score(df).collect()}

    # scalar model: identical normalize + trigram + add-1 rule
    norm = {i: re.sub(r"[^a-z0-9]+", " ", t.lower()).strip() for i, t in docs}
    tri = {i: [s[j:j + 3] for j in range(len(s) - 2)] for i, s in norm.items() if len(s) >= 3}
    c3 = collections.Counter(t for ts in tri.values() for t in ts)
    c2 = collections.Counter()
    for t, c in c3.items():
        c2[t[:2]] += c
    assert set(got) == set(tri)
    for i, ts in tri.items():
        bits = sum(-math.log2((c3[t] + 1.0) / (c2[t[:2]] + 37.0)) for t in ts) / len(ts)
        assert got[i]["n_trigrams"] == len(ts)
        assert got[i]["bits_per_char"] == pytest.approx(bits, rel=1e-12)


def test_pmtiles_write_arrow_and_streaming_paths_byte_identical(spark, tmp_path, monkeypatch):
    """write_pmtiles r06 fast path: when the archive fits the driver
    budget the sorted frame is fetched as one Arrow table instead of the
    row-at-a-time toLocalIterator. Both paths must emit the IDENTICAL
    archive bytes — same dedup runs, same directories, same header."""
    from tilers_tools_spark.sources import pmtiles as pmt

    rows = []
    for z, n in ((3, 8), (4, 16)):
        for x in range(n):
            for y in range(0, n, 2):
                blob = b"SEA" if (x + y) % 5 == 0 else f"{z}/{x}/{y}".encode()
                rows.append((z, x, y, bytearray(blob)))
    df = spark.createDataFrame(rows, "z int, x int, y int, tile binary")

    monkeypatch.setenv("TILERS_PMTILES_ARROW_MAX_MB", "512")
    p_fast = pmt.write_pmtiles(df, str(tmp_path / "fast.pmtiles"),
                               metadata={"name": "t"}, max_root_entries=8, leaf_size=4)
    monkeypatch.setenv("TILERS_PMTILES_ARROW_MAX_MB", "0")
    p_slow = pmt.write_pmtiles(df, str(tmp_path / "slow.pmtiles"),
                               metadata={"name": "t"}, max_root_entries=8, leaf_size=4)
    fast = open(p_fast, "rb").read()
    slow = open(p_slow, "rb").read()
    assert fast == slow and len(fast) > 0
