"""tileset_check (operators/check.py) vs a scalar Python reference over
randomized key sets with injected duplicates, out-of-grid keys (incl.
negatives), orphans, and a whole missing zoom level."""

import os
import sys
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tilers_tools_spark.operators import check as tcheck  # noqa: E402


def _brute(keys):
    """keys: list of (z,x,y) -> set of (issue, z, x, y)."""
    out = set()
    counts = Counter(keys)
    for k, n in counts.items():
        if n > 1:
            out.add(("dup_key",) + k)
    dk = set(keys)
    ok = set()
    for z, x, y in dk:
        if 0 <= x < 2**z and 0 <= y < 2**z:
            ok.add((z, x, y))
        else:
            out.add(("key_range", z, x, y))
    if ok:
        minz = min(z for z, _, _ in ok)
        for z, x, y in ok:
            if z > minz and (z - 1, x >> 1, y >> 1) not in ok:
                out.add(("orphan_child", z, x, y))
    return out


def _run(spark, keys):
    df = spark.createDataFrame(keys, "z long, x long, y long")
    return {(r["issue"], r["z"], r["x"], r["y"]) for r in tcheck.tileset_check(df).collect()}


def test_random_keys_match_brute_force(spark):
    rng = np.random.default_rng(42)
    keys = []
    for _ in range(300):
        z = int(rng.integers(3, 7))
        keys.append((z, int(rng.integers(0, 2**z)), int(rng.integers(0, 2**z))))
    # inject: dups, range violations (incl. negative), orphan holes
    keys += keys[:17]
    keys += [(4, 16, 2), (5, 3, -1), (3, -2, 70)]
    assert _run(spark, keys) == _brute(keys)


def test_missing_level_reports_every_child(spark):
    """z=3 base plus z=5 children and NO z=4 level: every z=5 key is an
    orphan (zoom-out hits the hole) regardless of the z=3 coverage."""
    keys = [(3, x, y) for x in range(8) for y in range(8)]
    keys += [(5, x, y) for x in range(4) for y in range(4)]
    got = _run(spark, keys)
    assert got == {("orphan_child", 5, x, y) for x in range(4) for y in range(4)}
    assert got == _brute(keys)


def test_clean_pyramid_is_silent(spark):
    keys = []
    for z in (2, 3, 4):
        keys += [(z, x, y) for x in range(2**z) for y in range(2**z)]
    assert _run(spark, keys) == set()


def test_keyspace_only_plan(spark):
    """The lint never touches the blob column: no exchange carries `tile`."""
    keys = [(3, x, y, b"B" * 64) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(keys, "z long, x long, y long, tile binary")
    plan = tcheck.tileset_check(df)._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "tile#" not in m.group(1)
