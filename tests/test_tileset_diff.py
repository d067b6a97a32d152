"""tileset_diff / tileset_patch (operators/diff.py) vs a brute-force dict
diff, plus the patch∘diff == identity round trip on random binary pyramids."""

import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tilers_tools_spark.operators import diff as tdiff  # noqa: E402

SCHEMA = StructType(
    [
        StructField("z", LongType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
        StructField("tile", BinaryType()),
    ]
)


def _rand_pyramid(rng, n_keys, p_member, seedbytes):
    """dict {(z,x,y): bytes} — membership and content randomized."""
    out = {}
    for i in range(n_keys):
        if rng.random() < p_member:
            z = int(rng.integers(3, 6))
            x = int(rng.integers(0, 2**z))
            y = int(rng.integers(0, 2**z))
            body = bytes(rng.integers(0, 256, size=8, dtype=np.uint8)) + seedbytes
            out[(z, x, y)] = body
    return out


def _df(spark, d):
    rows = [(z, x, y, b) for (z, x, y), b in sorted(d.items())]
    return spark.createDataFrame(rows, SCHEMA)


def _brute_diff(old, new):
    out = {}
    for k in new:
        if k not in old:
            out[k] = "added"
        elif old[k] != new[k]:
            out[k] = "changed"
    for k in old:
        if k not in new:
            out[k] = "removed"
    return out


@pytest.fixture(scope="module")
def pyramids():
    rng = np.random.default_rng(20260818)
    base = _rand_pyramid(rng, 400, 0.8, b"A")
    # new = base with random drops, edits, and additions
    new = {}
    for k, v in base.items():
        r = rng.random()
        if r < 0.15:
            continue  # removed
        if r < 0.35:
            new[k] = v + b"-edit"  # changed
        else:
            new[k] = v  # unchanged
    for k, v in _rand_pyramid(rng, 150, 0.6, b"B").items():
        if k not in base:
            new[k] = v  # added
    return base, new


def test_diff_matches_brute_force(spark, pyramids):
    old, new = pyramids
    got = {
        (r.z, r.x, r.y): r.status
        for r in tdiff.tileset_diff(_df(spark, old), _df(spark, new)).collect()
    }
    assert got == _brute_diff(old, new)


def test_diff_with_blobs_carries_new_side(spark, pyramids):
    old, new = pyramids
    rows = tdiff.tileset_diff(_df(spark, old), _df(spark, new), with_blobs=True).collect()
    for r in rows:
        k = (r.z, r.x, r.y)
        if r.status == "removed":
            assert r.tile is None
        else:
            assert bytes(r.tile) == new[k], (k, r.status)


def test_patch_of_diff_is_new(spark, pyramids):
    old, new = pyramids
    o, n = _df(spark, old), _df(spark, new)
    delta = tdiff.tileset_diff(o, n, with_blobs=True)
    patched = {
        (r.z, r.x, r.y): bytes(r.tile) for r in tdiff.tileset_patch(o, delta).collect()
    }
    assert patched == new


def test_empty_delta_on_identical_sets(spark, pyramids):
    old, _ = pyramids
    o = _df(spark, old)
    assert tdiff.tileset_diff(o, o).count() == 0
    # and patching with an empty delta is the identity
    empty = tdiff.tileset_diff(o, o, with_blobs=True)
    back = {(r.z, r.x, r.y): bytes(r.tile) for r in tdiff.tileset_patch(o, empty).collect()}
    assert back == old


def test_diff_shuffles_digests_not_blobs(spark, pyramids):
    """Plan shape: the classifying join's exchanges carry md5 digests, not
    the binary tile column (phase-1 of the two-phase contract)."""
    old, new = pyramids
    plan = tdiff.tileset_diff(_df(spark, old), _df(spark, new))._jdf.queryExecution().executedPlan().toString()
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "tile#" not in m.group(1)
