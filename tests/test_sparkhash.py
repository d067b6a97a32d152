"""oracle/sparkhash (pure-Python XXH64 twin of F.xxhash64) pinned
bit-for-bit against Spark on every input path the golden generators use:
strings (all tail lengths), ints, longs, and multi-column seed chains."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from oracle import sparkhash as sh


@pytest.fixture(scope="module")
def rng():
    return random.Random(20260816)


def test_strings_match_spark(spark, rng):
    strs = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 33, "w" * 100, " " * 5]
    strs += ["".join(rng.choice("abcdef ghij\t") for _ in range(rng.randint(0, 200))) for _ in range(40)]
    df = spark.createDataFrame(pd.DataFrame({"s": strs}))
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [sh.xxhash64(("str", s)) for s in strs]


def test_ints_longs_match_spark(spark):
    ints = [0, 1, -1, 2**31 - 1, -(2**31), 42, 123456]
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 9973, -(5 << 60)]
    di = spark.createDataFrame(pd.DataFrame({"i": ints}), "i int")
    assert [r[0] for r in di.select(F.xxhash64("i")).collect()] == [
        sh.xxhash64(("int", i)) for i in ints
    ]
    dl = spark.createDataFrame(pd.DataFrame({"l": longs}), "l long")
    assert [r[0] for r in dl.select(F.xxhash64("l")).collect()] == [
        sh.xxhash64(("long", l)) for l in longs
    ]


def test_seed_chains_match_spark(spark):
    """Multi-column chains — the shapes minhash signatures and band keys
    use: xxhash64(lit(int), long...) and xxhash64(str, lit(int))."""
    longs = [0, 1, -1, 2**63 - 1, -(2**63), 9973, -(5 << 60)]
    df = spark.createDataFrame(
        pd.DataFrame({"l": longs, "sx": [str(x) for x in longs]}), "l long, sx string"
    )
    got = [r[0] for r in df.select(F.xxhash64(F.lit(3), "l")).collect()]
    assert got == [sh.xxhash64(("int", 3), ("long", l)) for l in longs]
    got2 = [r[0] for r in df.select(F.xxhash64("sx", F.lit(42))).collect()]
    assert got2 == [sh.xxhash64(("str", str(x)), ("int", 42)) for x in longs]
    # 5-value chain = the LSH band-key shape
    got3 = [
        r[0]
        for r in df.select(F.xxhash64(F.lit(1), "l", "l", "l", "l")).collect()
    ]
    assert got3 == [sh.xxhash64(("int", 1), *[("long", l)] * 4) for l in longs]


def test_full_registry_is_oracle_gated():
    """Every queries() entry now carries a DuckDB oracle (relational SQL or
    golden VALUES) — the driver's rows-only fallback should be unused."""
    from tilers_tools_spark.plans.queries import QUERIES

    missing = [name for name, (_fn, sql) in QUERIES.items() if sql is None]
    assert missing == [], missing


def test_xxh64_published_vectors():
    """Known-answer vectors from the published XXH64 spec (seed 0) — pins
    the byte-path against the ALGORITHM itself, independent of Spark."""
    assert sh.hash_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert sh.hash_bytes(b"abc", 0) == 0x44BC2CF5AD770999
