"""BPE tokenizer (operators/text.py::bpe_train/bpe_encode): hand-worked
tiny-corpus KAT (the classic Sennrich example shape) and randomized
equivalence of the Column fold merge vs the scalar scan-and-skip rule."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.operators import text as T


def scan_merge(sym: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def test_hand_kat(spark):
    # corpus: "low low low lower lowest" — first merges must build 'lo'
    # then 'low' (freq 5 each, lexicographic tie-break l<o... verified by
    # hand: pairs(l,o)=5, (o,w)=5, (w,</w>)=3, (w,e)=2, ...
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["low low low lower lowest"]})
    )
    merges = T.bpe_train(docs, num_merges=3)
    assert [(m[0], m[1]) for m in merges][:2] == [("l", "o"), ("lo", "w")]
    assert merges[0][2] == 5 and merges[1][2] == 5
    # third merge: 'low' + '</w>' (freq 3) beats 'low'+'e' (freq 2)
    assert (merges[2][0], merges[2][1], merges[2][2]) == ("low", "</w>", 3)
    enc = T.bpe_encode(docs, merges).collect()[0]
    # low -> [low</w>] x3; lower -> low,e,r,</w>; lowest -> low,e,s,t,</w>
    assert enc["n_tokens"] == 3 * 1 + 4 + 5
    assert enc["tokens"][:4] == ["low</w>", "low</w>", "low</w>", "low"]


def test_fold_matches_scan(spark):
    rng = np.random.default_rng(9)
    syms = ["a", "b", "ab", "c"]
    rows = [[syms[i] for i in rng.integers(0, 4, rng.integers(1, 12))] for _ in range(80)]
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(rows)), "sym": rows}))
    for a, b in (("a", "b"), ("a", "a"), ("ab", "c"), ("b", "ab")):
        got = (
            df.select("i", T._bpe_merge_expr(F.col("sym"), a, b).alias("m"))
            .orderBy("i")
            .collect()
        )
        for r, sym in zip(got, rows):
            assert list(r["m"]) == scan_merge(sym, a, b), (sym, a, b)


def test_encode_memo_and_empty(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", "  ", "aa aa"]})
    )
    out = {r["doc_id"]: r for r in T.bpe_encode(docs, [("a", "a")]).collect()}
    assert out[1]["n_tokens"] == 0 and out[2]["n_tokens"] == 0
    assert list(out[3]["tokens"]) == ["aa", "</w>", "aa", "</w>"]
