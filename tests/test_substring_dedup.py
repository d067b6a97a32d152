"""substring_dedup_stats (operators/dedup.py) — hand-computed window
census on a planted fixture (within-doc repeats, cross-doc repeats,
sub-window docs, unique windows)."""

from __future__ import annotations

import pandas as pd

from tilers_tools_spark.operators import dedup

P = "BOILERPLATE-BLOCK-0123456789-abcdefghij-"  # 40 chars
Y = "y" * 40
U = "unique-window-content-0123456789-abcdefg"[:40]  # 40 chars, occurs once


def test_hand_census(spark):
    assert len(P) == len(Y) == len(U) == 40
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    P + P + "x" * 30,  # 2 windows, both P -> dup
                    P + Y + "tail",    # P dup (with doc1), Y dup (with doc4)
                    "z" * 39,          # shorter than one window
                    Y + Y,             # within-doc repeat -> both dup
                    U + "rest",        # unique window -> not dup
                ],
            }
        )
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in dedup.substring_dedup_stats(docs, window=40).collect()
    }
    assert got[1]["n_windows"] == 2 and got[1]["n_dup_windows"] == 2
    assert got[2]["n_windows"] == 2 and got[2]["n_dup_windows"] == 2
    assert got[3]["n_windows"] == 0 and got[3]["n_dup_windows"] == 0
    assert got[3]["dup_char_frac"] == 0.0
    assert got[4]["n_windows"] == 2 and got[4]["n_dup_windows"] == 2
    assert got[5]["n_windows"] == 1 and got[5]["n_dup_windows"] == 0
    assert got[1]["dup_char_frac"] == 2 * 40.0 / 110.0
    assert got[4]["dup_char_frac"] == 1.0
    # doc 3 still present (left join keeps sub-window docs)
    assert got[3]["doc_len"] == 39
