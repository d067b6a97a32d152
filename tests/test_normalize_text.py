"""normalize_text (operators/text.py): hand-pinned Unicode/control/
whitespace cases (NFC composition, C0 strip keeping \\t..\\r, explicit
ASCII whitespace class, trim+lower order)."""

from __future__ import annotations

import pandas as pd

from tilers_tools_spark.operators import text as T


def test_hand_cases(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "Café",          # decomposed -> café
                    "Å B",            # ring -> å b
                    "x\x01\x02y\x7fz",      # controls stripped, no space added
                    "  Lots\t\tof\n\nWS  ", # collapse + trim
                    "KeepDigits 123!",
                ],
            }
        )
    )
    got = {
        r["doc_id"]: r["norm_text"]
        for r in T.normalize_text(docs).select("doc_id", "norm_text").collect()
    }
    assert got[1] == "café"
    assert got[2] == "å b"
    assert got[3] == "xyz"
    assert got[4] == "lots of ws"
    assert got[5] == "keepdigits 123!"
    # idempotence: normalizing the normalized text is a fixed point
    again = T.normalize_text(
        spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [got[1]]}))
    ).collect()[0]["norm_text"]
    assert again == got[1]
