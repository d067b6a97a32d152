"""Encoded polyline (functions/polyline.py): the published Google KAT,
decode roundtrips, and Column exprs vs the scalar twin."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import polyline as pl

# the worked example from the published algorithm description
GOOGLE_PTS = [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]
GOOGLE_ENC = "_p~iF~ps|U_ulLnnqC_mqNvxq`@"


def test_published_kat_scalar():
    assert pl.encode_scalar(GOOGLE_PTS) == GOOGLE_ENC
    assert pl.decode_scalar(GOOGLE_ENC) == [
        (38.5, -120.2), (40.7, -120.95), (43.252, -126.453)
    ]


def test_decode_inverts_encode_random():
    rng = np.random.default_rng(6)
    for _ in range(30):
        n = int(rng.integers(1, 40))
        pts = [
            (float(la), float(lo))
            for la, lo in zip(rng.uniform(-85, 85, n), rng.uniform(-180, 180, n))
        ]
        s = pl.encode_scalar(pts)
        back = pl.decode_scalar(s)
        q = [(np.floor(a * 1e5 + 0.5) / 1e5, np.floor(b * 1e5 + 0.5) / 1e5) for a, b in pts]
        assert len(back) == len(pts)
        for (ba, bo), (qa, qo) in zip(back, q):
            assert abs(ba - qa) < 1e-9 and abs(bo - qo) < 1e-9


def test_column_matches_scalar(spark):
    rng = np.random.default_rng(8)
    rows = []
    for i in range(40):
        n = int(rng.integers(1, 25))
        rows.append(
            {
                "i": i,
                "lats": rng.uniform(-85, 85, n).tolist(),
                "lons": rng.uniform(-180, 180, n).tolist(),
            }
        )
    # include the published KAT as row 40
    rows.append(
        {
            "i": 40,
            "lats": [p[0] for p in GOOGLE_PTS],
            "lons": [p[1] for p in GOOGLE_PTS],
        }
    )
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {
        r["i"]: r["poly"]
        for r in df.select(
            "i", pl.polyline_encode(F.col("lats"), F.col("lons")).alias("poly")
        ).collect()
    }
    for row in rows:
        want = pl.encode_scalar(list(zip(row["lats"], row["lons"])))
        assert got[row["i"]] == want, row["i"]
    assert got[40] == GOOGLE_ENC
