"""Geohash column exprs (functions/geohash.py) vs an INDEPENDENT scalar
bisection implementation (the textbook algorithm, shares no code with the
engine's closed-form quantization) + the published 'ezs42' KAT."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tilers_tools_spark.functions import geohash as gh

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_bisect(lat: float, lon: float, precision: int) -> str:
    """Independent reference: classic interval-bisection geohash."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2.0
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2.0
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for j in range(precision):
        d = 0
        for b in bits[5 * j : 5 * j + 5]:
            d = d * 2 + b
        out.append(ALPHABET[d])
    return "".join(out)


def test_published_kat():
    # the canonical example from the original geohash.org announcement
    assert geohash_bisect(42.605, -5.603, 5) == "ezs42"
    assert gh.geohash_np(np.array([42.605]), np.array([-5.603]), 5)[0] == "ezs42"


def test_np_twin_matches_bisection():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-85.0, 85.0, 300)
    lon = rng.uniform(-180.0, 180.0, 300)
    for p in (1, 4, 5, 7, 12):
        got = gh.geohash_np(lat, lon, p)
        want = [geohash_bisect(la, lo, p) for la, lo in zip(lat, lon)]
        assert list(got) == want


def test_column_matches_np_twin_and_decode_roundtrips(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "i": np.arange(200),
            "lat": rng.uniform(-85.0, 85.0, 200),
            "lon": rng.uniform(-180.0, 180.0, 200),
        }
    )
    df = spark.createDataFrame(pdf)
    for p in (5, 9):
        enc = gh.geohash(df, p)
        dec = gh.from_geohash(enc, p)
        rows = dec.orderBy("i").collect()
        want = gh.geohash_np(pdf["lat"].values, pdf["lon"].values, p)
        lonbits, latbits = gh._splits(p)
        for r, w, la, lo in zip(rows, want, pdf["lat"], pdf["lon"]):
            assert r["geohash"] == w
            # decoded ints == direct quantization (decode∘encode == quantize)
            assert r["lon_int"] == min((1 << lonbits) - 1, int((lo + 180.0) / 360.0 * (1 << lonbits)))
            assert r["lat_int"] == min((1 << latbits) - 1, int((la + 90.0) / 180.0 * (1 << latbits)))
            # cell center re-encodes to the same hash (stability)
            assert gh.geohash_np(np.array([r["lat_c"]]), np.array([r["lon_c"]]), p)[0] == w


def test_prefix_truncation_is_ancestor(spark):
    # substring(geohash(p=9), 1, 5) == geohash(p=5): the scheme is
    # prefix-truncatable because lon/lat bit streams are MSB-aligned
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-85.0, 85.0, 100), "lon": rng.uniform(-180.0, 180.0, 100)}
    )
    df = spark.createDataFrame(pdf)
    both = gh.geohash(gh.geohash(df, 9, out_col="g9"), 5, out_col="g5")
    bad = both.where(F.substring("g9", 1, 5) != F.col("g5")).count()
    assert bad == 0


def test_edge_clamps():
    # poles / antimeridian land in the top cell, not out of range
    got = gh.geohash_np(np.array([90.0, -90.0]), np.array([180.0, -180.0]), 6)
    assert all(len(s) == 6 and set(s) <= set(ALPHABET) for s in got)
