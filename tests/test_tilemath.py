"""T0 — tile-math twins: Spark Column exprs must agree with the NumPy
oracle-side math (SURVEY.md §5.2 T0), plus the published-scheme invariants.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from oracle import minitiler as mt
from tilers_tools_spark.functions import tilemath as tm

RNG = np.random.default_rng(7)
N = 5000
LON = RNG.uniform(-180, 180, N)
LAT = RNG.uniform(-85, 85, N)
Z = RNG.integers(0, 23, N)


def test_constants():
    assert tm.ORIGIN == pytest.approx(20037508.342789244, abs=1e-6)
    assert tm.RES0 == pytest.approx(156543.03392804097, abs=1e-9)
    assert mt.ORIGIN == tm.ORIGIN and mt.RES0 == tm.RES0


def test_merc_roundtrip_np():
    mx, my = tm.merc_np(LON, LAT)
    lo, la = tm.inv_merc_np(mx, my)
    assert np.abs(lo - LON).max() < 1e-9
    assert np.abs(la - LAT).max() < 1e-9


def test_numpy_vs_oracle_scalar():
    mx, my = tm.merc_np(LON, LAT)
    for i in range(0, N, 499):
        omx, omy = mt.merc(LON[i], LAT[i])
        # np.tan/log (SIMD ufunc) vs math.tan/log (libm) differ by <= 1 ulp;
        # everything downstream of shared float64 inputs is bit-exact
        # (tests/test_pipeline_vs_oracle.py proves byte-identical tiles).
        assert mx[i] == omx
        assert my[i] == pytest.approx(omy, rel=2e-15, abs=1e-8)
        z = int(Z[i])
        otx, oty = tm.tile_xy_np(mx[i : i + 1], my[i : i + 1], np.array([z]))
        span = mt.res_at(z) * mt.TILE
        assert otx[0] == max(0, min(2**z - 1, math.floor((mx[i] + mt.ORIGIN) / span)))
        assert oty[0] == max(0, min(2**z - 1, math.floor((my[i] + mt.ORIGIN) / span)))


def test_column_twins_match_numpy(spark):
    pdf = pd.DataFrame({"lon": LON, "lat": LAT, "z": Z.astype("int32")})
    df = spark.createDataFrame(pdf)
    out = (
        df.select(
            "lon",
            "lat",
            "z",
            tm.merc_x("lon").alias("mx"),
            tm.merc_y("lat").alias("my"),
        )
        .select(
            "*",
            tm.tile_x(F.col("mx"), F.col("z")).alias("tx"),
            tm.tile_y_tms(F.col("my"), F.col("z")).alias("ty"),
            tm.tms_to_xyz(tm.tile_y_tms(F.col("my"), F.col("z")), F.col("z")).alias("ty_xyz"),
            tm.base_zoom(F.lit(100.0)).alias("zb"),
        )
        .toPandas()
    )
    mx, my = tm.merc_np(LON, LAT)
    tx, ty = tm.tile_xy_np(mx, my, Z)
    assert np.array_equal(out["mx"].to_numpy(), mx)
    # JVM Math.tan/log vs NumPy SIMD differ by <= 1 ulp -> my within 2e-15
    # rel, and tile indices may flip only at measure-zero tile boundaries
    # (the Python render path + oracle stay bit-identical; the Column twins
    # serve planning/statistics where a boundary ulp is harmless).
    assert np.allclose(out["my"].to_numpy(), my, rtol=2e-15, atol=1e-8)
    for got, want in ((out["tx"].to_numpy(), tx), (out["ty"].to_numpy(), ty)):
        neq = got != want
        assert neq.mean() < 1e-3, neq.sum()
        assert np.abs(got[neq] - want[neq]).max(initial=0) <= 1  # boundary flips only
    assert np.array_equal(out["ty_xyz"].to_numpy(), tm.tms_to_xyz_np(out["ty"].to_numpy(), Z))
    assert (out["zb"] == tm.base_zoom_np(np.array([100.0]))[0]).all()


def test_flip_involution():
    ty = RNG.integers(0, 2**20, 1000)
    z = np.full(1000, 20)
    assert np.array_equal(tm.tms_to_xyz_np(tm.tms_to_xyz_np(ty, z), z), ty)


def test_cover_rule_half_open():
    # extent edge exactly on a tile boundary must not include the neighbor
    z = np.array([10])
    span = tm.RES0 / 2.0**10 * 256
    mx0 = np.array([0.0])
    mx1 = np.array([span])  # exactly one tile wide starting at origin-center
    txmin, txmax, tymin, tymax = tm.cover_range_np(mx0, np.array([0.0]), mx1, np.array([span]), z)
    assert txmax[0] - txmin[0] == 0
    assert tymax[0] - tymin[0] == 0
    # and oracle agrees
    o = mt.cover(0.0, 0.0, float(span), float(span), 10)
    assert o == (txmin[0], txmax[0], tymin[0], tymax[0])


def test_base_zoom_rule():
    # res(z) <= gsd < res(z-1)
    gsd = np.array([16.0, 100.0, 1023.9, tm.RES0, tm.RES0 * 2])
    zb = tm.base_zoom_np(gsd)
    res = tm.RES0 / 2.0**zb
    assert (res <= gsd + 1e-9).all()
    ok = zb == 0
    res_coarser = tm.RES0 / 2.0 ** np.maximum(zb - 1, 0)
    assert ((res_coarser > gsd) | ok).all()
    for g, z in zip(gsd, zb):
        assert mt.base_zoom(float(g)) == z


def test_pack_zxy():
    z = np.array([5, 29])
    x = np.array([3, 2**29 - 1])
    y = np.array([7, 2**29 - 1])
    p = tm.pack_zxy_np(z, x, y)
    assert ((p >> 58) == z).all()
    assert (((p >> 29) & (2**29 - 1)) == x).all()
    assert ((p & (2**29 - 1)) == y).all()
