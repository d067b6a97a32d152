"""gdal_calc parity — expression sandbox + hand-pinned algebra."""

from __future__ import annotations

import numpy as np
import pytest

from tilers_tools_spark.operators.rastercalc import compile_calc


def test_compile_calc_hand_pins():
    f = compile_calc("where(A > 1, A - B, A + B) * 2.0 + minimum(A, B)")
    a = np.array([0.0, 2.0])
    b = np.array([1.0, 1.0])
    # pixel0: A<=1 -> (0+1)*2 + 0 = 2 ; pixel1: A>1 -> (2-1)*2 + 1 = 3
    assert f({"A": a, "B": b}).tolist() == [2.0, 3.0]
    assert compile_calc("sqrt(abs(A))")({"A": np.array([-9.0])}).tolist() == [3.0]
    assert compile_calc("(A == B) + (A != B) * 5.0")(
        {"A": np.array([1.0, 1.0]), "B": np.array([1.0, 2.0])}
    ).tolist() == [1.0, 5.0]
    assert compile_calc("-A ** 2.0")({"A": np.array([3.0])}).tolist() == [-9.0]


@pytest.mark.parametrize(
    "bad",
    [
        "A.__class__",          # attribute access
        "A[0]",                 # subscript
        "__import__('os')",     # non-whitelisted call
        "eval('1')",
        "lambda: 1",
        "[A for A in [1]]",
        "A and B",              # BoolOp
        "1 if A else 2",        # IfExp
        "A < B < 2",            # chained comparison
        "'text'",               # non-numeric literal
        "True",
        "minimum(A, B, keepdims=1)",  # keywords
        "C + 1",                # unknown band at eval time
    ],
)
def test_compile_calc_rejects(bad):
    with pytest.raises((ValueError, SyntaxError)):
        compile_calc(bad)({"A": np.array([1.0]), "B": np.array([1.0])})


def test_raster_calc_operator(spark):
    """End to end: NaN and div-zero cells -> sentinel (counted in n_nan),
    quantized stats over the finite cells, shape mismatch raises."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators.rastercalc import raster_calc

    a = np.array([[1.0, np.nan], [4.0, 0.0]], np.float32)
    b = np.array([[1.0, 2.0], [0.0, 0.0]], np.float32)
    images = spark.createDataFrame(
        [("g", "A", tiffcodec.encode_tiff(a)), ("g", "B", tiffcodec.encode_tiff(b))],
        "image_id string, name string, bytes binary",
    )
    out = raster_calc(images, "A / B").toPandas().iloc[0]
    # 1/1=1 ; nan/2 -> sent ; 4/0 -> inf -> sent ; 0/0 -> nan -> sent
    assert out["n_pixels"] == 4 and out["n_nan"] == 3
    assert out["q_sum"] == 1000 and out["q_min"] == 1000 and out["q_max"] == 1000

    bad = spark.createDataFrame(
        [
            ("g", "A", tiffcodec.encode_tiff(a)),
            ("g", "B", tiffcodec.encode_tiff(np.ones((3, 3), np.float32))),
        ],
        "image_id string, name string, bytes binary",
    )
    with pytest.raises(Exception, match="shape"):
        raster_calc(bad, "A + B").toPandas()


def test_pansharpen_np_hand_pins():
    """ms pixel (10,20,30), equal weights -> pseudo=20; pan [[40,20],[10,0]]
    gives ratios [2,1,.5,0]; band0 = 10*ratio."""
    from tilers_tools_spark.operators.rastercalc import pansharpen_np

    ms = np.array([[[10.0, 20.0, 30.0]]])
    pan = np.array([[40.0, 20.0], [10.0, 0.0]])
    out = pansharpen_np(pan, ms, (1.0 / 3, 1.0 / 3, 1.0 / 3))
    assert out[:, :, 0].tolist() == [[20.0, 10.0], [5.0, 0.0]]
    assert out[:, :, 2].tolist() == [[60.0, 30.0], [15.0, 0.0]]

    # all-zero ms pixel -> pseudo 0 -> NaN out
    z = pansharpen_np(pan, np.zeros((1, 1, 3)), (1.0, 1.0, 1.0))
    assert np.isnan(z).all()

    with pytest.raises(ValueError, match="exactly 2x"):
        pansharpen_np(np.zeros((3, 2)), ms, (1.0, 1.0, 1.0))
    with pytest.raises(ValueError, match="weights"):
        pansharpen_np(pan, ms, (1.0, 1.0))


def test_pansharpen_operator(spark):
    import hashlib

    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators.rastercalc import pansharpen, pansharpen_np

    pan = np.arange(1.0, 17.0).reshape(4, 4).astype(np.float32)
    ms = (np.arange(12).reshape(2, 2, 3) * 10 + 5).astype(np.uint8)
    images = spark.createDataFrame(
        [
            ("s", "pan", tiffcodec.encode_tiff(pan)),
            ("s", "ms", tiffcodec.encode_tiff(ms)),
        ],
        "image_id string, role string, bytes binary",
    )
    out = pansharpen(images).toPandas().sort_values("band")
    ref = pansharpen_np(
        pan.astype(np.float64), ms.astype(np.float64), (1.0 / 3, 1.0 / 3, 1.0 / 3)
    )
    assert len(out) == 3
    for b in range(3):
        band = ref[:, :, b]
        q = np.round(band / 1e-3).astype(np.int64)
        assert out.iloc[b]["band_md5"] == hashlib.md5(q.tobytes()).hexdigest()
        assert out.iloc[b]["n_nan"] == 0

    missing = spark.createDataFrame(
        [("s", "pan", tiffcodec.encode_tiff(pan))],
        "image_id string, role string, bytes binary",
    )
    with pytest.raises(Exception, match="roles"):
        pansharpen(missing).toPandas()
