"""`gdal_calc.py` parity — named-band raster algebra (reference checkout
absent, SURVEY.md §0.1; capability follows the GDAL-utility mandate,
BASELINE.json:6).

gdal_calc takes lettered inputs (-A a.tif -B b.tif) and a NumPy-ish
``--calc`` expression evaluated per pixel. Here the inputs are rows of a
long table (image_id, name, bytes) — every image_id groups the named
single-band rasters of one calc instance, so ONE Spark job runs the same
expression over millions of raster groups (the 100 TB shape: a cogroup-
free `applyInPandas` per image_id; raster bytes shuffle once to their
group and pixels never leave the task).

Expression safety/determinism: the expression is parsed with ``ast`` and
compiled against an explicit whitelist (names, numeric literals, + - *
/ **, unary -, chained-free comparisons, and the functions abs/minimum/
maximum/where/sqrt). Everything is elementwise IEEE float64 — no
reductions — so vectorized evaluation is bit-identical to a scalar
per-pixel evaluation of the same expression tree, and the 1e-3-quantized
summary contract is implementation-independent. Non-finite results
(NaN inputs propagating, division by zero) become the GRID_SENT
sentinel, counted in n_nan — auditable, never silent.
"""

from __future__ import annotations

import ast
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .zonal import GRID_SENT

_FUNCS = {
    "abs": np.abs,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "where": np.where,
    "sqrt": np.sqrt,
}

_BINOPS = {
    ast.Add: lambda a, b: a + b,
    ast.Sub: lambda a, b: a - b,
    ast.Mult: lambda a, b: a * b,
    ast.Div: lambda a, b: a / b,
    ast.Pow: lambda a, b: a**b,
}

_CMPOPS = {
    ast.Gt: lambda a, b: a > b,
    ast.Lt: lambda a, b: a < b,
    ast.GtE: lambda a, b: a >= b,
    ast.LtE: lambda a, b: a <= b,
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
}


def compile_calc(expr: str):
    """Parse a gdal_calc-style expression into an evaluator
    ``f(env: dict[str, ndarray|float]) -> ndarray|float``. Raises
    ValueError on any construct outside the whitelist (no attribute
    access, no subscripts, no lambdas — the AST walk is the sandbox).
    Comparisons yield float 0/1 under arithmetic, matching NumPy."""
    tree = ast.parse(expr, mode="eval")

    def ev(node, env):
        if isinstance(node, ast.Expression):
            return ev(node.body, env)
        if isinstance(node, ast.Constant):
            if isinstance(node.value, (int, float)) and not isinstance(node.value, bool):
                return float(node.value)
            raise ValueError(f"literal {node.value!r} not allowed")
        if isinstance(node, ast.Name):
            if node.id not in env:
                raise ValueError(f"unknown band {node.id!r}")
            return env[node.id]
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            return -ev(node.operand, env)
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            return _BINOPS[type(node.op)](ev(node.left, env), ev(node.right, env))
        if isinstance(node, ast.Compare):
            if len(node.ops) != 1 or type(node.ops[0]) not in _CMPOPS:
                raise ValueError("only single binary comparisons allowed")
            return _CMPOPS[type(node.ops[0])](
                ev(node.left, env), ev(node.comparators[0], env)
            )
        if isinstance(node, ast.Call):
            if (
                not isinstance(node.func, ast.Name)
                or node.func.id not in _FUNCS
                or node.keywords
            ):
                raise ValueError("only abs/minimum/maximum/where/sqrt calls allowed")
            return _FUNCS[node.func.id](*(ev(a, env) for a in node.args))
        raise ValueError(f"disallowed syntax: {ast.dump(node)[:60]}")

    def run(env):
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            return ev(tree, env)

    # validate eagerly against an empty probe so bad syntax fails at
    # driver time, not inside executors
    for n in ast.walk(tree):
        if isinstance(
            n,
            (ast.Attribute, ast.Subscript, ast.Lambda, ast.ListComp, ast.Dict,
             ast.List, ast.Tuple, ast.BoolOp, ast.IfExp, ast.Starred),
        ):
            raise ValueError(f"disallowed syntax: {type(n).__name__}")
    return run


def raster_calc(
    images: DataFrame,
    expr: str,
    quant: float = 1e-3,
    id_col: str = "image_id",
    name_col: str = "name",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_calc` parity: for every image_id group, decode its named
    single-band rasters (all shapes must match — loud error otherwise),
    evaluate ``expr`` per pixel in float64, and emit one summary row
    (image_id, n_pixels, n_nan, q_sum, q_min, q_max, grid_md5): q_* over
    FINITE cells quantized to ``quant``; the md5 covers the full
    quantized grid with non-finite cells as the GRID_SENT sentinel."""
    import hashlib

    run = compile_calc(expr)  # driver-time syntax validation

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions import tiffcodec

        iid = pdf[id_col].iloc[0]
        env = {}
        shape = None
        for name, blob in zip(pdf[name_col], pdf[bytes_col]):
            a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
            if a.ndim != 2:
                raise ValueError(f"raster_calc band {name!r} is not single-band")
            if shape is None:
                shape = a.shape
            elif a.shape != shape:
                raise ValueError(
                    f"raster_calc {iid!r}: band {name!r} shape {a.shape} != {shape}"
                )
            env[str(name)] = a.astype(np.float64)
        out = np.asarray(run(env), np.float64)
        if out.shape != shape:
            out = np.broadcast_to(out, shape).astype(np.float64)
        bad = ~np.isfinite(out)
        q = np.where(bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / quant)).astype(
            np.int64
        )
        ok = q[~bad]
        return pd.DataFrame(
            [
                (
                    iid,
                    int(q.size),
                    int(bad.sum()),
                    int(ok.sum()) if ok.size else 0,
                    int(ok.min()) if ok.size else 0,
                    int(ok.max()) if ok.size else 0,
                    hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                )
            ],
            columns=[id_col, "n_pixels", "n_nan", "q_sum", "q_min", "q_max", "grid_md5"],
        )

    return (
        images.select(id_col, name_col, bytes_col)
        .groupBy(id_col)
        .applyInPandas(
            fn,
            schema=f"{id_col} string, n_pixels long, n_nan long, "
            "q_sum long, q_min long, q_max long, grid_md5 string",
        )
    )


# ---------------------------------------------------------------------------
# gdal_pansharpen parity: weighted-Brovey fusion
# ---------------------------------------------------------------------------


def pansharpen_np(
    pan: np.ndarray, ms: np.ndarray, weights: tuple[float, ...]
) -> np.ndarray:
    """Weighted-Brovey pansharpening (the gdal_pansharpen default):
    pseudo_pan = sum(w_i * ms_i) / sum(w); out_i = ms_i * pan /
    pseudo_pan. The multispectral cube must be exactly half the pan
    resolution (H = 2*h, W = 2*w) and is upsampled NEAREST (each ms
    pixel covers its 2x2 pan block) — the one documented resampling
    (gdal_pansharpen bilinearly upsamples by default; nearest keeps the
    contract exact). Cells where pseudo_pan == 0 or any input is NaN
    come out NaN. Everything elementwise IEEE float64 — a scalar replay
    is bit-identical."""
    H, W = pan.shape
    h, w, nb = ms.shape
    if (H, W) != (2 * h, 2 * w):
        raise ValueError(f"pan {pan.shape} must be exactly 2x the ms {(h, w)}")
    if len(weights) != nb:
        raise ValueError(f"{nb} ms bands need {nb} weights, got {len(weights)}")
    up = np.repeat(np.repeat(ms.astype(np.float64), 2, axis=0), 2, axis=1)
    wsum = 0.0
    pseudo = np.zeros((H, W))
    for i, wi in enumerate(weights):  # fixed band order -> exact dyadic-free
        pseudo = pseudo + float(wi) * up[:, :, i]
        wsum = wsum + float(wi)
    pseudo = pseudo / wsum
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(pseudo != 0.0, pan.astype(np.float64) / pseudo, np.nan)
    return up * ratio[:, :, None]


def pansharpen(
    images: DataFrame,
    weights: tuple[float, ...] = (1.0 / 3, 1.0 / 3, 1.0 / 3),
    quant: float = 1e-3,
    id_col: str = "image_id",
    role_col: str = "role",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_pansharpen` parity: rows (image_id, role in {'pan','ms'},
    bytes) — per image_id, the single-band pan raster sharpens the
    3-band ms cube (see pansharpen_np). One summary row per output band:
    (image_id, band, n_pixels, n_nan, q_sum, q_min, q_max, band_md5),
    quantized like the rest of the zonal family (non-finite -> GRID_SENT
    sentinel inside the md5, counted in n_nan).

    Scale shape: one applyInPandas group per image_id (pan+ms bytes meet
    once; pixels never shuffle) — the gdal_pansharpen unit of work is
    per scene, embarrassingly parallel across scenes."""
    import hashlib

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions import tiffcodec

        iid = pdf[id_col].iloc[0]
        by_role = {}
        for role, blob in zip(pdf[role_col], pdf[bytes_col]):
            a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
            by_role[str(role)] = a
        if set(by_role) != {"pan", "ms"}:
            raise ValueError(f"pansharpen {iid!r}: need exactly roles pan+ms, got {sorted(by_role)}")
        pan, ms = by_role["pan"], by_role["ms"]
        if pan.ndim != 2 or ms.ndim != 3:
            raise ValueError(f"pansharpen {iid!r}: pan must be 2-D, ms 3-D")
        out = pansharpen_np(pan.astype(np.float64), ms.astype(np.float64), weights)
        rows = []
        for b in range(out.shape[2]):
            band = out[:, :, b]
            bad = ~np.isfinite(band)
            q = np.where(bad, GRID_SENT, np.round(np.where(bad, 0.0, band) / quant)).astype(np.int64)
            ok = q[~bad]
            rows.append(
                (
                    iid, b, int(q.size), int(bad.sum()),
                    int(ok.sum()) if ok.size else 0,
                    int(ok.min()) if ok.size else 0,
                    int(ok.max()) if ok.size else 0,
                    hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[id_col, "band", "n_pixels", "n_nan", "q_sum", "q_min", "q_max", "band_md5"],
        )

    return (
        images.select(id_col, role_col, bytes_col)
        .groupBy(id_col)
        .applyInPandas(
            fn,
            schema=f"{id_col} string, band int, n_pixels long, n_nan long, "
            "q_sum long, q_min long, q_max long, band_md5 string",
        )
    )
