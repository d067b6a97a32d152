"""`gdal_translate` parity — windowed crop, resize, linear rescale
(reference checkout absent, SURVEY.md §0.1; capability follows the
GDAL-utility mandate, BASELINE.json:6).

Covers the gdal_translate workhorse flags as one distributed operator:
``-srcwin xoff yoff xsize ysize`` (integer crop, must lie fully inside
the raster — gdal_translate pads partially-outside windows with nodata
and warns; we raise instead, fail-loud), ``-outsize w h`` (nearest or
bilinear resampling under the documented center-mapping rule below) and
``-scale src_min src_max dst_min dst_max`` (linear map + clamp).

Resampling rule (documented, implementation-independent):
* the destination pixel (xd, yd) maps to source coordinate
  xs = (xd + 0.5) * xsize / out_w (same for y);
* nearest takes src index min(size-1, floor(xs)) — GDAL's block rule;
* bilinear samples at (xs - 0.5) with edge-replicate clamp — the same
  convention as point_sample/`gdallocationinfo`.
Every operation is elementwise IEEE float64, so a scalar per-pixel
replay of the formulas is bit-identical; the 1e-3-quantized summary
(NaN -> GRID_SENT sentinel) pins the md5 cross-engine.

Scale shape: per-raster independent Arrow pass (the gdal_translate unit
of work is one file); pixels never shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .zonal import GRID_SENT


def translate_np(
    a: np.ndarray,
    srcwin: tuple[int, int, int, int] | None = None,
    outsize: tuple[int, int] | None = None,
    resample: str = "nearest",
    scale: tuple[float, float, float, float] | None = None,
) -> np.ndarray:
    """Apply the gdal_translate pipeline to one float array:
    crop -> resize -> linear rescale (see module docstring)."""
    h, w = a.shape
    if srcwin is not None:
        xoff, yoff, xsize, ysize = (int(v) for v in srcwin)
        if xoff < 0 or yoff < 0 or xsize <= 0 or ysize <= 0 or xoff + xsize > w or yoff + ysize > h:
            raise ValueError(f"srcwin {srcwin} not fully inside raster {a.shape}")
        a = a[yoff : yoff + ysize, xoff : xoff + xsize]
        h, w = a.shape
    a = a.astype(np.float64)
    if outsize is not None:
        out_w, out_h = int(outsize[0]), int(outsize[1])
        if out_w <= 0 or out_h <= 0:
            raise ValueError(f"outsize {outsize} must be positive")
        xd = np.arange(out_w, dtype=np.float64)
        yd = np.arange(out_h, dtype=np.float64)
        xs = (xd + 0.5) * w / out_w
        ys = (yd + 0.5) * h / out_h
        if resample == "nearest":
            ci = np.minimum(w - 1, np.floor(xs).astype(np.int64))
            ri = np.minimum(h - 1, np.floor(ys).astype(np.int64))
            a = a[ri[:, None], ci[None, :]]
        elif resample == "bilinear":
            uu = xs - 0.5
            vv = ys - 0.5
            c0 = np.floor(uu).astype(np.int64)
            r0 = np.floor(vv).astype(np.int64)
            fc = (uu - c0)[None, :]
            fr = (vv - r0)[:, None]
            c0c = np.clip(c0, 0, w - 1)[None, :]
            c1c = np.clip(c0 + 1, 0, w - 1)[None, :]
            r0c = np.clip(r0, 0, h - 1)[:, None]
            r1c = np.clip(r0 + 1, 0, h - 1)[:, None]
            top = a[r0c, c0c] * (1.0 - fc) + a[r0c, c1c] * fc
            bot = a[r1c, c0c] * (1.0 - fc) + a[r1c, c1c] * fc
            a = top * (1.0 - fr) + bot * fr
        else:
            raise ValueError(f"unknown resample {resample!r} (nearest|bilinear)")
    if scale is not None:
        smin, smax, dmin, dmax = (float(v) for v in scale)
        if smax == smin:
            raise ValueError("scale src_min == src_max")
        a = dmin + (a - smin) * ((dmax - dmin) / (smax - smin))
        lo, hi = (dmin, dmax) if dmax >= dmin else (dmax, dmin)
        a = np.minimum(np.maximum(a, lo), hi)  # NaN passes through both
    return a


def raster_translate(
    images: DataFrame,
    srcwin: tuple[int, int, int, int] | None = None,
    outsize: tuple[int, int] | None = None,
    resample: str = "nearest",
    scale: tuple[float, float, float, float] | None = None,
    quant: float = 1e-3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """`gdal_translate` parity over a table of rasters: one summary row
    per raster — (image_id, out_w, out_h, n_nan, q_sum, q_min, q_max,
    grid_md5) of the translated grid quantized to ``quant`` (non-finite
    cells as GRID_SENT, counted in n_nan)."""
    import hashlib

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import tiffcodec

        for pdf in it:
            rows = []
            for iid, blob in zip(pdf[id_col], pdf[bytes_col]):
                a, _ = tiffcodec.decode_tiff(bytes(blob), scale_16bit=False)
                if a.ndim != 2:
                    raise ValueError("raster_translate expects single-band rasters")
                out = translate_np(a, srcwin, outsize, resample, scale)
                bad = ~np.isfinite(out)
                q = np.where(
                    bad, GRID_SENT, np.round(np.where(bad, 0.0, out) / quant)
                ).astype(np.int64)
                ok = q[~bad]
                rows.append(
                    (
                        iid, out.shape[1], out.shape[0], int(bad.sum()),
                        int(ok.sum()) if ok.size else 0,
                        int(ok.min()) if ok.size else 0,
                        int(ok.max()) if ok.size else 0,
                        hashlib.md5(np.ascontiguousarray(q).tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "out_w", "out_h", "n_nan", "q_sum", "q_min", "q_max", "grid_md5"],
            )

    return images.select(id_col, bytes_col).mapInPandas(
        fn,
        schema=f"{id_col} string, out_w int, out_h int, n_nan long, "
        "q_sum long, q_min long, q_max long, grid_md5 string",
    )
