"""Ring/polyline geometry metrics as pure Column HOF exprs — the
ST_Area / ST_Centroid / ST_Length / ST_Envelope role over geometry rows
stored as parallel coordinate arrays (the engine's ring shape). All
map-side, zero shuffle, zero Python: a 100 TB geometry table computes
its metrics in one narrow projection.

Formulas (ring given WITHOUT closing vertex; the wrap edge n-1 -> 0 is
included): signed shoelace area A = sum(x_i*y_j - x_j*y_i)/2 (positive
= counter-clockwise), polygon centroid Cx = sum((x_i+x_j)*cross_i)/(6A)
(Cy analog; undefined/null for |A| on the order of FP noise), perimeter
= sum hypot(dx, dy), bbox = array min/max (order-insensitive, exact).

Float determinism: the fold accumulations are LEFT-TO-RIGHT
(F.aggregate), so results are partitioning-independent; the DuckDB gate
compares order-free quantized-integer sums instead of raw double sums
(per-edge quantization, then integer SUM — see q_ring_metrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rot1(a: Column) -> Column:
    """Array rotated left by one (pairs each vertex with its successor,
    wrapping the last edge back to vertex 0)."""
    return F.concat(F.slice(a, 2, F.size(a) - 1), F.slice(a, 1, 1))


def edge_cross(xs: Column, ys: Column) -> Column:
    """array<double>: per-edge shoelace cross terms x_i*y_j - x_j*y_i."""
    xj, yj = _rot1(xs), _rot1(ys)
    a = F.zip_with(xs, yj, lambda x, y: x * y)
    b = F.zip_with(xj, ys, lambda x, y: x * y)
    return F.zip_with(a, b, lambda p, q: p - q)


def edge_length(xs: Column, ys: Column) -> Column:
    """array<double>: per-edge Euclidean lengths (wrap edge included)."""
    dx = F.zip_with(_rot1(xs), xs, lambda a, b: a - b)
    dy = F.zip_with(_rot1(ys), ys, lambda a, b: a - b)
    return F.zip_with(dx, dy, lambda a, b: F.sqrt(a * a + b * b))


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def ring_metrics(
    df: DataFrame, xs_col: str = "xs", ys_col: str = "ys"
) -> DataFrame:
    """Adds signed_area, perimeter, (cx, cy) centroid, and bbox columns."""
    xs, ys = F.col(xs_col), F.col(ys_col)
    cross = edge_cross(xs, ys)
    area2 = _fold_sum(cross)
    sx = _fold_sum(F.zip_with(F.zip_with(xs, _rot1(xs), lambda a, b: a + b), cross,
                              lambda s, c: s * c))
    sy = _fold_sum(F.zip_with(F.zip_with(ys, _rot1(ys), lambda a, b: a + b), cross,
                              lambda s, c: s * c))
    return (
        df.withColumn("signed_area", area2 / 2.0)
        .withColumn("perimeter", _fold_sum(edge_length(xs, ys)))
        .withColumn(
            "cx", F.when(F.abs(area2) > 1e-12, sx / (F.lit(3.0) * area2)).otherwise(F.lit(None))
        )
        .withColumn(
            "cy", F.when(F.abs(area2) > 1e-12, sy / (F.lit(3.0) * area2)).otherwise(F.lit(None))
        )
        .withColumn("xmin", F.array_min(xs))
        .withColumn("xmax", F.array_max(xs))
        .withColumn("ymin", F.array_min(ys))
        .withColumn("ymax", F.array_max(ys))
    )
