"""Native Column expressions over H3/S2 cell ids (SURVEY.md §2.5).

Cell ASSIGNMENT needs the NumPy indexers (Arrow UDFs), but parent
truncation and friends are pure 64-bit bit math — expressed here as
Catalyst columns so multi-resolution rollups (counts per res 0..12, skew
probes at coarser cells, hierarchical joins) run fully JVM-side with
whole-stage codegen and map-side partial aggregation. Twins of
``h3lite.cell_to_parent`` / ``s2lite.parent`` (property-tested equal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import h3lite, s2lite

_H3_MAX_RES = h3lite.MAX_RES  # 15
_S2_MAX_LEVEL = s2lite.MAX_LEVEL  # 30


def h3_parent(cell, parent_res: int) -> Column:
    """h3lite cell -> ancestor at parent_res: swap the 4-bit res field and
    set all digits below parent_res to 7 (H3 h3ToParent semantics).
    Caller guarantees parent_res <= cell res (engine assigns fixed res/zoom).
    """
    c = F.col(cell) if isinstance(cell, str) else cell
    cleared = c.bitwiseAND(F.lit(~(0xF << 52)))
    with_res = cleared.bitwiseOR(F.lit(parent_res << 52))
    fill = 0
    for rr in range(parent_res + 1, _H3_MAX_RES + 1):
        fill |= 7 << (3 * (_H3_MAX_RES - rr))
    return with_res.bitwiseOR(F.lit(fill))


def h3_res(cell) -> Column:
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(c, 52).bitwiseAND(F.lit(0xF))


def h3_base_cell(cell) -> Column:
    c = F.col(cell) if isinstance(cell, str) else cell
    return F.shiftright(c, 45).bitwiseAND(F.lit(0x7F))


def s2_parent(cell, level: int) -> Column:
    """S2 parent: (c & -lsb) | lsb with lsb = 1 << 2*(30-level) [SPEC]."""
    c = F.col(cell) if isinstance(cell, str) else cell
    lsb = 1 << (2 * (_S2_MAX_LEVEL - level))
    return c.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def h3_rollup_counts(df: DataFrame, cell_col: str = "h3_cell", resolutions=(2, 5, 8)) -> DataFrame:
    """Multi-resolution cell histogram in one pass: explode each row to its
    ancestors at `resolutions` (JVM-side bit math), then one hash-agg.
    The skew probe / hypertable-rollup analog (SURVEY.md §4.3).
    """
    pairs = F.array(
        *[F.struct(F.lit(r).alias("res"), h3_parent(cell_col, r).alias("cell")) for r in resolutions]
    )
    return (
        df.select(F.explode(pairs).alias("rc"))
        .groupBy(F.col("rc.res").alias("res"), F.col("rc.cell").alias("cell"))
        .agg(F.count("*").alias("n"))
    )
