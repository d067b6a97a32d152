"""Table-layout optimization — Hilbert-clustered rewrite (the OPTIMIZE
ZORDER analogue for the tile/point tables this engine owns).

Why it exists: a 100 TB tile table is written in INGEST order (time
order), which is spatially random — so a viewport or polygon query
overlaps essentially every parquet row group and min/max column stats
prune nothing. Rewriting the table ordered by one space-filling-curve
key (functions/spacefill.py — Hilbert: consecutive keys are always grid
neighbors) makes every row group a compact spatial block, so the SAME
footer stats now prune almost everything. This module is the rewrite +
the audit that PROVES the pruning, not just claims it:

* ``cluster_write`` — the scale path: ``repartitionByRange`` on the
  Hilbert key (Spark's range partitioner samples the key distribution,
  so output files are balanced even under coastline/urban skew — the
  exact failure mode of naive fixed-width key ranges) then
  ``sortWithinPartitions`` and a parquet write with bounded
  ``maxRecordsPerFile``. One shuffle, no UDF, no driver data movement.
* ``rowgroup_extents`` — driver-side FOOTER scan (pyarrow parquet
  metadata only; never reads data pages): per row group, the min/max
  statistics of the x/y columns — exactly what Spark/Iceberg/DuckDB
  range pruning consults.
* ``pruning_ratio`` — fraction of row groups a rectangular viewport
  must read under those stats. The pytest pins the real claim:
  ingest-order layout reads ~100% of row groups for a small viewport,
  Hilbert layout reads a handful.
* ``bucket_extents`` — the gate-able audit report: split the keyspace
  into ``buckets`` equal-count buckets (ntile over the Hilbert order)
  and emit each bucket's tile count + x/y extents + covered-cell count.
  Compact extents = compact row groups. The DuckDB oracle replays the
  Hilbert unroll CTE-for-select and the same ntile (both engines
  implement standard SQL ntile; the Hilbert key is a bijection so the
  order is total and the split deterministic).

Scale note: ``bucket_extents`` uses a global-order window (single
partition sort) because it is an AUDIT over distinct tile keys — small
by construction. The data rewrite itself (``cluster_write``) never
globally sorts: range-partition + local sort is the distributed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import spacefill


def cluster_write(
    df: DataFrame,
    out_path: str,
    z: int,
    n_files: int = 8,
    x_col: str = "x",
    y_col: str = "y",
    max_records_per_file: int = 0,
    keep_key: bool = False,
) -> None:
    """Rewrite ``df`` to ``out_path`` clustered by the Hilbert key of
    (x_col, y_col) on the 2^z grid: range-repartition on the key (sampled
    boundaries -> balanced files under skew), sort within each partition,
    write parquet. ``max_records_per_file`` additionally bounds row-group
    granularity (0 = Spark default)."""
    keyed = spacefill.hilbert_key(df, z, x_col, y_col, out_col="_hkey")
    out = (
        keyed.repartitionByRange(n_files, F.col("_hkey"))
        .sortWithinPartitions("_hkey")
    )
    if keep_key:
        out = out.withColumnRenamed("_hkey", "hilbert")
    else:
        out = out.drop("_hkey")
    w = out.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    w.parquet(out_path)


def rowgroup_extents(path: str, x_col: str = "x", y_col: str = "y") -> list[dict]:
    """Per-row-group [min, max] stats of the x/y columns from parquet
    FOOTERS only (pyarrow metadata; zero data pages read) — the same
    numbers Spark's scan, Iceberg manifests, and DuckDB zone maps prune
    on. Returns [{file, rg, n, min_x, max_x, min_y, max_y}, ...]."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files and os.path.isfile(path):
        files = [path]
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        xi, yi = names[x_col], names[y_col]
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sx, sy = g.column(xi).statistics, g.column(yi).statistics
            if sx is None or sy is None:  # stats disabled -> nothing prunes
                raise ValueError(f"{f} row group {rg} has no column statistics")
            out.append({
                "file": os.path.basename(f), "rg": rg, "n": g.num_rows,
                "min_x": sx.min, "max_x": sx.max,
                "min_y": sy.min, "max_y": sy.max,
            })
    return out


def pruning_ratio(
    path: str,
    viewport: tuple[int, int, int, int],
    x_col: str = "x",
    y_col: str = "y",
) -> dict:
    """How much of the table a rectangular viewport (x0, y0, x1, y1,
    inclusive) must READ under footer min/max pruning: overlapping and
    total row-group counts + the read fraction."""
    x0, y0, x1, y1 = viewport
    groups = rowgroup_extents(path, x_col, y_col)
    hit = [
        g for g in groups
        if g["max_x"] >= x0 and g["min_x"] <= x1
        and g["max_y"] >= y0 and g["min_y"] <= y1
    ]
    return {
        "row_groups": len(groups),
        "overlapping": len(hit),
        "rows_total": sum(g["n"] for g in groups),
        "rows_scanned": sum(g["n"] for g in hit),
        "read_fraction": (len(hit) / len(groups)) if groups else 0.0,
    }


def bucket_extents(
    tiles: DataFrame,
    z: int,
    buckets: int = 16,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Audit report for a Hilbert clustering of ``tiles`` (distinct tile
    coords expected): equal-count keyspace buckets (standard-SQL ntile
    over the Hilbert order — deterministic, the key is a bijection) with
    per-bucket count, x/y extents and covered-cell count. Small-input
    audit op: the global-order window is intentional (see module doc)."""
    keyed = spacefill.hilbert_key(tiles, z, x_col, y_col, out_col="_hkey")
    b = keyed.withColumn(
        "bucket", F.ntile(buckets).over(Window.orderBy("_hkey")).cast("bigint"))
    return (
        b.groupBy("bucket").agg(
            F.count("*").alias("n"),
            F.min(x_col).alias("min_x"), F.max(x_col).alias("max_x"),
            F.min(y_col).alias("min_y"), F.max(y_col).alias("max_y"),
        )
        .withColumn(
            "extent_cells",
            ((F.col("max_x") - F.col("min_x") + 1)
             * (F.col("max_y") - F.col("min_y") + 1)).cast("bigint"),
        )
    )
