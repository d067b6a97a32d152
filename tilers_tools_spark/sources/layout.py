"""Locality-preserving physical layout for tile/point tables — where the
space-filling keys (functions/spacefill.py) pay off: a table PARTITIONED
by Hilbert bucket and SORTED by the full Hilbert key inside each file
makes every viewport/polygon query touch a handful of contiguous
buckets, so partition pruning + parquet row-group min/max stats skip
almost all of a 100 TB table. (Random or (z,x)-major layouts scatter a
viewport across most files — y-adjacent tiles land far apart.)

``write_locality_sorted`` writes it; ``viewport_scan`` issues the
pruned read for a bbox: bucket IN-list (partition pruning, driver-side
literals) + hilbert BETWEEN ranges (row-group stats) + the exact x/y
range re-filter. Hilbert guarantees each bucket is ONE contiguous key
range, so the IN-list stays short: a w x h tile viewport intersects
O(w*h / cells_per_bucket + perimeter) buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import spacefill as sf


def write_locality_sorted(
    tiles: DataFrame, path: str, z: int, bucket_shift: int = 8
) -> str:
    """Write (z, x, y TMS, ...) rows of one zoom as parquet partitioned
    by `hbucket` = hilbert >> bucket_shift (4^? cells per bucket) and
    sorted by `hilbert` within partitions. bucket_shift=8 -> 256 curve
    cells per bucket; tune so buckets land near the target file size."""
    d = sf.hilbert_key(tiles, z)
    d = d.withColumn("hbucket", F.shiftright(F.col("hilbert"), bucket_shift))
    (
        d.repartition("hbucket")
        .sortWithinPartitions("hilbert")
        .write.mode("overwrite")
        .partitionBy("hbucket")
        .parquet(path)
    )
    return path


def viewport_buckets(z: int, txmin: int, txmax: int, tymin: int, tymax: int,
                     bucket_shift: int = 8) -> list[int]:
    """Driver-side: the hbucket values a tile-range viewport touches
    (exact — enumerates the viewport's hilbert keys; viewports are
    thousands of tiles, a driver-trivial loop)."""
    import numpy as np

    xs, ys = np.meshgrid(
        np.arange(txmin, txmax + 1), np.arange(tymin, tymax + 1), indexing="ij"
    )
    d = sf.hilbert_np(xs.ravel(), ys.ravel(), z)
    return sorted(set((d >> bucket_shift).tolist()))


def viewport_scan(
    spark: SparkSession, path: str, z: int,
    txmin: int, txmax: int, tymin: int, tymax: int, bucket_shift: int = 8,
) -> DataFrame:
    """Pruned viewport read: bucket IN-list (partition-dir pruning) +
    exact x/y range refilter. Only the touched buckets' files are read —
    assert via df.inputFiles() in tests."""
    buckets = viewport_buckets(z, txmin, txmax, tymin, tymax, bucket_shift)
    d = spark.read.parquet(path).where(F.col("hbucket").isin(buckets))
    return d.where(
        (F.col("x") >= txmin) & (F.col("x") <= txmax)
        & (F.col("y") >= tymin) & (F.col("y") <= tymax)
    )
