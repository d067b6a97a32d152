"""Merged (cross-image) pyramid with per-ZOOM idempotent resume —
the tiles_merge + overview role over many maps (SURVEY.md §2.4 row 24;
BASELINE.json:6 "any zoom level ... can resume idempotently").

Two stages, two resume granularities:

1. per-image pyramids via plans.tile_pyramid.run (part-range resume;
   shuffle-free render) -> the per-image `tiles` table, partitioned by z.
2. per zoom z (descending): read ONLY that zoom's partition (partition
   pruning), groupBy (x, y), composite colliding tiles src-over in
   image_id order (deterministic), append to `merged_tiles` + a
   checkpoint row with zoom=z. A killed run resumes at the first
   uncommitted zoom (left-anti on the checkpoint).

The merged set equals "merge of complete per-image pyramids" — exactly
the reference's tiles_merge over per-map tile sets; no cross-image mosaic
recursion is needed because every image contributes its own overviews.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions import codecs
from ..operators.convert import composite_over
from ..sources.catalog import Catalog
from . import tile_pyramid as tp

MERGED_TABLE = "merged_tiles"


def composite_zoom(tiles_z: DataFrame) -> DataFrame:
    """All per-image tiles of one zoom -> one tile per (x, y), src-over
    composited in ascending image_id order (later ids on top)."""

    # no type hints: a partially-hinted (key, pdf) signature trips pyspark's
    # pandas_udf eval-type inference into a UserWarning before it falls back
    # to the (correct) legacy applyInPandas path
    def fn(key, pdf):
        pdf = pdf.sort_values("image_id")
        acc = None
        for blob in pdf["tile"]:
            arr = codecs.to_rgba(codecs.decode_image(bytes(blob), "png"))
            acc = arr if acc is None else composite_over(acc, arr)
        return pd.DataFrame(
            {
                "z": [int(pdf["z"].iloc[0])],
                "x": [int(pdf["x"].iloc[0])],
                "y": [int(pdf["y"].iloc[0])],
                "tile": [codecs.encode_tile_png(acc)],
                "n_sources": [len(pdf)],
            }
        )

    return tiles_z.select("image_id", "z", "x", "y", "tile").groupBy("z", "x", "y").applyInPandas(
        fn, schema="z int, x long, y long, tile binary, n_sources int"
    )


def run(
    spark: SparkSession,
    images: DataFrame,
    cat: Catalog,
    run_id: str,
    n_parts: int = 8,
    overview_levels: int = 2,
    zmin: int | None = None,
    max_zooms: int | None = None,
) -> dict:
    """Stage 1 (part resume) + stage 2 (zoom resume). Returns metrics."""
    m1 = tp.run(spark, images, cat, run_id=f"{run_id}-s1", n_parts=n_parts, overview_levels=overview_levels, zmin=zmin)
    tiles = cat.read(tp.TILES_TABLE)
    zooms = sorted((r["z"] for r in tiles.select("z").distinct().collect()), reverse=True)
    if max_zooms is not None:
        zooms = zooms[:max_zooms]
    done = set()
    if cat.exists(tp.CHECKPOINT_TABLE):
        cp = cat.read(tp.CHECKPOINT_TABLE)
        done = {
            r["zoom"]
            for r in cp.filter(
                (F.col("run_id") == run_id) & (F.col("status") == "done") & (F.col("zoom") >= 0)
            ).select("zoom").collect()
        }
    # reconcile orphan merged batches (crash between merged append and its
    # checkpoint row — same window as tile_pyramid parts, same fix)
    orphans = cat.rollback_where(
        MERGED_TABLE, lambda t: t.get("run_id") == run_id and t.get("zoom") not in done
    )
    metrics = {"stage1": m1, "zooms_run": 0, "merged_tiles": 0, "orphans_rolled_back": orphans}
    for z in zooms:
        if z in done:
            continue
        t0 = time.time()
        obs = Observation(f"mz_{z}")
        merged = composite_zoom(tiles.filter(F.col("z") == z)).observe(
            obs, F.count(F.lit(1)).alias("n")
        )
        # single pass: the composite is expensive — observe the count on the
        # write instead of a separate count() action recomputing it
        cat.append(merged, MERGED_TABLE, partition_by=("z",), tag={"run_id": run_id, "zoom": int(z)})
        n = int(obs.get["n"])
        cp_df = spark.createDataFrame(
            [(run_id, f"z{z}", int(z), "done", n, n, t0, time.time())],
            "run_id string, part_id string, zoom int, status string, rows_in long, tiles_out long, started_ts double, finished_ts double",
        ).withColumn("part_id", F.lit(None).cast("int")).withColumn(
            "started_ts", F.col("started_ts").cast("timestamp")
        ).withColumn("finished_ts", F.col("finished_ts").cast("timestamp"))
        cat.append(cp_df, tp.CHECKPOINT_TABLE)
        metrics["zooms_run"] += 1
        metrics["merged_tiles"] += n
    return metrics
