"""E1' — the flagship pipeline: images table -> tiles table with lineage +
idempotent resume (SURVEY.md §3.2, BASELINE.json:6).

Stages:
  1. plan: split the images scan into part ranges (pmod(xxhash64(image_id), P))
  2. resume: left-anti join planned parts against checkpoint 'done' rows
  3. render: shuffle-free mapInPandas pyramid per image (operators/render.py)
  4. cluster: salted repartition on (zoom, h3_cell) for the sink (BASELINE.json:6)
  5. sink: atomic append per part batch (Iceberg or manifest-parquet fallback)
  6. lineage: df.observe counters -> checkpoint rows (rows_in, tiles_out)

Idempotency: a part either commits (tiles batch + 'done' checkpoint row) or
leaves nothing visible; re-running the same run_id skips done parts
(left-anti), so a kill-after-zoom-k rerun yields a byte-identical table
(tested in tests/test_resume.py, T3).

Crash window between the two appends (tiles committed, checkpoint row not):
every tiles batch is tagged (run_id, part_id); on (re)start, run() rolls
back orphan batches — tagged for this run but not marked done — before
re-rendering, so on the manifest-parquet path the rerun cannot duplicate
(image_id,z,x,y) rows. The Iceberg path does NOT reconcile here
(Catalog.rollback_where warns and returns 0): that deployment must roll
back orphan snapshots via the snapshot-summary tag, or close the window
with a single multi-table transaction.

Input scanning: with `stage_input` (default) the planned input is written
ONCE partitioned by part_id; each part's job then reads only its partition
directory (partition pruning) instead of re-scanning the full images input
P times — at 10^12 rows, P full scans is the difference between one pass
and hundreds.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.explode import salt_column
from ..operators.render import render_pyramid, render_pyramid_geodetic
from ..sources.catalog import Catalog

TILES_TABLE = "tiles"
CHECKPOINT_TABLE = "checkpoint"


def plan_parts(images: DataFrame, n_parts: int) -> DataFrame:
    """Deterministic part assignment on image_id (narrow, no shuffle)."""
    return images.withColumn("part_id", F.pmod(F.xxhash64("image_id"), F.lit(n_parts)).cast("int"))


def done_parts(cat: Catalog, run_id: str) -> DataFrame:
    if not cat.exists(CHECKPOINT_TABLE):
        return cat.spark.createDataFrame([], "part_id int")
    cp = cat.read(CHECKPOINT_TABLE)
    return cp.filter((F.col("run_id") == run_id) & (F.col("status") == "done")).select("part_id").distinct()


def run(
    spark: SparkSession,
    images: DataFrame,
    cat: Catalog,
    run_id: str,
    n_parts: int = 8,
    overview_levels: int = 2,
    resampling: str = "average",
    base_resampling: str = "bilinear",
    zmin: int | None = None,
    salt_factor: int = 8,
    sink_partitions: int | None = None,
    max_parts: int | None = None,
    stage_input: bool = True,
    profile: str = "mercator",
) -> dict:
    """Execute the pyramid for every not-yet-done part. Returns metrics.

    `max_parts` stops after that many part commits (used by the T3 resume
    test to simulate a mid-run kill between atomic part batches).
    `stage_input=False` skips the partitioned staging write (single-part
    runs or inputs already partitioned by part).
    `profile` selects the tile grid: "mercator" (EPSG:3857, default) or
    "geodetic" (global-geodetic plate-carree, gdal2tiles --profile
    geodetic) — pinned per run_id by the plan guard, because resuming a
    run under the other grid would commit tiles with incompatible keys.
    """
    if profile not in ("mercator", "geodetic"):
        raise ValueError(f"profile must be 'mercator' or 'geodetic', got {profile!r}")
    # plan guard: 'done' checkpoint markers are keyed (run_id, part_id) and
    # only valid under the pmod modulus they were written with. A one-row
    # plan table pins n_parts per run_id forever (kept after completion:
    # re-running a finished run with a LARGER n_parts would otherwise
    # re-render phantom parts and duplicate tiles). Mismatched resume is
    # refused loudly instead of silently rendering wrong subsets.
    # (Single-driver assumption per run_id — concurrent first calls racing
    # the plan append are out of scope, like concurrent part renders.)
    done_ids = {r["part_id"] for r in done_parts(cat, run_id).collect()}
    plan_tbl = f"_run_plan_{run_id}"
    if cat.exists(plan_tbl):
        plan_row = cat.read(plan_tbl).first().asDict()
        prev = int(plan_row["n_parts"])
        if prev != n_parts:
            raise ValueError(
                f"run_id {run_id!r} was started with n_parts={prev}; resuming with "
                f"n_parts={n_parts} would reuse 'done' markers from a different partition "
                f"modulus (wrong/duplicate image subsets). Resume with n_parts={prev} or "
                f"use a new run_id."
            )
        # plan rows written before the geodetic profile existed lack the
        # column; those runs were necessarily mercator
        prev_profile = plan_row.get("profile") or "mercator"
        if prev_profile != profile:
            raise ValueError(
                f"run_id {run_id!r} was started with profile={prev_profile!r}; resuming "
                f"with profile={profile!r} would mix tile grids in one run. Resume with "
                f"profile={prev_profile!r} or use a new run_id."
            )
    elif done_ids:
        # done markers WITHOUT a plan record (run started before the guard
        # existed): the original modulus is unknowable, so backfilling from
        # the current call would legitimize exactly the mismatch the guard
        # exists to refuse
        raise ValueError(
            f"run_id {run_id!r} has 'done' checkpoint markers but no plan record; "
            f"its original n_parts cannot be verified. Use a new run_id (or create "
            f"{plan_tbl} with the original n_parts manually)."
        )
    else:
        cat.append(
            spark.createDataFrame([(n_parts, profile)], "n_parts int, profile string"), plan_tbl
        )
    planned = plan_parts(images, n_parts)
    all_parts = sorted(r["part_id"] for r in planned.select("part_id").distinct().collect())
    # reconcile: roll back orphan tiles batches (committed tiles whose part
    # never reached 'done' — crash between the data and checkpoint appends)
    orphans = cat.rollback_where(
        TILES_TABLE, lambda t: t.get("run_id") == run_id and t.get("part_id") not in done_ids
    )
    todo_parts = [p for p in all_parts if p not in done_ids]
    if max_parts is not None:
        todo_parts = todo_parts[:max_parts]
    metrics = {"parts_run": 0, "rows_in": 0, "tiles_out": 0, "orphans_rolled_back": orphans}
    shuffle_n = sink_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # key the staging table by n_parts as well as run_id: resuming the same
    # run_id with a different n_parts must NOT reuse part_id assignments
    # computed under the old pmod modulus (parts would silently render the
    # wrong image subsets and still commit 'done')
    staging_table = f"_staged_images_{run_id}_p{n_parts}" if stage_input else None
    # use staging when several parts remain (one write, P pruned reads) OR
    # when a previous attempt already staged (a resumed run with one part
    # left must still read its pruned slice — and the table must still get
    # dropped on completion)
    if staging_table is not None and (len(todo_parts) > 1 or cat.exists(staging_table)):
        if not cat.exists(staging_table):
            cat.append(planned, staging_table, partition_by=("part_id",))
        planned = cat.read(staging_table)
    elif staging_table is not None:
        staging_table = None
    for part in todo_parts:
        part_images = planned.filter(F.col("part_id") == part).drop("part_id")
        obs_in = Observation(f"in_{part}")
        obs_out = Observation(f"out_{part}")
        src = part_images.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))
        t0 = time.time()
        render = render_pyramid_geodetic if profile == "geodetic" else render_pyramid
        tiles = render(
            src, overview_levels=overview_levels, resampling=resampling, zmin=zmin,
            base_resampling=base_resampling,
        )
        tiles = tiles.withColumn("part_id", F.lit(part))
        tiles = tiles.observe(obs_out, F.count(F.lit(1)).alias("tiles_out"))
        # sink clustering: salted (zoom, h3_cell) repartition [B:6]
        clustered = tiles.withColumn(
            "salt", salt_column(salt_factor, "image_id", "x", "y")
        ).repartition(shuffle_n, F.col("z"), F.col("h3_cell"), F.col("salt")).drop("salt")
        cat.append(clustered, TILES_TABLE, partition_by=("z",), tag={"run_id": run_id, "part_id": int(part)})
        rows_in = obs_in.get["rows_in"]
        tiles_out = obs_out.get["tiles_out"]
        cp_row = [
            (
                run_id,
                str(part),
                -1,  # zoom = -1 marks a whole-part commit (all zooms in batch)
                "done",
                int(rows_in),
                int(tiles_out),
                t0,
                time.time(),
            )
        ]
        cp_df = spark.createDataFrame(
            cp_row,
            "run_id string, part_id string, zoom int, status string, rows_in long, tiles_out long, started_ts double, finished_ts double",
        ).withColumn("part_id", F.col("part_id").cast("int")).withColumn(
            "started_ts", F.col("started_ts").cast("timestamp")
        ).withColumn("finished_ts", F.col("finished_ts").cast("timestamp"))
        cat.append(cp_df, CHECKPOINT_TABLE)
        metrics["parts_run"] += 1
        metrics["rows_in"] += int(rows_in)
        metrics["tiles_out"] += int(tiles_out)
    if staging_table is not None:
        done_after = {r["part_id"] for r in done_parts(cat, run_id).collect()}
        if set(all_parts) <= done_after:  # run complete -> staging no longer needed
            cat.drop(staging_table)
    return metrics
