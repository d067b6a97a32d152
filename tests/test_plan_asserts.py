"""T4 — physical-plan asserts (SURVEY.md §5.2): column pruning keeps `bytes`
out of planning scans, zoom predicates push down to parquet, PIP broadcasts
the polygon side, salted repartition shows a shuffle on the salt keys.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tilers_tools_spark.operators import explode, spatial


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_explode_prunes_bytes(spark, images_smoke):
    images = spark.read.parquet(images_smoke)
    cover = explode.explode_cover(images)
    plan = _plan(cover)
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln or "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "bytes" not in ln, f"planning scan reads the fat column: {ln}"


def test_zoom_filter_pushdown(spark, images_smoke, tmp_path):
    images = spark.read.parquet(images_smoke)
    from tilers_tools_spark.operators.render import render_pyramid

    out = str(tmp_path / "tiles.parquet")
    render_pyramid(images).write.partitionBy("z").parquet(out)
    tiles = spark.read.parquet(out).filter(F.col("z") == 6).select("z", "x", "y")
    plan = _plan(tiles)
    assert "PartitionFilters" in plan and "z" in plan.split("PartitionFilters")[1][:80]


def test_pip_broadcasts_polygons(spark, images_smoke, polygons_smoke):
    import pandas as pd

    pts = spark.createDataFrame(
        pd.DataFrame({"point_id": ["a", "b"], "lon": [139.7, 0.0], "lat": [35.7, 0.0]})
    )
    polys = spark.read.parquet(polygons_smoke)
    j = spatial.pip_join(pts, polys, res=4)
    assert "BroadcastHashJoin" in _plan(j)


def test_whole_stage_codegen_on_tilemath(spark, images_smoke):
    images = spark.read.parquet(images_smoke)
    cover = explode.explode_cover(images)
    plan = _plan(cover)
    # executedPlan().toString() marks WholeStageCodegen stages with "*(n)"
    assert "*(" in plan
    # and the tile-range math must be inside codegen'd projects, not Python
    assert "FLOOR" in plan and "ArrowEvalPython" in plan


def test_explode_cover_latlon_not_null(spark, images_smoke):
    images = spark.read.parquet(images_smoke)
    row = explode.explode_cover(images).first()
    assert row["lon"] is not None and row["lat"] is not None
    assert -180.0 <= row["lon"] <= 180.0 and -85.06 <= row["lat"] <= 85.06


def test_salted_repartition_shuffles_on_salt(spark, images_smoke):
    images = spark.read.parquet(images_smoke)
    cover = explode.explode_cover(images).withColumn("h3_cell", F.lit(1).cast("long"))
    rep = explode.salted_repartition(cover, 8, salt_factor=4)
    plan = _plan(rep)
    assert "Exchange hashpartitioning" in plan and "salt" in plan


def test_explode_bbox_pushdown_equals_filter_after(spark, images_smoke):
    """Tile-range predicate pushed through the explode (SURVEY §4.3):
    clamping cover ranges before sequence+explode must equal generating
    the full cover and filtering after, while generating fewer rows."""
    from tilers_tools_spark.functions import tilemath as tm

    images = spark.read.parquet(images_smoke)
    z = 9
    # a window around the HOT box (139.7E, 35.7N)
    bx0, by1 = (float(v[0]) for v in tm.merc_np(__import__("numpy").array([137.0]), __import__("numpy").array([38.0])))
    bx1, by0 = (float(v[0]) for v in tm.merc_np(__import__("numpy").array([142.0]), __import__("numpy").array([33.0])))
    bbox = (bx0, by0, bx1, by1)
    pushed = explode.explode_cover(images, zoom=z, bbox=bbox)
    full = explode.explode_cover(images, zoom=z)
    span = tm.RES0 / 2.0**z * 256.0
    import math
    n = 2**z - 1
    txmin = max(0, min(n, math.floor((bx0 + tm.ORIGIN) / span)))
    txmax = max(0, min(n, max(txmin, math.ceil((bx1 + tm.ORIGIN) / span) - 1)))
    tymin = max(0, min(n, math.floor((by0 + tm.ORIGIN) / span)))
    tymax = max(0, min(n, max(tymin, math.ceil((by1 + tm.ORIGIN) / span) - 1)))
    filtered = full.filter(
        (F.col("x") >= txmin) & (F.col("x") <= txmax) & (F.col("y") >= tymin) & (F.col("y") <= tymax)
    )
    a = {(r["image_id"], r["z"], r["x"], r["y"]) for r in pushed.collect()}
    b = {(r["image_id"], r["z"], r["x"], r["y"]) for r in filtered.collect()}
    assert a == b and 0 < len(a) < full.count()


def test_merged_zoom_scan_is_partition_pruned(spark, images_smoke, tmp_path):
    """merged_pyramid stage 2 reads one zoom at a time: the tiles-table
    scan must prune to that zoom's partition directories."""
    from tilers_tools_spark.plans import tile_pyramid as tp
    from tilers_tools_spark.sources.catalog import Catalog
    from tilers_tools_spark.operators.render import render_pyramid

    cat = Catalog(spark, str(tmp_path / "cat"))
    tiles = render_pyramid(spark.read.parquet(images_smoke).limit(8))
    cat.append(tiles, tp.TILES_TABLE, partition_by=("z",))
    one_zoom = cat.read(tp.TILES_TABLE).filter(F.col("z") == 8)
    plan = _plan(one_zoom)
    assert "PartitionFilters" in plan and "z" in plan.split("PartitionFilters")[1][:80], plan


def test_pq_ann_join_shapes(spark):
    """PQ scan: broadcast-nested-loop with the QUERY side built (linear
    corpus scan, no shuffle). IVF-PQ: broadcast-HASH join on the list id
    with the query side built — at sf0.01 AQE would happily build the
    corpus side instead (a 10^12-row broadcast OOM at scale), so the
    build side is forced and asserted here."""
    from pyspark.sql import functions as F

    from tilers_tools_spark.operators import ann

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 4).select(F.col("vec_id").alias("query_id"), "embedding")
    plan = ann.pq_topk(q, emb, k=5, n_sub=8, ks=16)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    plan2 = ann.ivfpq_topk(q, emb, k=5)._jdf.queryExecution().executedPlan().toString()
    join_lines = [l for l in plan2.splitlines() if "BroadcastHashJoin" in l]
    assert join_lines and "BuildRight" in join_lines[0]
    # the corpus (coded) side is the STREAMED left side: its scan must not
    # sit under a BroadcastExchange
    assert "SortMergeJoin" not in plan2


def test_kml_superoverlay_shuffles_keys_only(spark):
    """The child-discovery aggregate+join in kml_superoverlay must move
    (z, x, y) planning metadata only — a tiles table with a binary
    `tile` column must never see its bytes enter the shuffle (the
    operator prunes to keys at the source)."""
    from tilers_tools_spark.operators.convert import kml_superoverlay

    rows = [(3, 2, 5, b"\x89PNG123"), (4, 4, 10, b"\x89PNG456")]
    t = spark.createDataFrame(rows, "z long, x long, y long, tile binary")
    out = kml_superoverlay(t)
    plan = _plan(out)
    assert "Exchange hashpartitioning" in plan  # the key-only aggregate
    # bytes may appear in the leaf scans (an in-memory ExistingRDD scan
    # cannot column-prune its display), but every operator above —
    # including both exchanges — must be tile-free
    for line in plan.splitlines():
        if "tile#" in line:
            assert "Scan ExistingRDD" in line, f"tile bytes above the scan: {line.strip()[:120]}"
        if "Exchange" in line:
            assert "tile#" not in line


def test_raster_compare_digest_join_is_narrow_and_broadcast(spark):
    """raster_compare's phase-2 digest join must shuffle only the narrow
    (id, n_px, digest) summaries — never raster bytes — and the phase-3
    differing-id restriction must be a BROADCAST semi join on both blob
    sides (at 100 TB the id list of changed rasters is tiny; the blob
    re-join must not hash-partition the full tables to discover it)."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    blob = tiffcodec.encode_tiff(
        a, geo={"gsd": 1.0, "mx0": 0.0, "my1": 3.0, "epsg": 3857}
    )
    df = spark.createDataFrame([("x", blob)], "image_id string, bytes binary")
    out = info.raster_compare(df, df)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "bytes#" not in line, f"raster bytes in a shuffle: {line.strip()[:120]}"


def test_vrt_build_group_join_is_broadcast_and_bytes_free(spark):
    """vrt_build's source<->group-geometry join must BROADCAST the tiny
    per-group aggregate (groups are few even at 100 TB), and no raster
    bytes may enter any exchange — the only shuffle is the narrow
    tags-summary aggregation on the group key."""
    from tilers_tools_spark.functions import tiffcodec
    from tilers_tools_spark.operators import info

    blob = tiffcodec.encode_tiff(
        np.zeros((4, 5), np.uint8),
        geo={"gsd": 1.0, "mx0": 0.0, "my1": 4.0, "epsg": 3857},
    )
    df = spark.createDataFrame(
        [("g", "i", blob)], "vrt_group string, image_id string, bytes binary"
    )
    plan = _plan(info.vrt_build(df))
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "bytes#" not in line, f"raster bytes in a shuffle: {line.strip()[:120]}"


def test_dem_tiles_is_shuffle_free(spark):
    """The web-DEM tiler must stay one narrow Arrow pass per raster —
    tile bytes never enter an Exchange (the 100 TB shape)."""
    from tilers_tools_spark.functions import tiffcodec, tilemath as tm
    from tilers_tools_spark.operators.terrain import dem_tiles

    span = float(tm.resolution_np(16)) * 256
    geo = {"gsd": span / 8.0, "mx0": -tm.ORIGIN, "my1": tm.ORIGIN, "epsg": 3857}
    blob = tiffcodec.encode_tiff(np.zeros((16, 16), np.float32), geo=geo)
    df = spark.createDataFrame([("d", bytearray(blob))], "image_id string, bytes binary")
    plan = _plan(dem_tiles(df, zooms=(16,)))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan


def test_ingest_scans_are_shuffle_free(spark):
    """The round-5 input-driver scan queries (aaigrid/hgt/xyz/envi) are
    pure projections over an Arrow UDF — no Exchange in any plan."""
    from tilers_tools_spark.plans import queries as q

    for fn in (q.q_aaigrid_ingest, q.q_hgt_ingest, q.q_xyz_grid_ingest, q.q_envi_ingest):
        plan = _plan(fn(spark, "/root/testdata/sf0.01"))
        assert "Exchange" not in plan, (fn.__name__, plan)


def test_line_repetition_is_shuffle_free(spark):
    """line_repetition_features is a per-row HOF pass over the documents
    scan — no Exchange anywhere in the plan (the word-level op needs a
    bigram explode+groupBy; the line-level one must not)."""
    from tilers_tools_spark.operators import text as tx

    docs = spark.createDataFrame([(1, "a\nb\na")], "doc_id long, text string")
    plan = _plan(tx.line_repetition_features(docs))
    assert "Exchange" not in plan, plan


def test_image_patchify_is_shuffle_free(spark):
    """Patchify is one narrow Arrow pass over the images scan — patch
    tensors are produced and stay in-partition (no Exchange)."""
    from tilers_tools_spark.functions import codecs
    from tilers_tools_spark.operators.multimodal import image_patchify

    blob = codecs.encode_raw(np.zeros((8, 8, 3), np.uint8))
    df = spark.createDataFrame(
        [("i", bytearray(blob), "raw")], "image_id string, bytes binary, fmt string"
    )
    plan = _plan(image_patchify(df, patch=8))
    assert "MapInPandas" in plan and "Exchange" not in plan, plan
