"""Spatial joins — first-class operators mandated by BASELINE.json:14
(SURVEY.md §2.5): point-in-polygon (broadcast + exact refine), kNN lookup,
bbox range join, and large cell-cell sort-merge join.

Strategy at 100TB (SURVEY.md §4.2/§4.3):
* PIP: polygons are small -> `F.broadcast`; coarse prefilter on H3 cover
  cells (equi-join, prunes 99%+ of tiles before the exact test), exact
  even-odd ray cast vectorized in a pandas UDF.
* kNN: iterative tile-grid ring expansion (no theta join, no cross join on
  the big side): ring r costs an equi-join on packed cell keys; driver loop
  doubles the radius until every query has k candidates (EDBT'12 kNN-join
  pattern, PAPERS.md:9). Final exact top-k via window row_number.
* cell-cell: sort-merge hint on the 64-bit cell key; AQE skew split on.
* bbox: interval overlap predicates AFTER a cell-key equi prefilter.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions import h3lite
from ..functions import tilemath as tm


def _spread(df: DataFrame) -> DataFrame:
    """Guarantee at least default-parallelism partitions on the PROBE side
    of an explode + pair-census stage (guide §2.5: an unsplittable input
    runs as one task until the first exchange).

    A small parquet table is one file with one row group, so its scan is
    ONE task — and because the grid-cell candidate joins here broadcast
    the build side, everything up to the aggregation (the k² per-cell
    candidate loop, i.e. ~all of the operator's CPU) would run on a
    single core (measured: the sf0.1 dbscan pair census 2.8s and the
    iou_pairs probe ~8s, both single-task). At production scale the scan
    is already wide and this is a no-op; otherwise one key-free
    round-robin exchange of id/coordinate-width rows (deterministic:
    Spark sorts before round-robin repartition) buys full parallelism.
    Results are partitioning-independent throughout."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


# ---------------------------------------------------------------------------
# point-in-polygon
# ---------------------------------------------------------------------------


def polygon_cover_cells(polygons_pdf: pd.DataFrame, res: int = 5, samples: int = 24) -> pd.DataFrame:
    """Driver-side (polygons are SMALL by contract — BASELINE.json:6
    'broadcast of small polygon sets'): approximate H3 cover of each ring by
    sampling a bbox grid + the ring vertices. Superset-safe for the coarse
    prefilter because the exact refine follows; sampling density scales with
    ring bbox vs cell size.

    Returns exploded (poly_id, h3_cell) pandas DataFrame.
    """
    rows = []
    # approx cell linear size in degrees at `res` (face ~63.4° / sqrt(7)^res)
    cell_deg = 70.0 / (7.0 ** (res / 2.0))
    for _, p in polygons_pdf.iterrows():
        ring = p["ring"]
        lons = np.array([v["lon"] for v in ring])
        lats = np.array([v["lat"] for v in ring])
        extent = max(lons.max() - lons.min(), lats.max() - lats.min(), 1e-6)
        # grid spacing must stay below one cell width or interior cells of
        # large polygons get skipped (false negatives the exact refine never
        # sees): n scales with extent/cell_deg, NOT capped at a constant
        n = max(samples, int(np.ceil(4.0 * extent / cell_deg)) + 1)
        gl = np.linspace(lons.min(), lons.max(), n)
        gt = np.linspace(lats.min(), lats.max(), n)
        step_lon = (gl[1] - gl[0]) if len(gl) > 1 else 0.1
        step_lat = (gt[1] - gt[0]) if len(gt) > 1 else 0.1
        assert max(step_lon, step_lat) < cell_deg, "cover grid spacing must be < one cell"
        cells_set = set()
        # chunk grid rows so memory stays bounded for very large polygons
        chunk = max(1, (1 << 22) // max(n, 1))
        for r0 in range(0, n, chunk):
            gx, gy = np.meshgrid(gl, gt[r0 : r0 + chunk])
            all_lon = np.concatenate([gx.ravel(), lons])
            all_lat = np.concatenate([gy.ravel(), lats])
            cells = np.unique(h3lite.latlng_to_cell(all_lat, all_lon, res))
            # pad with neighbors-by-sampling: jitter grid-step offsets in 4 dirs
            for dx, dy in ((-0.6, -0.6), (0.6, 0.6), (-0.6, 0.6), (0.6, -0.6)):
                cells = np.union1d(
                    cells, h3lite.latlng_to_cell(all_lat + dy * step_lat, all_lon + dx * step_lon, res)
                )
            cells_set.update(int(c) for c in cells)
        rows += [(p["poly_id"], c) for c in sorted(cells_set)]
    # a poly_id may span several rows (multi-ring polygons with holes):
    # dedupe (poly_id, cell) so the coarse join yields one candidate per
    # (point, polygon)
    return (
        pd.DataFrame(rows, columns=["poly_id", "h3_cell_cover"])
        .drop_duplicates()
        .reset_index(drop=True)
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    res: int = 5,
    how: str = "inner",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """points (any DF with lon/lat) x polygons (poly_id, ring) -> matches.

    Two-phase (SURVEY.md §2.5 row 27): broadcast coarse H3-cover equi-join,
    then exact ray-cast refine in a pandas UDF. `how`: inner | left_semi |
    left_anti (semi/anti evaluated on the refined match set).

    Multi-ring polygons (holes): several rows may share a poly_id, one ring
    per row; containment is even-odd over ALL of the polygon's rings (a
    point inside an outer ring and a hole ring has 2 crossings -> outside).
    """
    spark = points.sparkSession
    poly_pdf = polygons.select("poly_id", "ring").toPandas()
    cover = spark.createDataFrame(polygon_cover_cells(poly_pdf, res))
    # polygons are small by contract -> capture rings in the refine UDF's
    # closure instead of joining ring arrays onto every candidate row
    # (avoids shipping two float arrays per candidate through the shuffle)
    ring_map: dict = {}
    for _, p in poly_pdf.iterrows():
        ring_map.setdefault(p["poly_id"], []).append(
            (
                np.array([v["lon"] for v in p["ring"]], dtype=np.float64),
                np.array([v["lat"] for v in p["ring"]], dtype=np.float64),
            )
        )
    pts = points.withColumn(
        "_pip_cell",
        _h3_cell_udf(F.col(lat_col), F.col(lon_col), F.lit(res)),
    )
    cand = pts.join(F.broadcast(cover), pts["_pip_cell"] == cover["h3_cell_cover"], "inner")

    def refine(batches):
        for pdf in batches:
            plon = pdf[lon_col].to_numpy(np.float64)
            plat = pdf[lat_col].to_numpy(np.float64)
            keep = np.zeros(len(pdf), dtype=bool)
            pids = pdf["poly_id"].to_numpy()
            # iterate only the polygons PRESENT in this batch (np.unique +
            # argsort grouping), not all of ring_map — removes the
            # O(|batch| x |polygons|) scan for polygon sets in the thousands
            order = np.argsort(pids, kind="stable")
            uniq, starts = np.unique(pids[order], return_index=True)
            bounds = np.append(starts, len(order))
            for ui, pid in enumerate(uniq):
                rings = ring_map.get(pid)
                if rings is None:
                    continue
                idx = order[bounds[ui] : bounds[ui + 1]]
                py = plat[idx][:, None]
                px = plon[idx][:, None]
                n_cross = np.zeros(len(idx), dtype=np.int64)
                for rl, rt in rings:
                    x1, y1 = rl, rt
                    x2, y2 = np.roll(rl, -1), np.roll(rt, -1)
                    crosses = (y1 > py) != (y2 > py)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        xin = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
                    n_cross += (crosses & (xin > px)).sum(axis=1)
                keep[idx] = (n_cross % 2).astype(bool)
            yield pdf[keep]

    refined = cand.mapInPandas(refine, schema=cand.schema)
    matches = refined.drop("h3_cell_cover", "_pip_cell")
    if how == "inner":
        return matches
    key_cols = [c for c in points.columns]
    if how == "left_semi":
        return points.join(matches.select(key_cols).dropDuplicates(key_cols), key_cols, "left_semi")
    if how == "left_anti":
        return points.join(matches.select(key_cols).dropDuplicates(key_cols), key_cols, "left_anti")
    raise ValueError(how)


@F.pandas_udf(LongType())
def _h3_cell_udf(lat: pd.Series, lon: pd.Series, res: pd.Series) -> pd.Series:
    r = int(res.iloc[0])
    return pd.Series(h3lite.latlng_to_cell(lat.to_numpy(np.float64), lon.to_numpy(np.float64), r))


# ---------------------------------------------------------------------------
# kNN — iterative grid-ring expansion
# ---------------------------------------------------------------------------


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    zoom: int = 7,
    max_rounds: int = 6,
    query_id: str = "query_id",
    point_id: str = "point_id",
) -> DataFrame:
    """k nearest `points` for each query row, distance = Euclidean in
    EPSG:3857 meters (SURVEY.md §2.5 row 28).

    Both sides get a tile cell at `zoom`; round r joins queries against
    points whose cell is within Chebyshev ring radius 2^r - 1 (via truncated
    cell keys — coarser zoom equi-join, so every round is an EQUI join that
    AQE can plan; no theta join ever). Queries that reached k results with
    certainty radius drop out; remaining re-join at a coarser zoom. Exact
    final top-k by window. Correct (not approximate): a query only stops
    when its k-th candidate distance <= one guaranteed-searched ring width.
    """
    q = queries.withColumn("_qmx", tm.merc_x(F.col("lon"))).withColumn("_qmy", tm.merc_y(F.col("lat")))
    p = points.withColumn("_pmx", tm.merc_x(F.col("lon"))).withColumn("_pmy", tm.merc_y(F.col("lat")))
    results = None
    remaining = q
    for rnd in range(max_rounds):
        zz = max(0, zoom - rnd)
        span = tm.RES0 / (2.0**zz) * tm.TILE
        qk = remaining.withColumn("_cell", tm.pack_zxy(F.lit(zz), tm.tile_x(F.col("_qmx"), F.lit(zz)), tm.tile_y_tms(F.col("_qmy"), F.lit(zz))))
        pk = p.withColumn("_cell", tm.pack_zxy(F.lit(zz), tm.tile_x(F.col("_pmx"), F.lit(zz)), tm.tile_y_tms(F.col("_pmy"), F.lit(zz))))
        # neighbors: query cell + 8 surrounding cells at this zoom
        qx = tm.tile_x(F.col("_qmx"), F.lit(zz))
        qy = tm.tile_y_tms(F.col("_qmy"), F.lit(zz))
        n = tm.n_tiles(F.lit(zz))
        neigh = qk.select(
            "*",
            F.explode(F.array([F.lit(d) for d in range(9)])).alias("_d"),
        ).withColumn(
            "_ncell",
            tm.pack_zxy(
                F.lit(zz),
                F.pmod(qx + (F.col("_d") % 3 - 1), n),
                F.greatest(F.lit(0), F.least(n - F.lit(1), qy + (F.col("_d") / 3).cast("long") - 1)),
            ),
        )
        # dedupe candidates on the id pair: the 9 neighbor cells collapse to
        # duplicate cells at coarse zooms (x wrap via pmod when n < 3, y
        # clamp at the grid edge), and duplicate candidates would occupy
        # several row_number ranks
        cand = (
            neigh.join(pk.withColumnRenamed("_cell", "_ncell"), "_ncell", "inner")
            .dropDuplicates([query_id, point_id])
        )
        dist = F.sqrt(
            (F.col("_qmx") - F.col("_pmx")) * (F.col("_qmx") - F.col("_pmx"))
            + (F.col("_qmy") - F.col("_pmy")) * (F.col("_qmy") - F.col("_pmy"))
        )
        cand = cand.withColumn("_dist", dist)
        w = Window.partitionBy(query_id).orderBy(F.col("_dist").asc(), F.col(point_id).asc())
        # localCheckpoint: topk is small (<= k rows/query, narrow columns)
        # and every later consumer — the done/remaining derivation THIS
        # round, the final caller action — would otherwise recompute the
        # whole candidate join per round (the driver loop's isEmpty() plus
        # the final action tripled the join cost). One eager job per round
        # computes it once; lineage is truncated so nothing replays.
        # (Cluster note: swap for checkpoint() + setCheckpointDir when
        # executor loss must be survivable — localCheckpoint blocks are
        # executor-local.)
        topk = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(query_id, point_id, "_dist", "_rn")
        ).localCheckpoint()
        # done iff k-th distance is certainly covered by the searched ring:
        # searched area guarantees all points within `span` of the query cell
        kth = topk.groupBy(query_id).agg(F.max("_rn").alias("_nk"), F.max("_dist").alias("_kd"))
        done_ids = kth.filter((F.col("_nk") >= k) & (F.col("_kd") <= F.lit(span)))
        done = topk.join(done_ids.select(query_id), query_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(done_ids.select(query_id), query_id, "left_anti").localCheckpoint()
        if zz == 0 or remaining.isEmpty():
            break
    # any query still unresolved (max_rounds expired before zz reached 0, or
    # the single global cell at zz==0 could not certify) gets an exact
    # brute-force pass — never silently dropped (isEmpty is cheap: remaining
    # is checkpointed above)
    if not remaining.isEmpty():
        dist = F.sqrt(
            (F.col("_qmx") - F.col("_pmx")) * (F.col("_qmx") - F.col("_pmx"))
            + (F.col("_qmy") - F.col("_pmy")) * (F.col("_qmy") - F.col("_pmy"))
        )
        w = Window.partitionBy(query_id).orderBy(F.col("_dist").asc(), F.col(point_id).asc())
        leftover = remaining.crossJoin(p).withColumn("_dist", dist)
        lt = (
            leftover.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select(query_id, point_id, "_dist", "_rn")
        )
        results = lt if results is None else results.unionByName(lt)
    return results.withColumnRenamed("_dist", "dist").withColumnRenamed("_rn", "rank")


# ---------------------------------------------------------------------------
# cell-cell sort-merge join + bbox range join
# ---------------------------------------------------------------------------


def cell_join(left: DataFrame, right: DataFrame, key: str = "h3_cell", how: str = "inner") -> DataFrame:
    """Large x large equi-join on the 64-bit cell key, sort-merge mandated
    (BASELINE.json:6 'sort-merge for large cell-cell joins'); AQE handles
    skew splitting at runtime.
    """
    return left.hint("merge").join(right.hint("merge"), key, how)


def bbox_join(
    left: DataFrame,
    right: DataFrame,
    zoom: int = 6,
    lcols=("lmx0", "lmy0", "lmx1", "lmy1"),
    rcols=("rmx0", "rmy0", "rmx1", "rmy1"),
    keys: tuple[str, ...] | None = None,
) -> DataFrame:
    """Bbox-overlap join (SURVEY.md §2.5 row 30): each side exploded to its
    covering tile cells at `zoom` (coarse equi prefilter), then the exact
    interval predicates. Dedup because a pair can meet in several cells.

    `keys`: the pair-identity columns to dedup on (e.g. the two id
    columns). Pass them whenever ids exist — deduping on the id pair
    shuffles narrow rows instead of full rows with double payloads, and is
    robust to extra payload columns. Default (None) dedups on all columns.
    """

    def cover(df, cols, side):
        mx0, my0, mx1, my1 = [F.col(c) for c in cols]
        z = F.lit(zoom)
        txmin = tm.clamp_tile(tm.cover_min(mx0, z), z)
        txmax = tm.clamp_tile(F.greatest(tm.cover_max(mx1, z), tm.cover_min(mx0, z)), z)
        tymin = tm.clamp_tile(tm.cover_min(my0, z), z)
        tymax = tm.clamp_tile(F.greatest(tm.cover_max(my1, z), tm.cover_min(my0, z)), z)
        return (
            df.withColumn("_tx", F.explode(F.sequence(txmin, txmax)))
            .withColumn("_ty", F.explode(F.sequence(tymin, tymax)))
            .withColumn(f"_cell_{side}", tm.pack_zxy(z, F.col("_tx"), F.col("_ty")))
            .drop("_tx", "_ty")
        )

    lc = cover(left, lcols, "l").withColumnRenamed("_cell_l", "_cell")
    rc = cover(right, rcols, "r").withColumnRenamed("_cell_r", "_cell")
    j = lc.join(rc, "_cell", "inner").filter(
        (F.col(lcols[0]) <= F.col(rcols[2]))
        & (F.col(lcols[2]) >= F.col(rcols[0]))
        & (F.col(lcols[1]) <= F.col(rcols[3]))
        & (F.col(lcols[3]) >= F.col(rcols[1]))
    )
    return j.drop("_cell").dropDuplicates(list(keys) if keys else None)


def wkt_polygons_df(spark, rows):
    """[(poly_id, wkt_string)] -> the (poly_id, ring) DataFrame shape
    pip_join/apply_cutline consume (one row per ring; holes = extra rows
    of the same poly_id, even-odd). Parsing is driver-side — polygon sets
    are small by the engine's broadcast contract (BASELINE.json:6), the
    parsed rings are what gets broadcast."""
    from ..functions.georef_parsers import parse_wkt_polygon

    out = []
    for pid, wkt in rows:
        for ring in parse_wkt_polygon(wkt):
            out.append((pid, [{"lon": x, "lat": y} for x, y in ring]))
    return spark.createDataFrame(
        out, "poly_id string, ring array<struct<lon:double,lat:double>>"
    )


def geojson_polygons_df(spark, text: str):
    """GeoJSON document (FeatureCollection / Feature / bare geometry,
    RFC 7946) -> the same (poly_id, ring) DataFrame shape as
    `wkt_polygons_df` — the second vector input driver beside WKT.
    Driver-side parse under the same small-broadcast-side contract."""
    from ..functions.georef_parsers import parse_geojson_features

    out = []
    for pid, rings in parse_geojson_features(text):
        for ring in rings:
            out.append((pid, [{"lon": x, "lat": y} for x, y in ring]))
    return spark.createDataFrame(
        out, "poly_id string, ring array<struct<lon:double,lat:double>>"
    )


# ---------------------------------------------------------------------------
# per-group convex hull (coverage-hull role: the outline of each map
# sheet's / region's tile footprint, the shape cutline + tindex consume)
# ---------------------------------------------------------------------------


def _hull_edges_np(pts: list[tuple]) -> list[tuple]:
    """Directed hull edges of distinct points via Andrew's monotone chain
    (published algorithm; strict turns, so collinear non-extreme points
    are NOT vertices). CCW orientation: every other point lies strictly
    left of each edge (or on the closed segment). Degenerate forms:
    1 point -> no edges; 2 points / all collinear -> the two directed
    extreme-to-extreme edges (a,b),(b,a) — the same closed-walk contract
    the relational oracle derives independently."""
    pts = sorted(set(pts))
    if len(pts) < 2:
        return []
    if len(pts) == 2:
        return [(pts[0], pts[1]), (pts[1], pts[0])]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    verts = lower[:-1] + upper[:-1]  # CCW closed walk, no repeats
    if len(verts) == 2:  # all collinear collapses to the segment walk
        return [(verts[0], verts[1]), (verts[1], verts[0])]
    return list(zip(verts, verts[1:] + verts[:1]))


def convex_hull(
    points: DataFrame,
    by=("group_id",),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group convex hull as DIRECTED EDGES (x1,y1)->(x2,y2), CCW:
    chain them to walk the hull polygon. Edge set — not a vertex list —
    so the result is order-free for cross-engine comparison, and the
    closed-walk contract covers degenerate segments uniformly.

    Scale shape: ONE shuffle on the group key into applyInPandas; the
    monotone chain is O(n log n) per group and hulls are tiny relative
    to inputs, so output never amplifies. Hot groups serialize (same
    caveat as any per-key aggregate); for continent-sized groups,
    pre-hull per partition then hull-of-hulls (associative) — documented
    escape hatch, not needed below ~10^7 points per group.

    Oracle independence: the driver gate replays this with the O(n^3)
    EXTREME-EDGE characterization — (a,b) is a hull edge iff every other
    point is strictly left of a->b or strictly inside the closed segment
    — a different published definition evaluated relationally, not a
    re-run of the chain."""
    by = list(by)
    schema = ", ".join(
        [f"`{c}` {points.schema[c].dataType.simpleString()}" for c in by]
        + [f"x1 {points.schema[x_col].dataType.simpleString()}",
           f"y1 {points.schema[y_col].dataType.simpleString()}",
           f"x2 {points.schema[x_col].dataType.simpleString()}",
           f"y2 {points.schema[y_col].dataType.simpleString()}"]
    )

    def hull(key, pdf):  # no hints: (key, pdf) dispatch is positional
        edges = _hull_edges_np(list(zip(pdf[x_col], pdf[y_col])))
        return pd.DataFrame(
            [list(key) + [a[0], a[1], b[0], b[1]] for a, b in edges],
            columns=by + ["x1", "y1", "x2", "y2"],
        )

    # r06: explicit key repartition at default parallelism — the groupBy
    # exchange otherwise gets AQE-coalesced by BYTES (a few hundred KB of
    # coordinates -> ONE post-shuffle partition), which serializes every
    # per-group Python call onto one core; the per-group cost here is
    # Python/Arrow CPU, which the bytes heuristic cannot see. The explicit
    # repartition satisfies the apply's clustering requirement, so no
    # second exchange is added, and the count scales with the cluster.
    par = points.sparkSession.sparkContext.defaultParallelism
    return points.repartition(par, *by).groupBy(*by).applyInPandas(hull, schema=schema)


# ---------------------------------------------------------------------------
# corridor join (points within distance d of polyline segments — the
# route-buffer / track-matching role)
# ---------------------------------------------------------------------------


def corridor_join(
    points: DataFrame,
    segments: DataFrame,
    d: float,
    cell_m: float | None = None,
    x_col: str = "mx",
    y_col: str = "my",
) -> DataFrame:
    """Every point within Euclidean distance ``d`` (meters, inclusive) of
    a segment (ax, ay)->(bx, by), paired with that segment; emits all
    point columns + all segment columns + ``dist2`` (squared meters).

    Scale shape: the naive plan is a distance theta-join (cartesian).
    This is the bucketed EQUI-join form (same trick as
    temporal.interval_join): each segment explodes into every grid cell
    its d-expanded bbox touches (two F.sequence explodes, conservative
    cover), each point computes its SINGLE cell, join on (cellx, celly),
    exact point-to-segment refine after. Point-sided single cell => each
    (point, segment) pair meets at most once — no dedup pass. Cell size
    defaults to 4d: expansion is ~(len/cell + 2)^2-ish per segment;
    shrink toward d for dense short segments, grow for long sparse ones.

    Exact refine (the classic closest-point-on-segment form): t =
    clamp(dot/len2, 0, 1); zero-length segments degrade to point
    distance. All Column arithmetic — no UDF, one shuffle."""
    cell = float(cell_m if cell_m is not None else 4.0 * d)
    if cell < d:
        raise ValueError("cell_m must be >= d for a conservative cover")
    px, py = F.col(x_col), F.col(y_col)

    s = segments.withColumn(
        "_cellx",
        F.explode(F.sequence(
            F.floor((F.least("ax", "bx") - F.lit(float(d))) / cell),
            F.floor((F.greatest("ax", "bx") + F.lit(float(d))) / cell),
        )),
    ).withColumn(
        "_celly",
        F.explode(F.sequence(
            F.floor((F.least("ay", "by") - F.lit(float(d))) / cell),
            F.floor((F.greatest("ay", "by") + F.lit(float(d))) / cell),
        )),
    )
    p = points.withColumn("_cellx", F.floor(px / cell)) \
              .withColumn("_celly", F.floor(py / cell))
    j = p.join(s, ["_cellx", "_celly"])

    dx, dy = F.col("bx") - F.col("ax"), F.col("by") - F.col("ay")
    len2 = dx * dx + dy * dy
    dot = (px - F.col("ax")) * dx + (py - F.col("ay")) * dy
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), dot / len2)))
    cx, cy = F.col("ax") + t * dx, F.col("ay") + t * dy
    dist2 = (px - cx) * (px - cx) + (py - cy) * (py - cy)
    return (
        j.withColumn("dist2", dist2)
        .filter(F.col("dist2") <= float(d) * float(d))
        .drop("_cellx", "_celly")
    )


def _hull_vertices_np(pts: list[tuple]) -> list[tuple]:
    """CCW hull vertex walk (monotone chain, strict turns); 1 or 2 points
    return as-is."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def hull_diameter(
    points: DataFrame,
    by=("group_id",),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-group diameter (max pairwise squared distance) via convex hull
    + rotating calipers (Shamos 1978): the farthest pair is always a pair
    of hull vertices, and antipodal pairs are enumerable in O(h) — so the
    whole group costs O(n log n), not O(n^2). Emits (by..., n_pts, diam2,
    x1, y1, x2, y2) with the achieving pair canonicalized (lexicographic
    min first; among equal-diameter pairs the lexicographically smallest
    pair) so output is deterministic and cross-engine comparable.
    Single-point groups: diam2 = 0, pair = the point twice.

    Oracle independence: the gate replays with the O(n^2) max-over-pairs
    definition in SQL — no hull, no calipers."""
    by = list(by)
    schema = ", ".join(
        [f"`{c}` {points.schema[c].dataType.simpleString()}" for c in by]
        + ["n_pts bigint", "diam2 " + points.schema[x_col].dataType.simpleString(),
           f"x1 {points.schema[x_col].dataType.simpleString()}",
           f"y1 {points.schema[y_col].dataType.simpleString()}",
           f"x2 {points.schema[x_col].dataType.simpleString()}",
           f"y2 {points.schema[y_col].dataType.simpleString()}"]
    )

    def d2(a, b):
        return (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2

    def calipers(v: list[tuple]) -> tuple:
        h = len(v)
        if h == 1:
            return 0, v[0], v[0]
        best = None
        j = 1
        for i in range(h):
            ni = (i + 1) % h
            ex, ey = v[ni][0] - v[i][0], v[ni][1] - v[i][1]
            # advance j while the NEXT vertex is farther from edge i
            while True:
                nj = (j + 1) % h
                cur = ex * (v[j][1] - v[i][1]) - ey * (v[j][0] - v[i][0])
                nxt = ex * (v[nj][1] - v[i][1]) - ey * (v[nj][0] - v[i][0])
                if nxt > cur:
                    j = nj
                else:
                    break
            for q in (v[j], v[(j + 1) % h]):  # antipodal candidates
                for p in (v[i], v[ni]):
                    dd = d2(p, q)
                    pair = tuple(sorted((p, q)))
                    if best is None or dd > best[0] or (
                            dd == best[0] and pair < (best[1], best[2])):
                        best = (dd, pair[0], pair[1])
        return best

    def fn(key, pdf):
        pts = list(zip(pdf[x_col], pdf[y_col]))
        diam2, a, b = calipers(_hull_vertices_np(pts))
        return pd.DataFrame(
            [list(key) + [len(pts), diam2, a[0], a[1], b[0], b[1]]],
            columns=by + ["n_pts", "diam2", "x1", "y1", "x2", "y2"],
        )

    # r06: same explicit key repartition as convex_hull — AQE's bytes-based
    # coalescing serialized all per-group Python calipers onto one core
    par = points.sparkSession.sparkContext.defaultParallelism
    return points.repartition(par, *by).groupBy(*by).applyInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# DBSCAN density clustering
# ---------------------------------------------------------------------------


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """DBSCAN (Ester et al., KDD 1996) over a point table -> one row per
    input id with ``is_core`` and ``cluster`` (bigint; NULL = noise).

    Semantics pinned to the paper: N_eps(p) = {q : dist(p,q) <= eps}
    INCLUDING p itself, so a point is core iff |N_eps| >= min_pts counting
    itself; distances are Euclidean in the coordinate units; border points
    (non-core within eps of >= 1 core) join a cluster, everything else is
    noise. One documented deviation: the paper's border-point assignment
    is scan-order-dependent when a border point touches two clusters —
    here it deterministically takes the MINIMUM cluster label among its
    core neighbors, so the result is partitioning- and order-independent
    (required for the cross-engine gate and for reproducible re-runs).
    Cluster labels are canonical: the minimum core-point id of the
    cluster.

    Scale shape: the naive plan is an all-pairs distance theta-join. This
    is the grid-cell form — every point gets its eps-sized cell; the LEFT
    side explodes into its 3x3 neighbor cells (a conservative cover of the
    eps-ball), the RIGHT side keeps its single cell, equi-join on
    (cellx, celly) then exact dist2 <= eps^2 refine. Right-sided single
    cell => each ORDERED pair (a, b), a != b, meets exactly once — the
    neighbor census is one groupBy count with map-side partials, no dedup
    pass. Core-core edges feed dedup.connected_components (narrow
    (id, comp) label propagation with localCheckpoint lineage cuts), so
    text/payload columns never shuffle. Hot-cell caveat: a cell holding k
    points costs O(k^2) candidate pairs — that is inherent to exact DBSCAN
    (every such pair IS an eps-neighbor pair); if a dataset has
    million-point eps-balls, eps is wrong for it (or use grid-summarized
    approximate variants out of scope here).
    """
    if eps <= 0:
        raise ValueError("eps must be > 0")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    eps = float(eps)
    pts = _spread(points.select(
        F.col(id_col).alias("_pid"),
        F.col(x_col).cast("double").alias("_px"),
        F.col(y_col).cast("double").alias("_py"),
    ))
    off = F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)]))
    a = (
        pts.withColumn("_dx", off)
        .withColumn("_dy", off)
        .select(
            F.col("_pid").alias("_aid"),
            F.col("_px").alias("_ax"),
            F.col("_py").alias("_ay"),
            (F.floor(F.col("_px") / eps) + F.col("_dx")).alias("_cx"),
            (F.floor(F.col("_py") / eps) + F.col("_dy")).alias("_cy"),
        )
    )
    b = pts.select(
        F.col("_pid").alias("_bid"),
        F.col("_px").alias("_bx"),
        F.col("_py").alias("_by"),
        F.floor(F.col("_px") / eps).alias("_cx"),
        F.floor(F.col("_py") / eps).alias("_cy"),
    )
    dx, dy = F.col("_ax") - F.col("_bx"), F.col("_ay") - F.col("_by")
    pairs = (
        a.join(b, ["_cx", "_cy"])
        .filter(F.col("_aid") != F.col("_bid"))
        .filter(dx * dx + dy * dy <= F.lit(eps * eps))
        .select("_aid", "_bid")
    )
    # the pair census is reused three times (counts, edges, border hop):
    # materialize once so the explode-join doesn't replay per consumer
    pairs = pairs.localCheckpoint()

    nbrs = pairs.groupBy("_aid").agg(F.count("*").alias("_n"))
    flags = pts.join(nbrs, pts["_pid"] == nbrs["_aid"], "left").select(
        "_pid",
        ((F.coalesce(F.col("_n"), F.lit(0)) + F.lit(1)) >= F.lit(int(min_pts))).alias(
            "is_core"
        ),
    )
    core_ids = flags.filter("is_core").select(F.col("_pid").alias("_cid"))
    edges = (
        pairs.join(core_ids, pairs["_aid"] == core_ids["_cid"]).drop("_cid")
        .join(core_ids, pairs["_bid"] == core_ids["_cid"]).drop("_cid")
        .filter(F.col("_aid") < F.col("_bid"))
    )
    from .dedup import connected_components

    comp = connected_components(
        edges, core_ids, id_col="_cid", a_col="_aid", b_col="_bid"
    )  # -> (id, comp), comp = min core id of the component

    # border points: non-core a with core neighbor b -> min comp over b
    border = (
        pairs.join(comp.select(F.col("id").alias("_bid"), "comp"), "_bid")
        .groupBy("_aid")
        .agg(F.min("comp").alias("_bcomp"))
    )
    out = (
        flags.join(comp.select(F.col("id").alias("_pid"),
                               F.col("comp").alias("_ccomp")), "_pid", "left")
        .join(border.select(F.col("_aid").alias("_pid"), "_bcomp"), "_pid", "left")
        .select(
            F.col("_pid").alias(id_col),
            "is_core",
            F.when(F.col("is_core"), F.col("_ccomp"))
            .otherwise(F.col("_bcomp"))
            .cast("long")
            .alias("cluster"),
        )
    )
    return out


def iou_pairs(
    boxes: DataFrame,
    min_iou_num: int,
    min_iou_den: int,
    cell: int,
    id_col: str = "id",
) -> DataFrame:
    """Bounding-box IoU pair join (the object-detection duplicate-box /
    NMS-prefilter role): unordered pairs (a < b by id) of integer
    half-open boxes (x0, y0, x1, y1) whose intersection-over-union
    reaches the RATIONAL threshold p/q — the predicate evaluates as
    q·inter >= p·(areaA + areaB - inter) on exact BIGINTs, so no float
    ever decides membership; iou ships as one documented double
    inter/union beside the exact operands.

    Scale shape: each box explodes into the grid cells it touches
    (x0//cell .. (x1-1)//cell ranges — boxes larger than a few cells
    explode wider; pick cell near the typical box size), pairs meet on
    a shared-cell equi-join, and each intersecting pair is counted
    EXACTLY ONCE by the standard report-at-top-left-intersection-cell
    rule (keep the pair only in the cell containing
    (max(x0a,x0b), max(y0a,y0b))) — no distinct pass, no all-pairs.
    """
    if min_iou_den < 1 or not 0 < min_iou_num <= min_iou_den:
        raise ValueError("need 0 < p <= q")
    if cell < 1:
        raise ValueError("cell must be a positive integer")
    b = boxes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col("x0").cast("long"), F.col("y0").cast("long"),
        F.col("x1").cast("long"), F.col("y1").cast("long"),
    )
    # fail-loud on degenerate boxes, woven into a KEPT column — a
    # computed-then-dropped check column would be pruned by Catalyst
    # and the raise would never evaluate
    b = b.withColumn(
        "x1",
        F.when((F.col("x1") > F.col("x0")) & (F.col("y1") > F.col("y0")),
               F.col("x1"))
        .otherwise(F.raise_error(F.format_string(
            "degenerate box id %s", F.col("id")))),
    )
    b = _spread(b)
    cw = float(cell)
    cxs = F.sequence(
        F.floor(F.col("x0").cast("double") / F.lit(cw)).cast("long"),
        F.floor((F.col("x1") - 1).cast("double") / F.lit(cw)).cast("long"),
    )
    cys = F.sequence(
        F.floor(F.col("y0").cast("double") / F.lit(cw)).cast("long"),
        F.floor((F.col("y1") - 1).cast("double") / F.lit(cw)).cast("long"),
    )
    e = (
        b.withColumn("cx", F.explode(cxs))
        .withColumn("cy", F.explode(cys))
    )
    L = e.select(*[F.col(c).alias(f"a_{c}") for c in ("id", "x0", "y0", "x1", "y1")],
                 "cx", "cy")
    R = e.select(*[F.col(c).alias(f"b_{c}") for c in ("id", "x0", "y0", "x1", "y1")],
                 "cx", "cy")
    j = L.join(R, ["cx", "cy"]).where(F.col("a_id") < F.col("b_id"))
    ix0 = F.greatest("a_x0", "b_x0")
    iy0 = F.greatest("a_y0", "b_y0")
    iw = F.least("a_x1", "b_x1") - ix0
    ih = F.least("a_y1", "b_y1") - iy0
    meet = (
        (F.col("cx") == F.floor(ix0.cast("double") / F.lit(cw)).cast("long"))
        & (F.col("cy") == F.floor(iy0.cast("double") / F.lit(cw)).cast("long"))
    )
    inter = iw * ih
    area_a = (F.col("a_x1") - F.col("a_x0")) * (F.col("a_y1") - F.col("a_y0"))
    area_b = (F.col("b_x1") - F.col("b_x0")) * (F.col("b_y1") - F.col("b_y0"))
    uni = area_a + area_b - inter
    keep = (
        (iw > 0) & (ih > 0) & meet
        & (F.lit(min_iou_den) * inter >= F.lit(min_iou_num) * uni)
    )
    return j.where(keep).select(
        F.col("a_id").alias("ida"), F.col("b_id").alias("idb"),
        inter.alias("inter"), uni.alias("uni"),
        (inter.cast("double") / uni.cast("double")).alias("iou"),
    )
