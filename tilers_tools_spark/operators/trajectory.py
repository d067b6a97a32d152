"""Trajectory / event-stream sessionization — the trip-segmentation
role for GPS tracks and clickstreams: per entity, a new session starts
when the gap to the previous event exceeds `gap_s`. Everything is
window functions + Column exprs (one shuffle on the entity key; no
UDF); time math is integer MICROSECONDS end-to-end so session
boundaries are bit-exact across engines.

``trip_stats`` adds the geospatial leg: per-session path length as the
sum of haversine hops (functions/geodesy.py) — with per-hop mm
quantization available for order-free cross-engine comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import geodesy


def _micros(ts_col: str) -> Column:
    """Epoch microseconds of a TIMESTAMP_NTZ column, timezone-free:
    unix_micros() requires TIMESTAMP_LTZ and would drag the session
    timezone (and its DST discontinuities) into session boundaries;
    field arithmetic against an NTZ epoch literal is linear and matches
    DuckDB's epoch_us(TIMESTAMP) exactly."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
    )


def sessionize(
    df: DataFrame,
    gap_s: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Adds `session_idx` (0-based per entity, in (ts, order_col) order —
    the tie-break column makes the windows deterministic under equal
    timestamps)."""
    us = _micros(ts_col)
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(order_col).asc())
    gap_us = int(round(gap_s * 1_000_000))
    new_sess = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(us.asc(), F.col(order_col).asc()) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", (F.sum(new_sess).over(run) - 1).cast("bigint"))


def trip_stats(
    df: DataFrame,
    gap_s: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    quantize_mm: bool = False,
) -> DataFrame:
    """Per (entity, session): event count, duration (microseconds), and
    path length = sum of consecutive-point haversine hops (meters; with
    quantize_mm=True each hop is floor(m*1e3+0.5) and the sum is an
    exact integer in mm — the order-free form the driver gate hashes)."""
    s = sessionize(df, gap_s, user_col, ts_col, order_col)
    us = _micros(ts_col)
    w = Window.partitionBy(user_col, "session_idx").orderBy(
        us.asc(), F.col(order_col).asc()
    )
    hop = geodesy.haversine_m(
        F.lag(F.col(lat_col)).over(w), F.lag(F.col(lon_col)).over(w),
        F.col(lat_col), F.col(lon_col),
    )
    if quantize_mm:
        hop_v: Column = F.floor(hop * 1000.0 + 0.5).cast("bigint")
        zero: Column = F.lit(0).cast("bigint")
        dist_alias = "dist_mm"
    else:
        hop_v = hop
        zero = F.lit(0.0)
        dist_alias = "dist_m"
    s = s.withColumn("_hop", F.coalesce(hop_v, zero)).withColumn("_us", us)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        (F.max("_us") - F.min("_us")).alias("dur_us"),
        F.sum("_hop").alias(dist_alias),
    )


def stay_points(
    df: DataFrame,
    cell: int,
    min_dwell_s: float,
    min_pings: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Grid-based stay-point detection (the GeoLife / telco-mobility
    role, the SQL-able variant of Li et al. 2008): per entity, pings in
    (ts, order_col) order are assigned a grid cell (floor(x/cell),
    floor(y/cell) over INTEGER coordinates); a maximal run of
    consecutive pings in the SAME cell is a candidate stay, kept when
    dwell = t_last - t_first >= min_dwell AND the run has >= min_pings
    pings. Output: (user, stay_idx — 0-based per entity in enter-time
    order —, cx, cy, enter_us, exit_us, dwell_us, n_pings), every
    column an exact integer (microsecond time math, deterministic
    (ts, order) tie-break), bit-identical cross-engine.

    Gaps-and-islands: one lag flag marks cell changes, a running sum
    numbers the islands, one groupBy aggregates them — a single shuffle
    on the entity key (window + groupBy share it), no UDF. Island state
    is per-entity and bounded; 100 TB of pings shards by entity.
    """
    if cell < 1:
        raise ValueError("cell must be a positive integer")
    if min_pings < 1:
        raise ValueError("min_pings must be >= 1")
    dwell_us = int(round(min_dwell_s * 1_000_000))
    if dwell_us < 0:
        raise ValueError("min_dwell_s must be >= 0")
    us = _micros(ts_col)
    cw = float(cell)
    p = df.select(
        F.col(user_col).alias("user_id"),
        F.col(order_col).alias("_ord"),
        us.alias("_us"),
        F.floor(F.col(x_col).cast("double") / F.lit(cw)).cast("long").alias("cx"),
        F.floor(F.col(y_col).cast("double") / F.lit(cw)).cast("long").alias("cy"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("_us").asc(), F.col("_ord").asc())
    chg = F.when(
        F.lag("cx").over(w).isNull()
        | (F.lag("cx").over(w) != F.col("cx"))
        | (F.lag("cy").over(w) != F.col("cy")),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = p.withColumn("_isl", F.sum(chg).over(run))
    g = (
        isl.groupBy("user_id", "_isl")
        .agg(
            F.min("cx").alias("cx"),
            F.min("cy").alias("cy"),
            F.min("_us").alias("enter_us"),
            F.max("_us").alias("exit_us"),
            F.count("*").alias("n_pings"),
        )
        .where(
            ((F.col("exit_us") - F.col("enter_us")) >= F.lit(dwell_us))
            & (F.col("n_pings") >= F.lit(min_pings))
        )
    )
    wi = Window.partitionBy("user_id").orderBy(F.col("_isl").asc())
    return g.select(
        "user_id",
        (F.row_number().over(wi) - 1).cast("long").alias("stay_idx"),
        "cx", "cy", "enter_us", "exit_us",
        (F.col("exit_us") - F.col("enter_us")).alias("dwell_us"),
        F.col("n_pings").cast("long").alias("n_pings"),
    )


def od_matrix(stays: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Origin-destination flow matrix (the classic mobility/transport
    product) over ::stay_points output: per entity, consecutive stays
    (stay_idx order) form a trip from the earlier stay's cell to the
    later one's; flows aggregate to one row per (from-cell, to-cell)
    with the exact trip count and total travel time Σ(enter_us of the
    destination - exit_us of the origin). Self-loops (consecutive
    stays in the same cell — possible when a too-short visit elsewhere
    was filtered out between them) are kept and flagged by from = to.
    Every column is an exact integer.

    One window (lag over the entity key) + one groupBy on the cell
    pair — flows shard by cell pair; the per-entity state is one row.
    """
    w = Window.partitionBy(user_col).orderBy(F.col("stay_idx").asc())
    t = stays.select(
        F.col(user_col).alias("user_id"), "stay_idx", "cx", "cy",
        "enter_us", "exit_us",
        F.lag("cx").over(w).alias("fcx"),
        F.lag("cy").over(w).alias("fcy"),
        F.lag("exit_us").over(w).alias("fexit"),
    ).where(F.col("fcx").isNotNull())
    return (
        t.groupBy(
            F.col("fcx").alias("from_cx"), F.col("fcy").alias("from_cy"),
            F.col("cx").alias("to_cx"), F.col("cy").alias("to_cy"),
        )
        .agg(
            F.count("*").alias("n_trips"),
            F.sum(F.col("enter_us") - F.col("fexit")).alias("sum_travel_us"),
        )
    )
