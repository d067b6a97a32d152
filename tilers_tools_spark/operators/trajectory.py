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
