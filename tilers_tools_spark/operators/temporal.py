"""Temporal joins (SURVEY.md §2 — beyond-scope training-pipeline family).

Two operators: ``asof_join`` (nearest right row at-or-before/after) and
``interval_join`` (point-in-interval containment, re-expressed as a
bucketed equi-join so it never degenerates to a broadcast-nested-loop).

``asof_join`` is the classic "most recent right row at-or-before each
left row" join (sensor alignment, event attribution, slowly-changing
lookups). Spark has no built-in; the idiomatic distributed expression is
the union-then-window form implemented here — NOT a per-key loop and NOT
a range cross-join:

1. union the two sides into one stream tagged ``_side`` (right rows
   carry their payload as one struct, left rows carry null),
2. one window partitioned by the ``by`` keys ordered by
   (ts, _side, payload): ``last_value(payload, ignoreNulls=True)`` over
   UNBOUNDED PRECEDING..CURRENT ROW gives every left row the latest
   right payload at-or-before it (right sorts before left at equal ts,
   so ties match, same as SQL ASOF's ``>=``). ``direction="forward"``
   mirrors it with first_value over CURRENT ROW..UNBOUNDED FOLLOWING.

Scale shape: exactly ONE shuffle (hash by the join keys for the window
sort) over left+right — the same cost as the groupBy any aggregation
would pay; no range explosion, no broadcast needed, works at any right
size. Skew caveat: a single hot ``by`` key serializes its window — for
low-cardinality keys pre-bucket time (add a coarse time bucket to
``by`` and run twice: in-bucket + bucket-boundary patch) or broadcast a
pre-aggregated right side; for the common high-cardinality id keys this
plan survives 100×.

Determinism: if several right rows share the max (ts) for a left row,
the winner is the greatest payload struct (Spark's struct ordering) —
documented, deterministic tie-break.

Oracle independence: the driver gate replays the query with DuckDB's
NATIVE ``ASOF LEFT JOIN`` — a completely separate implementation of the
same published semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by=("user_id",),
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left-outer as-of join: every left row, plus the nearest right row
    at-or-before (backward) / at-or-after (forward) it within the same
    ``by`` keys. Right columns (all non-key, non-ts) come back suffixed;
    ``<ts_col><suffix>`` is the matched right timestamp. ``tolerance_s``
    nulls the match when |Δts| exceeds it (left row is kept)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by = list(by)
    r_payload_cols = [c for c in right.columns if c not in by]
    if ts_col not in r_payload_cols:
        raise ValueError(f"right side must carry {ts_col!r}")
    left_cols = left.columns

    # right sorts BEFORE left at equal ts for backward (so ties match,
    # SQL ASOF '>='), AFTER left for forward ('<=')
    r_side, l_side = (0, 1) if direction == "backward" else (1, 0)
    r = right.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(r_side).alias("_side"),
        F.struct(*[F.col(c) for c in r_payload_cols]).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in left_cols if c not in by],
    )
    l = left.select(
        *by,
        F.col(ts_col).alias("_ts"),
        F.lit(l_side).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols if c not in by],
    )
    u = r.unionByName(l)
    w = Window.partitionBy(*by).orderBy("_ts", "_side", "_payload")
    if direction == "backward":
        matched = F.last("_payload", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        matched = F.first("_payload", ignorenulls=True).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    u = u.withColumn("_m", matched).filter(F.col("_side") == l_side)
    if tolerance_s is not None:
        # NTZ timestamps can't cast straight to double; the NTZ->LTZ hop
        # uses the session tz on BOTH sides, so the difference is exact
        def ep(c):
            return c.cast("timestamp").cast("double")

        delta = F.abs(ep(F.col("_ts")) - ep(F.col(f"_m.{ts_col}")))
        u = u.withColumn("_m", F.when(delta <= float(tolerance_s), F.col("_m")))
    out_cols = (
        [F.col(c) for c in by]
        + [F.col(f"_l_{c}").alias(c) for c in left_cols if c not in by]
        + [F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in r_payload_cols]
    )
    return u.select(*out_cols)


def _micros_of(col_name: str):
    """Epoch MICROSECONDS of a TIMESTAMP_NTZ column, timezone-free
    (same contract as trajectory._micros): integer field arithmetic
    against an NTZ epoch literal — no session-timezone / DST hop, so
    bucket floors are bit-exact across engines."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col_name}`)"
    )


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by=(),
    bucket_s: float = 3600.0,
) -> DataFrame:
    """Point-in-interval join: every left row paired with every interval
    whose [start, end] (inclusive) contains its timestamp (+ equal
    ``by`` keys if given).

    Scale shape: the naive plan is an inequality theta-join — a
    broadcast-nested-loop / cartesian that dies at scale. This operator
    makes it an EQUI-join: each interval explodes into the time buckets
    it overlaps (``F.sequence`` on floor(epoch/bucket_s)), each left row
    computes its single bucket, and the join runs on (bucket, *by) with
    an exact range refine after. Each (row, interval) pair meets in
    exactly ONE bucket (the row's), so no dedup pass is needed. Choose
    ``bucket_s`` near the typical interval length: expansion factor is
    ~len/bucket_s + 1 per interval (logged nowhere silently — it's pure
    row count, visible in the Spark UI); very long intervals with a tiny
    bucket explode, very short buckets with huge left volume skew."""
    by = list(by)
    bucket_us = int(round(float(bucket_s) * 1_000_000))
    b = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(_micros_of(start_col) / bucket_us),
            F.floor(_micros_of(end_col) / bucket_us),
        )),
    )
    l = left.withColumn("_bucket", F.floor(_micros_of(ts_col) / bucket_us))
    j = l.join(b, ["_bucket"] + by)
    return j.filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    ).drop("_bucket")


def locf_fill(
    df,
    n_bins: int,
    entity_col: str = "entity",
    bin_col: str = "bin",
    v_col: str = "v",
):
    """Regular-grid gap fill with last-observation-carried-forward (the
    pandas ffill / QuestDB FILL(PREV) role): the bin axis 0..n_bins-1
    is COMPLETED per entity (a missing bin is a gap, not absent data),
    then each gap takes the value of the latest observed bin at or
    before it; `src_bin` records where the value came from and `filled`
    flags carried rows. LEADING gaps (before the entity's first
    observation) stay NULL with filled = true, src_bin NULL — LOCF
    never invents a value (no backfill; documented). Duplicate
    (entity, bin) observations are rejected fail-loud — fill semantics
    would be ambiguous. All columns exact integers.

    One cross-join against a literal bin array + one window on the
    entity key (the shuffle the groupBy already needed); bounded bin
    axis by contract.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not 2 <= n_bins <= 4096:
        raise ValueError("n_bins must be in [2, 4096]")
    c = df.select(
        F.col(entity_col).alias("entity"),
        F.col(bin_col).cast("long").alias("bin"),
        F.col(v_col).cast("long").alias("v"),
    )
    dup = F.count("*").over(Window.partitionBy("entity", "bin"))
    c = c.withColumn(
        "v",
        F.when(dup == 1, F.col("v")).otherwise(
            F.raise_error(F.format_string(
                "duplicate observation for entity %s bin %s",
                F.col("entity").cast("string"), F.col("bin")))
        ),
    )
    bins = F.explode(F.array(*[F.lit(b).cast("long") for b in range(n_bins)]))
    grid = (
        c.select("entity").distinct().withColumn("bin", bins)
        .join(c, ["entity", "bin"], "left")
    )
    w = (
        Window.partitionBy("entity").orderBy(F.col("bin").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled_v = F.last("v", ignorenulls=True).over(w)
    src = F.last(F.when(F.col("v").isNotNull(), F.col("bin")), ignorenulls=True).over(w)
    return grid.select(
        "entity", "bin",
        filled_v.alias("v_filled"),
        F.col("v").isNull().alias("filled"),
        src.alias("src_bin"),
    )
