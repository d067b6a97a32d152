"""Stateful Structured Streaming operators (task brief: watermarks +
windowed aggs for late data; `applyInPandasWithState` for custom stateful
operators).

The batch engine's dedup/statistics operators get streaming twins here for
continuous-arrival corpora:

* ``streaming_exact_dedup`` — cross-micro-batch exact dedup: the first
  document with a given content hash is emitted, later arrivals (same or
  later batches) are dropped. State = the hash set, kept in the stream's
  state store (checkpointed, survives restarts). At 100TB arrival rates
  pass ``event_time_col`` + ``watermark`` to bound state with
  ``dropDuplicatesWithinWatermark`` (hashes older than the watermark are
  evicted — exact within the window, the standard unbounded-stream
  tradeoff).
* ``running_source_stats`` — custom stateful operator via
  ``applyInPandasWithState``: per `source`, a running (n_docs, n_tokens)
  total updated every micro-batch, emitted in update mode. The state is
  two longs per key — the GroupState analog of a streaming hypertable
  rollup row.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators import text as _text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """content-hash dedup across micro-batches. Unbounded state by default
    (exact forever); with ``event_time_col`` + ``watermark`` (e.g. "1 hour")
    state is bounded to the watermark window."""
    h = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    if event_time_col is not None and watermark is not None:
        h = h.withWatermark(event_time_col, watermark)
        return h.dropDuplicatesWithinWatermark(["content_hash"])
    return h.dropDuplicates(["content_hash"])


def windowed_doc_counts(
    stream: DataFrame,
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
    window_len: str = "10 minutes",
    source_col: str = "source",
    text_col: str | None = "text",
) -> DataFrame:
    """Event-time windowed arrival counts with late-data handling — the
    task brief's 'watermarks + windowed aggs for late data' as a concrete
    operator: per (source, tumbling event-time window), count + token sum.
    Rows later than `watermark` behind the max observed event time are
    DROPPED (never re-open a finalized window); in append output mode a
    window emits once, when the watermark passes its end. State is one
    small row per open (source, window) — bounded by the watermark horizon
    regardless of stream length, the standard unbounded-stream contract.

    Returns window_start/window_end as timestamps plus (source, n_docs[,
    n_tokens]); `text_col=None` skips the token sum for streams without a
    text column (e.g. tile-arrival events), so downstream rollups
    (tilemap_rollup-style) compose relationally on the emitted rows."""
    w = stream.withWatermark(event_time_col, watermark)
    aggs = [F.count("*").alias("n_docs")]
    cols = ["n_docs"]
    if text_col is not None:
        aggs.append(F.sum(_text.token_count(text_col)).alias("n_tokens"))
        cols.append("n_tokens")
    return (
        w.groupBy(
            F.window(F.col(event_time_col), window_len).alias("win"), F.col(source_col)
        )
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            source_col,
            *cols,
        )
    )


_STATS_OUT = "source string, n_docs long, n_tokens long"
_STATS_STATE = "n_docs long, n_tokens long"


def running_source_stats(
    stream: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source running totals as a custom stateful operator
    (applyInPandasWithState, update mode). Emits one row per (source,
    micro-batch) carrying the running totals; state is O(#sources)."""

    def stats_fn(
        key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_docs, n_tokens = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_docs += len(pdf)
            # whitespace token count, same convention as operators/text.py
            n_tokens += int(pdf[text_col].str.split().str.len().fillna(0).sum())
        state.update((n_docs, n_tokens))
        yield pd.DataFrame({"source": [key[0]], "n_docs": [n_docs], "n_tokens": [n_tokens]})

    return stream.groupBy(source_col).applyInPandasWithState(
        stats_fn,
        outputStructType=_STATS_OUT,
        stateStructType=_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_doc_counts(
    stream: DataFrame,
    event_time_col: str = "event_time",
    watermark: str = "10 minutes",
    gap: str = "270 seconds",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Gap-based SESSION windows with late-data handling (the third
    window flavor beside tumbling `windowed_doc_counts` and the running
    GroupState rollup): per source, events merge into one session while
    each arrives within `gap` of the previous (Spark's session_window:
    a new session starts only when the delta EXCEEDS the gap — equal
    deltas merge, i.e. touching [t, t+gap) extents join); the window is
    [first_event, last_event + gap). Append mode: a session emits once,
    when the watermark passes its end; events older than the watermark
    are dropped (a closed session never re-opens). State is one row per
    OPEN (source, session) — bounded by the watermark horizon.

    Relational replay (the driver gate): lag -> break when the delta
    > gap -> running-sum session ids -> min/max+gap per session — an
    independent reconstruction of the published merge rule."""
    w = stream.withWatermark(event_time_col, watermark)
    return (
        w.groupBy(
            F.session_window(F.col(event_time_col), gap).alias("win"),
            F.col(source_col),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(_text.token_count(text_col)).alias("n_tokens"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            source_col,
            "n_docs",
            "n_tokens",
        )
    )


def stream_stream_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    key_col: str = "usr",
    imp_time_col: str = "imp_time",
    click_time_col: str = "click_time",
    max_delay_s: int = 600,
    watermark_s: int = 600,
) -> DataFrame:
    """Stream-stream INNER join with a time-range condition — the
    published ad-attribution shape (Spark Structured Streaming guide):
    a click joins every same-key impression whose time satisfies
    imp_time <= click_time <= imp_time + max_delay (both bounds
    INCLUSIVE). Both sides are watermarked; the range condition bounds
    state, so impressions are EVICTED once the global watermark (min
    across both streams) passes imp_time + max_delay, and clicks older
    than the watermark are dropped — a late click whose impression was
    evicted yields NO row (inner join), which is the correctness
    property restart protocols must pin.

    Emission is immediate: an inner join needs no watermark to emit,
    only to clean state — matches appear in the micro-batch where the
    second side arrives, including matches against state from earlier
    runs (checkpointed across restarts). Scale shape: state per key is
    bounded by watermark_s + max_delay_s of traffic; the join itself is
    Spark's symmetric hash join on the equality key with the range as a
    residual — no custom code, the engine only declares the condition.

    Output: one row per (impression, click) match with both payloads
    and delay_s = click_secs - imp_secs.

    REQUIRED SCHEMA CONTRACT (fail-loud at analysis otherwise): the
    impressions side must carry `imp_id` and the clicks side `click_id`
    (the selected payload columns), and the clicks-side join key column
    must be named ``f"{key_col}_c"`` (e.g. ``usr_c`` for the default) —
    the two sides of a stream-stream self-ish join need distinct column
    names, and this operator fixes the click-side convention rather
    than adding a rename parameter; pre-rename your click stream to
    match (``clicks.withColumnRenamed(key, f"{key}_c")``).
    """
    li = impressions.withWatermark(imp_time_col, f"{watermark_s} seconds")
    rc = clicks.withWatermark(click_time_col, f"{watermark_s} seconds")
    cond = (
        (li[key_col] == rc[f"{key_col}_c"])
        & (rc[click_time_col] >= li[imp_time_col])
        & (rc[click_time_col] <= li[imp_time_col] + F.expr(f"INTERVAL {max_delay_s} SECONDS"))
    )
    out = li.join(rc, cond, "inner")
    return out.select(
        li[key_col],
        F.col("imp_id"),
        F.col("click_id"),
        li[imp_time_col].cast("long").alias("imp_secs"),
        rc[click_time_col].cast("long").alias("click_secs"),
        (rc[click_time_col].cast("long") - li[imp_time_col].cast("long")).alias("delay_s"),
    )
